"""Headline benchmark: prints ONE JSON line
``{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}``.

Runs the four headline dwarfs (BASELINE.json: Scan, Sort/Radix, GroupBy,
Join/JoinOmnisci) on the default device (the TPU chip when present) at the
reference's benchmark-scale sizes, measures device-compute rows/s
(kernel-path timing: compiled, inputs resident, min over repeats — the
OpenCL-event-profiling analog), and reports the geometric mean.

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so the
baseline is the self-measured target from BASELINE.json: 70% of the
per-chip HBM-bandwidth roofline for each operator under a bytes-touched
model. vs_baseline = geomean(measured) / geomean(target); ≥ 1.0 means every
target is met on average.
"""

from __future__ import annotations

import json
import time

import numpy as np


# Bytes-touched-per-row models (minimum traffic an ideal implementation
# must move, uint32 columns):
#   scan filter: read 4B, write ~0 (selectivity 4/10000)        → 4 B/row
#   radix sort (4 LSD passes over 32-bit keys): 4×(r+w) 8B      → 32 B/row
#   groupby dense (small G): read key+val                       → 8 B/row
#   csr join: build sort (~4 passes over (k,id) 8B r+w) + probe → 72 B/row
_BYTES_PER_ROW = {"scan": 4.0, "radix": 32.0, "groupby": 8.0, "join": 72.0}

_HBM_BW = {  # bytes/s, per chip
    "TPU v5 lite": 819e9,  # v5e
    "TPU v4": 1.2e12,
    "TPU v6 lite": 1.64e12,
    "cpu": 50e9,  # nominal host value so CPU runs still produce a number
}


def _device_bw() -> float:
    import jax

    d = jax.devices()[0]
    kind = getattr(d, "device_kind", "cpu")
    for k, bw in _HBM_BW.items():
        if k.lower() in str(kind).lower():
            return bw
    return _HBM_BW["cpu"] if d.platform == "cpu" else 819e9


def _time_min(fn, *args, repeats=3):
    """Per-execution seconds. queue-k amortized timing with a scalar-fetch
    fence (block_until_ready is not a fence on the tunneled TPU plugin);
    min over a few amortized estimates."""
    from dwarf_bench_tpu.utils.timing import time_amortized

    return min(time_amortized(fn, *args, k=8) for _ in range(repeats))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from dwarf_bench_tpu.ops import csr_join, groupby, scan, sort
    from dwarf_bench_tpu.ops.scan_pallas import filter_pallas

    rng = np.random.default_rng(0)
    device = jax.devices()[0]
    bw = _device_bw()
    target = {
        op: 0.7 * bw / bpr for op, bpr in _BYTES_PER_ROW.items()
    }  # rows/s at 70% roofline

    measured = {}

    # --- scan filter (x < 5), 2^24 rows ------------------------------
    n = 1 << 24
    x = jax.device_put(
        rng.integers(1, 10000, n, endpoint=True).astype(np.int32), device
    )
    scan_fn = (
        filter_pallas if device.platform != "cpu" else scan.filter_two_pass
    )
    measured["scan"] = n / _time_min(scan_fn, x)

    # --- radix (full sort), 2^22 rows --------------------------------
    n = 1 << 22
    x = jax.device_put(
        rng.integers(1, 10000, n, endpoint=True).astype(np.int32), device
    )
    measured["radix"] = n / _time_min(sort.sort_xla, x)

    # --- groupby sum, 2^20 rows × 64 groups --------------------------
    n, G = 1 << 20, 64
    k = jax.device_put(rng.integers(0, G, n).astype(np.uint32), device)
    v = jax.device_put(
        rng.integers(1, 10000, n, endpoint=True).astype(np.uint32), device
    )
    gfn = lambda kk, vv: groupby.groupby_sum_matmul_bf16(kk, vv, G)
    measured["groupby"] = n / _time_min(gfn, k, v)

    # --- csr join build+probe, 2^20 rows -----------------------------
    n = 1 << 20
    A = rng.integers(1, 10000, n, endpoint=True).astype(np.uint32)
    B = rng.integers(1, 10000, n, endpoint=True).astype(np.uint32)
    d = int(len(np.unique(A)))
    da = jax.device_put(A, device)
    db = jax.device_put(B, device)

    def join_fn(a, b):
        t = csr_join.build(a, d, 2 * d)
        r = csr_join.probe_merge(t, b)
        return r.pos, r.counts

    measured["join"] = n / _time_min(join_fn, da, db)

    geo = float(np.exp(np.mean([np.log(v) for v in measured.values()])))
    geo_target = float(np.exp(np.mean([np.log(v) for v in target.values()])))

    print(
        json.dumps(
            {
                "metric": "query_ops_rows_per_s_geomean",
                "value": geo,
                "unit": "rows/s",
                "vs_baseline": geo / geo_target,
                "components_rows_per_s": {
                    k: round(v) for k, v in measured.items()
                },
                "targets_rows_per_s": {
                    k: round(v) for k, v in target.items()
                },
                "device": str(device),
            }
        )
    )


if __name__ == "__main__":
    main()
