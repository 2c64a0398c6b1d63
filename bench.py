"""Headline benchmark: prints ONE JSON line
``{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}``.

Runs the four headline dwarfs (BASELINE.json: Scan, Sort/Radix, GroupBy,
Join/JoinOmnisci) on the default device (the TPU chip when present) at the
reference's benchmark-scale sizes, measures device-compute rows/s
(queue-k amortized timing with a real execution fence — the
OpenCL-event-profiling analog), and reports the geometric mean.

Remote compiles on the tunneled TPU cost minutes per component, so the run
is budgeted: components execute in ascending compile-cost order and the
remainder is skipped (and listed in the JSON) if ``BENCH_TIME_BUDGET_S``
(default 3000 s) would be exceeded; the geomean then covers the measured
components only.

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so the
baseline is the self-measured target from BASELINE.json: 70% of the
per-chip HBM-bandwidth roofline for each operator under the bytes-touched
model in dwarf_bench_tpu/utils/roofline.py. vs_baseline =
geomean(measured) / geomean(target over measured components).
"""

from __future__ import annotations

import json
import os
import time
from functools import partial

import numpy as np


def _time_op(fn, *args, k=8):
    from dwarf_bench_tpu.utils.timing import time_amortized

    return time_amortized(fn, *args, k=k)


def main() -> None:
    import jax

    from dwarf_bench_tpu.common.device import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    from dwarf_bench_tpu.ops import csr_join, groupby, scan, sort
    from dwarf_bench_tpu.utils.roofline import (
        BYTES_PER_ROW,
        device_bandwidth,
    )

    rng = np.random.default_rng(0)
    device = jax.devices()[0]
    on_accel = device.platform != "cpu"
    bw = device_bandwidth(device)
    budget = float(os.environ.get("BENCH_TIME_BUDGET_S", "3000"))
    t_start = time.time()

    measured = {}
    skipped = []
    extras = {}

    def remaining():
        return budget - (time.time() - t_start)

    # ---- components, cheapest compile first --------------------------

    def run_radix():
        n = 1 << 22
        x = jax.device_put(
            rng.integers(1, 10000, n, endpoint=True).astype(np.int32), device
        )
        # range-adaptive: distribution sort (MXU histogram + run expansion)
        # for the benchmark's [1, 10000] columns, XLA sort fallback otherwise
        return n / _time_op(jax.jit(sort.sort_auto), x)

    def run_groupby():
        n, G = 1 << 22, 64
        k = jax.device_put(rng.integers(0, G, n).astype(np.uint32), device)
        v = jax.device_put(
            rng.integers(1, 10000, n, endpoint=True).astype(np.uint32),
            device,
        )
        # dispatch: balanced-digit Pallas kernel on accelerators
        fn = jax.jit(
            lambda kk, vv: groupby.groupby_sum(kk, vv, G,
                                               vals_below_2p14=True)
        )
        return n / _time_op(fn, k, v)

    def run_groupby_big():
        # the BASELINE.json GroupBy config: 2^16 distinct keys
        n, G = 1 << 20, 1 << 16
        k = jax.device_put(rng.integers(0, G, n).astype(np.uint32), device)
        v = jax.device_put(
            rng.integers(1, 10000, n, endpoint=True).astype(np.uint32),
            device,
        )
        fn = jax.jit(
            lambda kk, vv: groupby.groupby_sum(kk, vv, G,
                                               vals_below_2p14=True)
        )
        return n / _time_op(fn, k, v)

    def run_join():
        n = 1 << 20
        A = rng.integers(1, 10000, n, endpoint=True).astype(np.uint32)
        B = rng.integers(1, 10000, n, endpoint=True).astype(np.uint32)
        da = jax.device_put(A, device)
        db = jax.device_put(B, device)
        # keys span < 2^14 (host-checked, like the reference's host-side
        # count_distinct): dense CSR index — MXU histogram build + MXU
        # table-gather probe, one pair sort total. hi_rows stays 128: the
        # range-aware (hi80) and int8-4-plane rel-gather variants both
        # measured SLOWER (0.880 / 1.045 vs 0.752 ms — the MXU pads the
        # skinny table to 128 sublanes anyway; measure_r4.py g6).
        assert csr_join.dense_applicable(A, B)
        hi_rows = 128

        @jax.jit
        def join_fn(a, b):
            t = csr_join.build_dense(a)
            r = csr_join.probe_dense(t, b, hi_rows=hi_rows)
            # id_buffer must be a live output: the reference's build phase
            # includes build_id_buffer (omnisci_hashtable.hpp:110-147), and
            # without it XLA dead-code-eliminates the pair sort entirely
            return r.pos, r.counts, t.id_buffer

        rate = n / _time_op(join_fn, da, db)
        # build/probe split (the reference reports the phases separately,
        # join/join.cpp:111-113); measured at separate jit boundaries, so
        # the two phase times can sum past the fused pipeline's time
        t_build = _time_op(jax.jit(csr_join.build_dense), da)
        tbl = csr_join.build_dense(da)
        t_probe = _time_op(
            jax.jit(partial(csr_join.probe_dense, hi_rows=hi_rows)), tbl, db
        )
        extras["join_build_ms"] = round(t_build * 1e3, 3)
        extras["join_probe_ms"] = round(t_probe * 1e3, 3)
        return rate

    def run_scan():
        n = 1 << 24
        x = jax.device_put(
            rng.integers(1, 10000, n, endpoint=True).astype(np.int32),
            device,
        )
        # sparsity-adaptive engine: near read-bound at the benchmark's
        # 0.04% selectivity, Pallas butterfly fallback when caps trip
        return n / _time_op(jax.jit(scan.filter_sparse), x)

    # (name, runner, minimum seconds of budget to attempt it —
    # remote-compile estimates on the accelerator; CPU compiles are fast)
    components = [
        ("radix", run_radix, 240 if on_accel else 10),
        ("groupby", run_groupby, 240 if on_accel else 10),
        ("groupby_big", run_groupby_big, 240 if on_accel else 10),
        ("join", run_join, 420 if on_accel else 20),
        ("scan", run_scan, 700 if on_accel else 20),
    ]
    for name, runner, min_budget in components:
        if remaining() < min_budget:
            skipped.append(name)
            continue
        try:
            measured[name] = runner()
        except Exception as e:  # noqa: BLE001 — a dead component must not
            skipped.append(f"{name}:{type(e).__name__}")  # kill the report

    target = {op: 0.7 * bw / BYTES_PER_ROW[op] for op in measured}
    if measured:
        geo = float(np.exp(np.mean([np.log(v) for v in measured.values()])))
        geo_target = float(
            np.exp(np.mean([np.log(v) for v in target.values()]))
        )
        vs = geo / geo_target
    else:
        geo, vs = 0.0, 0.0

    print(
        json.dumps(
            {
                "metric": "query_ops_rows_per_s_geomean",
                "value": geo,
                "unit": "rows/s",
                "vs_baseline": vs,
                "components_rows_per_s": {
                    k: round(v) for k, v in measured.items()
                },
                "targets_rows_per_s": {k: round(v) for k, v in target.items()},
                "skipped": skipped,
                "elapsed_s": round(time.time() - t_start, 1),
                "device": str(device),
                **extras,
            }
        )
    )


if __name__ == "__main__":
    main()
