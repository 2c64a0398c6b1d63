"""Headline benchmark: prints ONE JSON line
``{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}``.

Runs the four headline dwarfs (BASELINE.json: Scan, Sort/Radix, GroupBy,
Join/JoinOmnisci) on the default device (the TPU chip when present) at the
reference's benchmark-scale sizes, measures device-compute rows/s
(device-looped kernel timing — the OpenCL-event-profiling analog; round 4
measured the per-jit-call host dispatch at 0.13-0.30 ms, so queue-k
per-call readings are dispatch-bound for sub-ms kernels), and reports the
geometric mean.

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


def _time_op(fn, *args, k=8, repeats=3):
    """min over ``repeats`` independent queue-k measurements.

    time_amortized already hardens each reading against tunnel sync
    jitter (deep queues until the execution spread dwarfs it), but a
    noisy HOST window (driver-side concurrent work) inflates the enqueue
    slope itself for seconds at a time — round 3's driver artifact read
    the scan 10% above the quiet-host number for exactly that reason
    (docs/performance.md, round-4 reconciliation). The min of three
    readings spaced across ~10 s never under-reports device time (the
    slope cannot read fast) and recovers the quiet-host figure when any
    window is clean."""
    from dwarf_bench_tpu.utils.timing import time_amortized

    return min(time_amortized(fn, *args, k=k) for _ in range(repeats))


def _time_dev(fn, *args, update, fold):
    """Device-looped kernel time (timing.time_device_looped_inplace).

    Round 4 measured the per-jit-call HOST dispatch at 0.13-0.30 ms —
    comparable to the sub-ms headline kernels, so the round-1..3 queue-k
    component readings were dispatch-contaminated (and host-state
    dependent: the round-3 docs-vs-driver scan gap). The device loop is
    the faithful analog of the reference's kernel_time (OpenCL event
    profiling excludes enqueue the same way, scan/scan.cpp:142-154);
    the in-place one-element update keeps iteration-coupling overhead
    at O(1) even for 2^24-element inputs."""
    from dwarf_bench_tpu.utils.timing import time_device_looped_inplace

    return time_device_looped_inplace(fn, *args, update=update, fold=fold)


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

    import jax.numpy as jnp

    def run_radix():
        n = 1 << 22
        X = rng.integers(1, 10000, n, endpoint=True).astype(np.int32)
        x = jax.device_put(X, device)
        # HOST range check (ops/sort.sort_host_dispatch — the same
        # host-knowledge convention as the join's dense_applicable): the
        # benchmark's [1, 10000] columns take the counting pipeline
        # directly; the on-device range dispatch costs 0.05-0.08 ms of
        # lax.cond construct tax (docs/performance.md round 4).
        fn = sort.sort_host_dispatch(X)
        return n / _time_dev(
            fn, x,
            # poke ONE element: index from the carry's low bits, value
            # spread over [1, 8192] by an odd-multiplier mix so the
            # coupling chain carries real entropy (round-4 advisor: the
            # old out[0]&1 fold made s runtime-constant — a near
            # constant-index poke). Values stay inside the benchmark
            # range, preserving the counting pipeline's span.
            update=lambda a, s: (a[0].at[s & 1023].set((
                1 + ((s.astype(jnp.uint32) * np.uint32(2654435761))
                     >> 18 & 8191)
            ).astype(jnp.int32)),),
            # the median shifts as pokes move mass across it — a
            # data-dependent O(1) readout (full reductions would add
            # ~0.07 ms of measured work per iteration)
            fold=lambda out: out[n >> 1].astype(jnp.int32),
        )

    def run_groupby():
        n, G = 1 << 22, 64
        k = jax.device_put(rng.integers(0, G, n).astype(np.uint32), device)
        v = jax.device_put(
            rng.integers(1, 10000, n, endpoint=True).astype(np.uint32),
            device,
        )
        # dispatch: balanced-digit Pallas kernel on accelerators
        return n / _time_dev(
            lambda kk, vv: groupby.groupby_sum(kk, vv, G,
                                               vals_below_2p14=True),
            k, v,
            update=lambda a, s: (a[0], a[1].at[s & 1023].set(
                (1 + (s & 1)).astype(jnp.uint32))),
            fold=lambda out: (out[0] & 1).astype(jnp.int32),
        )

    def run_groupby_big():
        # the BASELINE.json GroupBy config: 2^16 distinct keys
        n, G = 1 << 20, 1 << 16
        k = jax.device_put(rng.integers(0, G, n).astype(np.uint32), device)
        v = jax.device_put(
            rng.integers(1, 10000, n, endpoint=True).astype(np.uint32),
            device,
        )
        return n / _time_dev(
            lambda kk, vv: groupby.groupby_sum(kk, vv, G,
                                               vals_below_2p14=True),
            k, v,
            update=lambda a, s: (a[0], a[1].at[s & 1023].set(
                (1 + (s & 1)).astype(jnp.uint32))),
            fold=lambda out: (out[0] & 1).astype(jnp.int32),
        )

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

        def join_fn(a, b):
            t = csr_join.build_dense(a)
            r = csr_join.probe_dense(t, b, hi_rows=hi_rows)
            # id_buffer must be a live output: the reference's build phase
            # includes build_id_buffer (omnisci_hashtable.hpp:110-147), and
            # without it XLA dead-code-eliminates the pair sort entirely
            return r.pos, r.counts, t.id_buffer

        def fold3(out):
            return (
                out[0][0] ^ out[1][0] ^ out[2][0].astype(jnp.int32)
            ) & 1

        rate = n / _time_dev(
            join_fn, da, db,
            update=lambda a, s: (a[0].at[s & 1023].set(
                (1 + (s & 1)).astype(jnp.uint32)), a[1]),
            fold=fold3,
        )
        # build/probe split (the reference reports the phases separately,
        # join/join.cpp:111-113); measured at separate jit boundaries, so
        # the two phase times can sum past the fused pipeline's time
        t_build = _time_dev(
            csr_join.build_dense, da,
            update=lambda a, s: (a[0].at[s & 1023].set(
                (1 + (s & 1)).astype(jnp.uint32)),),
            fold=lambda t: (t.id_buffer[0] & 1).astype(jnp.int32),
        )
        tbl = csr_join.build_dense(da)
        t_probe = _time_dev(
            partial(csr_join.probe_dense, hi_rows=hi_rows), tbl, db,
            update=lambda a, s: (a[0], a[1].at[s & 1023].set(
                (1 + (s & 1)).astype(jnp.uint32))),
            fold=lambda r: (r.pos[0] ^ r.counts[0]) & 1,
        )
        extras["join_build_ms"] = round(t_build * 1e3, 3)
        extras["join_probe_ms"] = round(t_probe * 1e3, 3)
        return rate

    def run_scan():
        n = 1 << 24
        X = rng.integers(1, 10000, n, endpoint=True).astype(np.int32)
        x = jax.device_put(X, device)
        # sparsity-adaptive engine: near read-bound at the benchmark's
        # 0.04% selectivity. Host-checked cap precondition (round-5
        # verdict item 2) drops the lax.cond fallback construct
        # (0.043 ms of 0.263 at 2^24); the poke below only toggles one
        # value 1 <-> 10000 at a low index, which moves the counts by
        # +-1 — far inside the verified cap margins.
        fn = (
            partial(scan.filter_sparse, assume_sparse=True)
            if on_accel and scan.sparse_caps_ok(X)
            else scan.filter_sparse
        )
        return n / _time_dev(
            fn, x,
            # row 0 toggles 1 <-> 10000: count changes by one, the
            # selectivity and value range stay at benchmark conditions
            update=lambda a, s: (a[0].at[s & 1023].set(1 + (s & 1) * 9999),),
            fold=lambda out: (out[0][0] ^ out[1]) & 1,
        )

    # ---- non-geomean extras (round-4 verdict item 6) -----------------
    # Reduce is the read-bound speed-of-light witness (reference:
    # reduce/reduce.cpp:50-61); the 2^24-key hash build/probe rates are
    # the BASELINE config-#4 evidence. They report alongside the five
    # headline components but do NOT enter the geomean (cross-round
    # comparability).

    def run_scan_sel50_extra():
        # BASELINE config #1 AT ITS STATED SELECTIVITY (round-5 verdict
        # item 4): 2^20 rows, threshold 5000 over uniform [1, 10000] —
        # a 0.5-selectivity dense compaction. Engine: the Pallas
        # streaming butterfly at tile=4096 (measured best: 5.17 G vs
        # 4.53 at tile=2048; filter_xla's scatter path serializes on
        # TPU at 0.21 G — measure_r6 s1). Non-geomean extra.
        from dwarf_bench_tpu.ops.scan_pallas import filter_pallas

        n = 1 << 20
        x = jax.device_put(
            rng.integers(1, 10000, n, endpoint=True).astype(np.int32),
            device,
        )
        fn = (
            (lambda v: filter_pallas(v, 5000, tile=4096))
            if on_accel else (lambda v: scan.filter_two_pass(v, 5000))
        )
        t = _time_dev(
            fn, x,
            update=lambda a, s: (a[0].at[s & 1023].set(
                1 + (s & 1) * 9000),),
            fold=lambda out: (out[0][0] ^ out[1]).astype(jnp.int32),
        )
        extras["scan_sel50_rows_per_s"] = round(n / t)
        extras["scan_sel50_ms"] = round(t * 1e3, 4)

    def run_reduce_extra():
        from dwarf_bench_tpu.ops import reduce as reduce_ops
        from dwarf_bench_tpu.utils.roofline import ACHIEVABLE_ROWS_PER_S

        n = 1 << 24
        x = jax.device_put(
            rng.integers(1, 10000, n, endpoint=True).astype(np.int32),
            device,
        )
        # elementwise perturbation, NOT the one-element poke: around a
        # single dynamic-update-slice XLA incrementalizes the running
        # sum (a 747 Grows/s reading — 3.6x the read bound); the
        # fused x + (c & 1) add changes every element, forcing a true
        # re-read, and fuses into the reduction at zero extra traffic
        from dwarf_bench_tpu.utils.timing import time_device_looped

        t = time_device_looped(
            lambda v: reduce_ops.reduce_sum_xla(v).reshape(1), x,
            perturb=lambda a, c: (a[0] + (c & 1),),
            fold=lambda o: (o[0] & 1).astype(jnp.int32),
        )
        extras["reduce_rows_per_s"] = round(n / t)
        extras["reduce_roofline_frac"] = round(
            (n / t) / (bw / BYTES_PER_ROW["reduce"]), 4
        )
        extras["reduce_frac_of_achievable"] = round(
            (n / t) / ACHIEVABLE_ROWS_PER_S["reduce"], 4
        )

    def run_hash2p24_extra():
        # BASELINE config #4 at bench scale: single timed runs (the
        # builds run seconds, not µs — host wall with a real fence is
        # the honest measure; queue-k depth-1000 would take hours).
        from dwarf_bench_tpu.ops import bucket_hash, cuckoo
        from dwarf_bench_tpu.utils.timing import timed

        # BENCH_HASH_N: CI smoke override (CPU can't run 2^24 in budget)
        n = int(os.environ.get("BENCH_HASH_N", str(1 << 24)))
        keys = (
            rng.permutation(2 * n)[:n].astype(np.uint32) + 1
        )  # distinct, <= 2n
        vals = rng.integers(1, 10000, n, endpoint=True).astype(np.uint32)
        dk = jax.device_put(keys, device)
        dv = jax.device_put(vals, device)
        # 50% hit-rate probe set: half inserted keys, half absent (keys
        # are <= 2n; absent probes live past 4n)
        probes = np.empty(n, np.uint32)
        probes[: n // 2] = keys[: n // 2]
        probes[n // 2 :] = (
            rng.integers(0, n, n // 2).astype(np.uint32)
            + np.uint32(4 * n)
        )
        dp = jax.device_put(probes, device)

        nb = bucket_hash.calculate_buckets_count(n)
        build_fn = jax.jit(
            lambda k, v: bucket_hash.build(k, v, num_buckets=nb)
        )
        tbl, _ = timed(build_fn, dk, dv)  # compile+warm
        _, t_build = timed(build_fn, dk, dv)
        # round-5 probe engine: bitonic sort-merge (one query pair sort +
        # log2(N)-stage merge vs the build-sorted keys). val_bits=16 is
        # host-known (values are [1, 10000]) — the radix convention.
        probe_fn = jax.jit(partial(bucket_hash.find, val_bits=16))
        t_probe = _time_op(probe_fn, tbl, dp, repeats=1)
        extras["slab_build_2p24_ms"] = round(t_build * 1e3, 2)
        extras["slab_probe_hit50_2p24_ms"] = round(t_probe * 1e3, 2)
        extras["slab_probe_hit50_rows_per_s"] = round(n / t_probe)

        # free the slab table before the 256 MB cuckoo build (the two
        # structures together exhausted device memory in the first run)
        del tbl
        ht_size = 4 * n
        max_iters = 256  # rounds cap; host re-seeds on non-convergence
        t0 = time.time()
        attempt = 0
        while True:  # host rebuild loop (cuckoo_hash_build.cpp:43-93)
            tbl, t_try = timed(
                cuckoo.build, dk, ht_size,
                np.uint32(0x9E3779B9 + attempt),
                np.uint32(0x85EBCA6B + 2 * attempt), max_iters,
            )
            if bool(tbl.success) or attempt >= 4:
                break
            attempt += 1
        extras["cuckoo_build_2p24_ms"] = round((time.time() - t0) * 1e3, 1)
        extras["cuckoo_build_2p24_rounds"] = int(tbl.rounds)
        extras["cuckoo_build_2p24_attempts"] = attempt + 1
        extras["cuckoo_build_2p24_converged"] = bool(tbl.success)
        # warm build = the engine truth (the first call above carries
        # the remote compile; round-5 phase-split build: 7.0 s warm at
        # 2^24 vs 38.9 in round 4 — measure_r6 c1)
        _, t_warm = timed(
            cuckoo.build, dk, ht_size,
            np.uint32(0x9E3779B9 + attempt),
            np.uint32(0x85EBCA6B + 2 * attempt), max_iters,
        )
        extras["cuckoo_build_2p24_warm_ms"] = round(t_warm * 1e3, 1)
        t_has = _time_op(jax.jit(cuckoo.has), tbl, dp, repeats=1)
        extras["cuckoo_probe_hit50_2p24_ms"] = round(t_has * 1e3, 2)
        extras["cuckoo_probe_hit50_rows_per_s"] = round(n / t_has)

    # (name, runner, minimum seconds of budget to attempt it —
    # remote-compile estimates on the accelerator; CPU compiles are fast)
    components = [
        ("radix", run_radix, 240 if on_accel else 10),
        ("groupby", run_groupby, 240 if on_accel else 10),
        ("groupby_big", run_groupby_big, 240 if on_accel else 10),
        ("join", run_join, 420 if on_accel else 20),
        ("scan", run_scan, 700 if on_accel else 20),
    ]
    extra_components = [
        ("scan_sel50_extra", run_scan_sel50_extra, 240 if on_accel else 10),
        ("reduce_extra", run_reduce_extra, 120 if on_accel else 10),
        ("hash2p24_extra", run_hash2p24_extra, 600 if on_accel else 30),
    ]
    for name, runner, min_budget in components:
        if remaining() < min_budget:
            skipped.append(name)
            continue
        try:
            measured[name] = runner()
        except Exception as e:  # noqa: BLE001 — a dead component must not
            skipped.append(f"{name}:{type(e).__name__}")  # kill the report
    for name, runner, min_budget in extra_components:
        if remaining() < min_budget:
            skipped.append(name)
            continue
        try:
            runner()
        except Exception as e:  # noqa: BLE001
            skipped.append(f"{name}:{type(e).__name__}")

    from dwarf_bench_tpu.utils.roofline import ACHIEVABLE_ROWS_PER_S

    target = {op: 0.7 * bw / BYTES_PER_ROW[op] for op in measured}
    # dual-bound report (round-4 verdict item 7): the BW targets stay
    # fixed for cross-round comparability, but several operators are
    # compute-bound by construction on TPU — frac_of_achievable tracks
    # progress against the documented per-component bound instead
    # (utils/roofline.ACHIEVABLE_ROWS_PER_S ↔ docs/performance.md).
    frac_ach = {
        op: round(v / ACHIEVABLE_ROWS_PER_S[op], 4)
        for op, v in measured.items()
        if op in ACHIEVABLE_ROWS_PER_S
    }
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
                "frac_of_achievable": frac_ach,
                "skipped": skipped,
                "timing_method": "device-looped fori slope (kernel time; "
                                 "per-call host dispatch excluded)",
                "elapsed_s": round(time.time() - t_start, 1),
                "device": str(device),
                **extras,
            }
        )
    )


if __name__ == "__main__":
    main()
