"""Round-4 TPU experiments: the 3-op SWAR zero-detect, cashed in.

Round 3 left a builder-documented VPU floor gap on three engines
(docs/performance.md leverage items 2-3, round-3 verdict items 1-2):
the SWAR one-hot zdetect was ~6 int32 ops per 4 bins, and digits are
7-bit, so the generic byte zero-detector is overkill: with patterns
PRE-INVERTED, ``z = ((rep ^ ~pats) - 0x7F7F7F7F) & 0x80808080`` is
exact in 3 ops (xor+sub+and; no cross-byte borrows since every byte of
``rep ^ ~pats`` is >= 0x80). This script measures it everywhere it
applies, plus the new SWAR weighted group-by kernel.

Groups (run as `python scripts/measure_r5.py h1 g1 ...`):

  h1: radix histogram zdetect A/B at 2^22 (hi80 + hi128, rows=32):
      fast_zdetect True vs False, plus DEVICE-side equality of the two
      (the bf16 lesson: interpret mode cannot catch Mosaic arithmetic).
  h2: sort_auto end-to-end at 2^22 and 2^24 with the fast zdetect wired
      (histogram_dispatch default), plus small/degenerate DEVICE
      validation (25600-element reference small grid, single-value).
  g1: groupby G=64 at 2^22: shipped groupby_small_pallas vs the new
      groupby_small_swar_pallas; block-shape sweep within the int32
      dot-cell bound (rows*w <= 131072).
  g2: DEVICE-side validation of groupby_small_swar_pallas vs the
      shipped kernel at 2^22 (uniform keys) and degenerate (all-one-key,
      max values) inputs.

  CAUTION: QUIET HOST required (queue-k enqueue is host-bound; a
  concurrent CPU sweep once inflated readings 6x).
"""

from __future__ import annotations

import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from dwarf_bench_tpu.utils.timing import time_amortized


def _scalar(x):
    return np.asarray(jax.jit(lambda a: a.ravel()[0])(x))


def _mismatches(a, b):
    return int(_scalar(jnp.sum((a != b).astype(jnp.int32))))


def h1():
    from dwarf_bench_tpu.ops.hist_pallas import histogram_16k_swar_pallas

    rng = np.random.default_rng(0)
    n = 1 << 22
    for hb, span in ((80, 10000), (128, 16384)):
        k = jnp.asarray(rng.integers(0, span, n).astype(np.int32))
        outs = {}
        for fast in (False, True):
            fn = jax.jit(partial(histogram_16k_swar_pallas, hi_bins=hb,
                                 fast_zdetect=fast))
            outs[fast] = fn(k)
            t = time_amortized(fn, k)
            print(f"h1 hist hi{hb} fast={fast}: {t*1e3:.3f} ms",
                  flush=True)
        mm = _mismatches(outs[True], outs[False])
        print(f"h1 hi{hb} device equality fast-vs-generic: "
              f"{mm} mismatched bins", flush=True)
        assert mm == 0, "3-op zdetect DIVERGES on device"


def h2():
    from dwarf_bench_tpu.ops.sort import sort_auto

    rng = np.random.default_rng(0)
    for lg in (22, 24):
        n = 1 << lg
        x = jnp.asarray(
            rng.integers(1, 10000, n, endpoint=True).astype(np.int32)
        )
        t = time_amortized(jax.jit(sort_auto), x)
        print(f"h2 sort_auto 2^{lg}: {t*1e3:.3f} ms = "
              f"{n/t/1e9:.2f} Grows/s", flush=True)
    # small + degenerate device validation (reference small grid size)
    for x in (
        rng.integers(1, 10000, 25600, endpoint=True).astype(np.int32),
        np.full(25600, 7, np.int32),
        rng.integers(-5, 5, 256).astype(np.int32),
        np.array([3, 1, 2], np.int32),
    ):
        got = np.asarray(sort_auto(jnp.asarray(x)))
        ok = np.array_equal(got, np.sort(x))
        print(f"h2 small n={x.shape[0]} span={int(x.max()-x.min())}: "
              f"{'OK' if ok else 'MISMATCH'}", flush=True)
        assert ok


def g1():
    from dwarf_bench_tpu.ops.groupby_pallas import (
        groupby_small_pallas,
        groupby_small_swar_pallas,
    )

    rng = np.random.default_rng(0)
    n, G = 1 << 22, 64
    k = jnp.asarray(rng.integers(0, G, n).astype(np.uint32))
    v = jnp.asarray(
        rng.integers(1, 10000, n, endpoint=True).astype(np.uint32)
    )
    t = time_amortized(
        jax.jit(partial(groupby_small_pallas, num_groups=G)), k, v
    )
    print(f"g1 shipped groupby_small (32,4096): {t*1e3:.3f} ms = "
          f"{n/t/1e9:.2f} Grows/s", flush=True)
    for rows, w in ((32, 4096), (16, 4096), (8, 4096), (64, 2048),
                    (16, 8192)):
        fn = jax.jit(partial(groupby_small_swar_pallas, num_groups=G,
                             rows=rows, w=w))
        t = time_amortized(fn, k, v)
        print(f"g1 SWAR groupby ({rows},{w}): {t*1e3:.3f} ms = "
              f"{n/t/1e9:.2f} Grows/s", flush=True)


def g2():
    from dwarf_bench_tpu.ops.groupby_pallas import (
        groupby_small_pallas,
        groupby_small_swar_pallas,
    )

    rng = np.random.default_rng(1)
    n, G = 1 << 22, 64
    cases = [
        ("uniform", rng.integers(0, G, n).astype(np.uint32),
         rng.integers(1, 10000, n, endpoint=True).astype(np.uint32)),
        ("one-key-max-v", np.zeros(n, np.uint32),
         np.full(n, (1 << 14) - 1, np.uint32)),
        ("oor-mix", rng.integers(0, G + 40, n).astype(np.uint32),
         rng.integers(0, 1 << 14, n).astype(np.uint32)),
    ]
    for name, k, v in cases:
        dk, dv = jnp.asarray(k), jnp.asarray(v)
        a = groupby_small_pallas(dk, dv, G)
        b = groupby_small_swar_pallas(dk, dv, G)
        mm = _mismatches(a, b)
        print(f"g2 {name}: {mm} mismatched groups", flush=True)
        assert mm == 0, f"SWAR groupby diverges on device ({name})"


def j1():
    """Join probe A/B at 2^20: XLA rel-gather baseline vs the round-2
    HIGHEST-1-dot fused kernel vs the round-4 scaled-plane-concat kernel
    (hi 128 + 80), plus device equality of the new kernel."""
    from dwarf_bench_tpu.ops import csr_join
    from dwarf_bench_tpu.ops.mxu_gather import gather_16k_rel
    from dwarf_bench_tpu.ops.probe_pallas import (
        probe_dense_cat_pallas,
        probe_dense_rel_pallas,
    )

    rng = np.random.default_rng(0)
    n = 1 << 20
    A = rng.integers(1, 10000, n, endpoint=True).astype(np.uint32)
    B = rng.integers(1, 10000, n, endpoint=True).astype(np.uint32)
    tbl = csr_join.build_dense(jnp.asarray(A))
    minv = int(np.asarray(tbl.minv))
    ki = jnp.asarray((B.astype(np.int64) - minv).astype(np.int32))

    t = time_amortized(
        jax.jit(partial(gather_16k_rel, hi_rows=128)),
        tbl.packed3, tbl.base128, ki,
    )
    print(f"j1 XLA gather_16k_rel (shipped): {t*1e3:.3f} ms", flush=True)
    t = time_amortized(
        jax.jit(partial(probe_dense_rel_pallas)),
        tbl.packed3, tbl.base128, ki,
    )
    print(f"j1 pallas rel (HIGHEST 1-dot, r2): {t*1e3:.3f} ms",
          flush=True)
    outs = {}
    for hr in (128, 80):
        fn = jax.jit(partial(probe_dense_cat_pallas, hi_rows=hr))
        outs[hr] = fn(tbl.packed3, tbl.base128, ki)
        t = time_amortized(fn, tbl.packed3, tbl.base128, ki)
        print(f"j1 pallas CAT hi{hr}: {t*1e3:.3f} ms", flush=True)
    # device equality vs the shipped XLA path
    ref = csr_join.probe_dense(tbl, jnp.asarray(B))
    for hr in (128, 80):
        pos, cnt = outs[hr]
        mm = _mismatches(pos, ref.pos) + _mismatches(cnt, ref.counts)
        print(f"j1 CAT hi{hr} equality: {mm} mismatches", flush=True)
        assert mm == 0, f"CAT probe diverges on device (hi{hr})"
    # full join pipeline with the CAT probe for context
    t = time_amortized(jax.jit(csr_join.build_dense), jnp.asarray(A))
    print(f"j1 build_dense total: {t*1e3:.3f} ms", flush=True)


def s1():
    """Scan phase-A A/B at 2^24: XLA fused reductions (shipped) vs the
    round-4 lane-roll kernel; rows sweep; device equality; then the full
    filter_sparse e2e with each."""
    from dwarf_bench_tpu.ops.chunk_stats import chunk_stats_xla
    from dwarf_bench_tpu.ops.chunk_stats_pallas import (
        chunk_stats_roll_pallas,
    )

    rng = np.random.default_rng(0)
    n = 1 << 24
    x = rng.integers(1, 10000, n, endpoint=True).astype(np.int32)
    x2 = jnp.asarray(x.reshape(-1, 128))
    thr = 5
    t = time_amortized(jax.jit(chunk_stats_xla), x2, thr)
    print(f"s1 chunk_stats_xla: {t*1e3:.3f} ms", flush=True)
    sx, bx = chunk_stats_xla(x2, thr)
    for rows in (1024, 2048):
        fn = jax.jit(partial(chunk_stats_roll_pallas, rows=rows))
        sr, br = fn(x2, thr)
        t = time_amortized(fn, x2, thr)
        print(f"s1 roll rows={rows}: {t*1e3:.3f} ms", flush=True)
        if rows == 1024:
            mm = _mismatches(sx, sr) + _mismatches(bx, br)
            print(f"s1 roll equality: {mm} mismatches", flush=True)
            assert mm == 0, "roll stats diverge on device"


def s2():
    """filter_sparse e2e at 2^24 with the shipped XLA stats — the
    round-4 driver-robustness reference reading (min over repeats)."""
    from dwarf_bench_tpu.ops.scan import filter_sparse

    rng = np.random.default_rng(0)
    n = 1 << 24
    x = jnp.asarray(
        rng.integers(1, 10000, n, endpoint=True).astype(np.int32)
    )
    fn = jax.jit(filter_sparse)
    ts = [time_amortized(fn, x) for _ in range(3)]
    print("s2 filter_sparse e2e x3: "
          + ", ".join(f"{t*1e3:.3f}" for t in ts)
          + f" ms -> min {min(ts)*1e3:.3f} = {n/min(ts)/1e9:.1f} G",
          flush=True)


def h3():
    """Dot-issue hypothesis, histogram: lane-stacked strips (one dot per
    ``stack`` rows) at 2^22, hi80 + hi128, fast zdetect."""
    from dwarf_bench_tpu.ops.hist_pallas import histogram_16k_swar_pallas

    rng = np.random.default_rng(0)
    n = 1 << 22
    for hb, span in ((80, 10000), (128, 16384)):
        k = jnp.asarray(rng.integers(0, span, n).astype(np.int32))
        ref = None
        for stack in (1, 4, 8, 16, 32):
            fn = jax.jit(partial(histogram_16k_swar_pallas, hi_bins=hb,
                                 stack=stack))
            try:
                out = fn(k)
                t = time_amortized(fn, k)
            except Exception as e:
                print(f"h3 hi{hb} stack={stack}: FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)
                continue
            if ref is None:
                ref = out
            mm = _mismatches(out, ref)
            print(f"h3 hi{hb} stack={stack}: {t*1e3:.3f} ms "
                  f"(mism {mm})", flush=True)
            assert mm == 0


def g3():
    """Dot-issue hypothesis, groupby G=64: lane-stacked strips."""
    from dwarf_bench_tpu.ops.groupby_pallas import (
        groupby_small_swar_pallas,
    )

    rng = np.random.default_rng(0)
    n, G = 1 << 22, 64
    k = jnp.asarray(rng.integers(0, G, n).astype(np.uint32))
    v = jnp.asarray(
        rng.integers(1, 10000, n, endpoint=True).astype(np.uint32)
    )
    ref = None
    for stack in (1, 4, 8, 16, 32):
        fn = jax.jit(partial(groupby_small_swar_pallas, num_groups=G,
                             stack=stack))
        try:
            out = fn(k, v)
            t = time_amortized(fn, k, v)
        except Exception as e:
            print(f"g3 stack={stack}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)
            continue
        if ref is None:
            ref = out
        mm = _mismatches(out, ref)
        print(f"g3 stack={stack}: {t*1e3:.3f} ms = {n/t/1e9:.2f} G "
              f"(mism {mm})", flush=True)
        assert mm == 0


def j2():
    """Dot-issue hypothesis, CAT probe: stacked query strips at 2^20."""
    from dwarf_bench_tpu.ops import csr_join
    from dwarf_bench_tpu.ops.probe_pallas import probe_dense_cat_pallas

    rng = np.random.default_rng(0)
    n = 1 << 20
    A = rng.integers(1, 10000, n, endpoint=True).astype(np.uint32)
    B = rng.integers(1, 10000, n, endpoint=True).astype(np.uint32)
    tbl = csr_join.build_dense(jnp.asarray(A))
    minv = int(np.asarray(tbl.minv))
    ki = jnp.asarray((B.astype(np.int64) - minv).astype(np.int32))
    ref = csr_join.probe_dense(tbl, jnp.asarray(B))
    for hr in (80, 128):
        for stack in (2, 4, 8):
            fn = jax.jit(partial(probe_dense_cat_pallas, hi_rows=hr,
                                 stack=stack))
            try:
                pos, cnt = fn(tbl.packed3, tbl.base128, ki)
                t = time_amortized(fn, tbl.packed3, tbl.base128, ki)
            except Exception as e:
                print(f"j2 hi{hr} stack={stack}: FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)
                continue
            mm = _mismatches(pos, ref.pos) + _mismatches(cnt, ref.counts)
            print(f"j2 CAT hi{hr} stack={stack}: {t*1e3:.3f} ms "
                  f"(mism {mm})", flush=True)
            assert mm == 0


def _looped(fn, x, K, perturb, fold):
    """Device-looped timing: run ``fn`` K times inside ONE jit with a
    data-dependence chain (carry perturbs the input; no host dispatch
    between iterations). Returns per-iteration seconds via the
    (T_K - T_1) slope — the true device kernel time even when Python
    dispatch exceeds it."""
    def make(KK):
        @jax.jit
        def g(xx):
            def body(i, carry):
                out = fn(perturb(xx, carry))
                return fold(out)
            return jax.lax.fori_loop(0, KK, body, jnp.int32(0))
        return g
    g1, gk = make(1), make(K + 1)
    t1 = min(time_amortized(g1, x) for _ in range(2))
    tk = min(time_amortized(gk, x) for _ in range(2))
    return (tk - t1) / K


def d1():
    """THE measurement-method experiment: per-call queue-k readings vs
    device-looped truth. If the host's per-call dispatch exceeds a
    sub-ms kernel, queue-k measures DISPATCH, not the device — the
    suspected cause of the h1/g1-vs-g3 session variance and the
    round-3 docs-vs-driver scan gap."""
    from dwarf_bench_tpu.ops.hist_pallas import histogram_16k_swar_pallas
    from dwarf_bench_tpu.ops.groupby_pallas import (
        groupby_small_swar_pallas,
        groupby_small_pallas,
    )
    from dwarf_bench_tpu.ops.mxu_gather import gather_16k_rel
    from dwarf_bench_tpu.ops import csr_join
    from dwarf_bench_tpu.ops.probe_pallas import probe_dense_cat_pallas
    from dwarf_bench_tpu.ops.chunk_stats import chunk_stats_xla
    from dwarf_bench_tpu.ops.chunk_stats_pallas import (
        chunk_stats_roll_pallas,
    )

    rng = np.random.default_rng(0)
    tiny = jnp.zeros((8, 128), jnp.int32)
    f = jax.jit(lambda x: x + 1)
    for _ in range(3):
        t = time_amortized(f, tiny)
        print(f"d1 queue-k dispatch floor (tiny x+1): {t*1e3:.3f} ms",
              flush=True)

    n = 1 << 22
    k = jnp.asarray(rng.integers(0, 10000, n).astype(np.int32))
    K = 16
    for stack in (1, 16):
        fn = partial(histogram_16k_swar_pallas, hi_bins=80, stack=stack)
        t = _looped(fn, k, K,
                    lambda x, c: x + (c & 1),
                    lambda out: (out[0] & 1).astype(jnp.int32))
        print(f"d1 hist hi80 stack={stack} DEVICE: {t*1e3:.3f} ms",
              flush=True)

    G = 64
    kk = jnp.asarray(rng.integers(0, G, n).astype(np.uint32))
    vv = jnp.asarray(
        rng.integers(1, 10000, n, endpoint=True).astype(np.uint32)
    )
    for name, fn0 in (("shipped", groupby_small_pallas),
                      ("swar s1", partial(groupby_small_swar_pallas,
                                          stack=1)),
                      ("swar s4", partial(groupby_small_swar_pallas,
                                          stack=4))):
        fn = partial(fn0, num_groups=G)
        t = _looped(lambda v: fn(kk, v), vv, K,
                    lambda v, c: v + (c & 1).astype(jnp.uint32),
                    lambda out: (out[0] & 1).astype(jnp.int32))
        print(f"d1 groupby {name} DEVICE: {t*1e3:.3f} ms = "
              f"{n/t/1e9:.1f} G", flush=True)

    m = 1 << 20
    A = rng.integers(1, 10000, m, endpoint=True).astype(np.uint32)
    B = rng.integers(1, 10000, m, endpoint=True).astype(np.uint32)
    tbl = csr_join.build_dense(jnp.asarray(A))
    minv = int(np.asarray(tbl.minv))
    ki = jnp.asarray((B.astype(np.int64) - minv).astype(np.int32))
    for name, fn in (
        ("XLA rel", lambda q: gather_16k_rel(tbl.packed3, tbl.base128,
                                             q)[0]),
        ("CAT hi80", lambda q: probe_dense_cat_pallas(
            tbl.packed3, tbl.base128, q, hi_rows=80)[0]),
        ("CAT hi80 s4", lambda q: probe_dense_cat_pallas(
            tbl.packed3, tbl.base128, q, hi_rows=80, stack=4)[0]),
    ):
        t = _looped(fn, ki, K,
                    lambda x, c: jnp.minimum(x + (c & 1), 10239),
                    lambda out: (out[0] & 1).astype(jnp.int32))
        print(f"d1 probe {name} DEVICE: {t*1e3:.3f} ms", flush=True)

    ns = 1 << 24
    xs = jnp.asarray(
        rng.integers(1, 10000, ns, endpoint=True).astype(np.int32)
    ).reshape(-1, 128)
    for name, fn in (
        ("stats XLA", lambda x: chunk_stats_xla(x, 5)[0]),
        ("stats roll", lambda x: chunk_stats_roll_pallas(x, 5)[0]),
    ):
        t = _looped(fn, xs, K,
                    lambda x, c: x + (c & 1),
                    lambda out: (out[0] & 1).astype(jnp.int32))
        print(f"d1 scan {name} DEVICE: {t*1e3:.3f} ms", flush=True)


def d2():
    """Device-looped FULL pipelines (the bench components): sort_auto at
    2^22, filter_sparse at 2^24, groupby at 2^22 — the honest device
    kernel_time for the headline ops."""
    from dwarf_bench_tpu.ops.sort import sort_auto
    from dwarf_bench_tpu.ops.scan import filter_sparse
    from dwarf_bench_tpu.ops import groupby

    rng = np.random.default_rng(0)
    n = 1 << 22
    x = jnp.asarray(
        rng.integers(1, 10000, n, endpoint=True).astype(np.int32)
    )
    t = _looped(lambda v: sort_auto(v)[:1], x, 8,
                lambda v, c: v + (c & 1),
                lambda out: (out[0] & 1).astype(jnp.int32))
    print(f"d2 sort_auto 2^22 DEVICE: {t*1e3:.3f} ms = "
          f"{n/t/1e9:.2f} G", flush=True)

    ns = 1 << 24
    xs = jnp.asarray(
        rng.integers(1, 10000, ns, endpoint=True).astype(np.int32)
    )
    t = _looped(lambda v: filter_sparse(v)[0][:1], xs, 8,
                # xor of the last bit defeats hoisting but keeps the
                # value range and the benchmark selectivity
                lambda v, c: v ^ (c & 1),
                lambda out: (out[0] & 1).astype(jnp.int32))
    print(f"d2 filter_sparse 2^24 DEVICE: {t*1e3:.3f} ms = "
          f"{ns/t/1e9:.2f} G", flush=True)

    G = 64
    kk = jnp.asarray(rng.integers(0, G, n).astype(np.uint32))
    vv = jnp.asarray(
        rng.integers(1, 10000, n, endpoint=True).astype(np.uint32)
    )
    t = _looped(lambda v: groupby.groupby_sum(kk, v, G,
                                              vals_below_2p14=True)[:1],
                vv, 8,
                lambda v, c: v + (c & 1).astype(jnp.uint32),
                lambda out: (out[0] & 1).astype(jnp.int32))
    print(f"d2 groupby G=64 DEVICE: {t*1e3:.3f} ms = "
          f"{n/t/1e9:.2f} G", flush=True)


def _gb_diag_kernel_factory(mode, ga=8, gb=8, rows=32, w=4096, naccs=1):
    """Diagnostic variants of the SWAR groupby block kernel:
    'full' = construction + dots; 'nodot' = construction only (cheap
    slice consumption keeps arrays live); 'dotonly' = constant operands,
    dots + accumulate chain only; naccs > 1 breaks the accumulator RAW
    chain with round-robin accumulators."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L7 = np.uint32(0x7F7F7F7F)
    L8 = np.uint32(0x80808080)
    M1 = np.uint32(0x01010101)
    shift = int(np.log2(gb))

    def kernel(k_ref, v_ref, out_ref, *accs):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            for a in accs:
                a[...] = jnp.zeros((ga, gb), jnp.int32)

        pinv_a = ~(
            jax.lax.broadcasted_iota(jnp.uint32, (ga // 4, w), 0)
            * np.uint32(4 * 0x01010101) + np.uint32(0x03020100)
        )
        pinv_b = ~(
            jax.lax.broadcasted_iota(jnp.uint32, (gb // 4, w), 0)
            * np.uint32(4 * 0x01010101) + np.uint32(0x03020100)
        )
        dims = (((1,), (1,)), ((), ()))

        def build(r):
            row = k_ref[r, :].reshape(1, w)
            val = v_ref[r, :].reshape(1, w)
            hi = row >> shift
            lo = row & (gb - 1)
            za = (jnp.broadcast_to(hi.astype(jnp.uint32) * M1,
                                   (ga // 4, w)) ^ pinv_a) - L7 & L8
            zb = (jnp.broadcast_to(lo.astype(jnp.uint32) * M1,
                                   (gb // 4, w)) ^ pinv_b) - L7 & L8
            q = (zb >> 7) & M1
            wlo = q * jnp.broadcast_to((val & 0x7F).astype(jnp.uint32),
                                       (gb // 4, w))
            whi = q * jnp.broadcast_to((val >> 7).astype(jnp.uint32),
                                       (gb // 4, w))
            return (pltpu.bitcast(za, jnp.int8),
                    pltpu.bitcast(wlo, jnp.int8),
                    pltpu.bitcast(whi, jnp.int8))

        if mode == "dotonly":
            oh_a, blo, bhi = build(0)
        for r in range(rows):
            if mode != "dotonly":
                oh_a, blo, bhi = build(r)
            if mode == "nodot":
                # consume via cheap slices (keeps construction live)
                accs[r % naccs][...] += (
                    oh_a[:, :gb].astype(jnp.int32)
                    + blo[:ga, :gb].astype(jnp.int32)
                    + bhi[:ga, :gb].astype(jnp.int32)
                )
            else:
                a = accs[r % naccs]
                a[...] -= jax.lax.dot_general(
                    oh_a, blo, dimension_numbers=dims,
                    preferred_element_type=jnp.int32) >> 7
                a[...] -= jax.lax.dot_general(
                    oh_a, bhi, dimension_numbers=dims,
                    preferred_element_type=jnp.int32) >> 7

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            tot = accs[0][...]
            for a in accs[1:]:
                tot = tot + a[...]
            out_ref[...] = tot

    def run(k, v):
        n = k.shape[0]
        block = rows * w
        pad = (-n) % block
        kp = jnp.pad(k.astype(jnp.int32), (0, pad))
        vp = jnp.pad(v.astype(jnp.int32), (0, pad))
        return pl.pallas_call(
            kernel,
            grid=((n + pad) // block,),
            in_specs=[
                pl.BlockSpec((rows, w), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, w), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ga, gb), jnp.int32),
            scratch_shapes=[pltpu.VMEM((ga, gb), jnp.int32)
                            for _ in range(naccs)],
        )(kp.reshape(-1, w), vp.reshape(-1, w))

    return run


def d3():
    """Wall location for the 0.22-0.31 ms device times: split the SWAR
    groupby into construction-only vs dots-only (and chain-broken
    accumulators), plus the radix expansion and join-build components
    device-looped."""
    from dwarf_bench_tpu.ops.primitives import sort_by_key
    from dwarf_bench_tpu.ops.cumsum_pallas import cumsum_pallas
    from dwarf_bench_tpu.ops.sort import _expand_runs

    rng = np.random.default_rng(0)
    n, G = 1 << 22, 64
    kk = jnp.asarray(rng.integers(0, G, n).astype(np.uint32))
    vv = jnp.asarray(
        rng.integers(1, 10000, n, endpoint=True).astype(np.uint32)
    )
    for mode, naccs in (("full", 1), ("full", 4), ("nodot", 1),
                        ("dotonly", 1), ("dotonly", 4)):
        fn = _gb_diag_kernel_factory(mode, naccs=naccs)
        try:
            t = _looped(lambda v: fn(kk, v), vv, 16,
                        lambda v, c: v + (c & 1).astype(jnp.uint32),
                        lambda out: (out[0, 0] & 1).astype(jnp.int32))
            print(f"d3 gb {mode} naccs={naccs} DEVICE: {t*1e3:.3f} ms",
                  flush=True)
        except Exception as e:
            print(f"d3 gb {mode} naccs={naccs}: FAILED "
                  f"{type(e).__name__}: {str(e)[:120]}", flush=True)

    # radix expansion components at 2^22
    counts = jnp.asarray(
        np.bincount(
            rng.integers(0, 10240, 1 << 22), minlength=10240
        ).astype(np.int32)
    )
    t = _looped(lambda c: _expand_runs(c, 1 << 22)[:1], counts, 16,
                lambda c, cr: c.at[0].add(cr & 1).at[1].add(-(cr & 1)),
                lambda out: (out[0] & 1).astype(jnp.int32))
    print(f"d3 _expand_runs 2^22 DEVICE: {t*1e3:.3f} ms", flush=True)
    t = _looped(lambda c: cumsum_pallas(c, two_plane=False)[:1],
                jnp.zeros((1 << 22,), jnp.int32), 16,
                lambda c, cr: c.at[0].set(cr & 1),
                lambda out: (out[0] & 1).astype(jnp.int32))
    print(f"d3 cumsum_pallas 2^22 DEVICE: {t*1e3:.3f} ms", flush=True)

    # join-build pieces at 2^20: the (u16, u32) unstable pair sort
    m = 1 << 20
    k16 = jnp.asarray(rng.integers(0, 10000, m).astype(np.uint16))
    ids = jnp.asarray(np.arange(m, dtype=np.uint32))
    t = _looped(
        lambda kq: sort_by_key(kq, ids, stable=False)[1][:1], k16, 8,
        lambda kq, c: kq ^ (c & 1).astype(jnp.uint16),
        lambda out: (out[0] & 1).astype(jnp.int32))
    print(f"d3 pair sort (u16,u32) 2^20 DEVICE: {t*1e3:.3f} ms",
          flush=True)


def _gb_dbuf_kernel(ga=8, gb=8, rows=32, w=4096):
    """Double-buffered SWAR groupby: build row r+1's operands into the
    alternate VMEM scratch set while the MXU dots row r's — breaks the
    VPU→MXU operand dependency so the units can overlap (d3 found
    construction 0.039 + dots 0.066 but combined 0.223: the per-row
    operand staging serializes them)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L7 = np.uint32(0x7F7F7F7F)
    L8 = np.uint32(0x80808080)
    M1 = np.uint32(0x01010101)
    shift = int(np.log2(gb))
    sentinel = np.uint32(ga << shift)

    def kernel(k_ref, v_ref, out_ref, acc_lo, acc_hi,
               oa0, oa1, bl0, bl1, bh0, bh1):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_lo[...] = jnp.zeros((ga, gb), jnp.int32)
            acc_hi[...] = jnp.zeros((ga, gb), jnp.int32)

        pinv_a = ~(
            jax.lax.broadcasted_iota(jnp.uint32, (ga // 4, w), 0)
            * np.uint32(4 * 0x01010101) + np.uint32(0x03020100)
        )
        pinv_b = ~(
            jax.lax.broadcasted_iota(jnp.uint32, (gb // 4, w), 0)
            * np.uint32(4 * 0x01010101) + np.uint32(0x03020100)
        )
        dims = (((1,), (1,)), ((), ()))
        oas, bls, bhs = (oa0, oa1), (bl0, bl1), (bh0, bh1)

        def build_into(r, b):
            row = k_ref[r, :].reshape(1, w)
            val = v_ref[r, :].reshape(1, w)
            bad = row.astype(jnp.uint32) >= jnp.uint32(int(sentinel))
            hi = jnp.where(bad, np.int32(127), row >> shift)
            lo = row & (gb - 1)
            za = (jnp.broadcast_to(hi.astype(jnp.uint32) * M1,
                                   (ga // 4, w)) ^ pinv_a) - L7 & L8
            zb = (jnp.broadcast_to(lo.astype(jnp.uint32) * M1,
                                   (gb // 4, w)) ^ pinv_b) - L7 & L8
            q = (zb >> 7) & M1
            wlo = q * jnp.broadcast_to((val & 0x7F).astype(jnp.uint32),
                                       (gb // 4, w))
            whi = q * jnp.broadcast_to((val >> 7).astype(jnp.uint32),
                                       (gb // 4, w))
            oas[b][...] = pltpu.bitcast(za, jnp.int8)
            bls[b][...] = pltpu.bitcast(wlo, jnp.int8)
            bhs[b][...] = pltpu.bitcast(whi, jnp.int8)

        build_into(0, 0)
        for r in range(rows):
            if r + 1 < rows:
                build_into(r + 1, (r + 1) % 2)
            b = r % 2
            acc_lo[...] -= jax.lax.dot_general(
                oas[b][...], bls[b][...], dimension_numbers=dims,
                preferred_element_type=jnp.int32) >> 7
            acc_hi[...] -= jax.lax.dot_general(
                oas[b][...], bhs[b][...], dimension_numbers=dims,
                preferred_element_type=jnp.int32) >> 7

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            out_ref[...] = acc_lo[...] + (acc_hi[...] << 7)

    def run(k, v):
        n = k.shape[0]
        block = rows * w
        pad = (-n) % block
        kp = jnp.pad(k.astype(jnp.uint32), (0, pad),
                     constant_values=sentinel).astype(jnp.int32)
        vp = jnp.pad(v.astype(jnp.int32), (0, pad))
        out = pl.pallas_call(
            kernel,
            grid=((n + pad) // block,),
            in_specs=[
                pl.BlockSpec((rows, w), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, w), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ga, gb), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((ga, gb), jnp.int32),
                pltpu.VMEM((ga, gb), jnp.int32),
                pltpu.VMEM((ga, w), jnp.int8),
                pltpu.VMEM((ga, w), jnp.int8),
                pltpu.VMEM((gb, w), jnp.int8),
                pltpu.VMEM((gb, w), jnp.int8),
                pltpu.VMEM((gb, w), jnp.int8),
                pltpu.VMEM((gb, w), jnp.int8),
            ],
        )(kp.reshape(-1, w), vp.reshape(-1, w))
        return out.reshape(-1)

    return run


def d4():
    """Double-buffered operand staging: does breaking the VPU→MXU
    dependency recover the d3 component sum (0.039 + 0.066)?"""
    from dwarf_bench_tpu.ops.groupby_pallas import groupby_small_pallas

    rng = np.random.default_rng(0)
    n, G = 1 << 22, 64
    kk = jnp.asarray(rng.integers(0, G, n).astype(np.uint32))
    vv = jnp.asarray(
        rng.integers(1, 10000, n, endpoint=True).astype(np.uint32)
    )
    fn = _gb_dbuf_kernel()
    try:
        out = fn(kk, vv)
        ref = groupby_small_pallas(kk, vv, G)
        mm = _mismatches(out[:G].astype(jnp.uint32), ref)
        t = _looped(lambda v: fn(kk, v)[:G], vv, 16,
                    lambda v, c: v + (c & 1).astype(jnp.uint32),
                    lambda o: (o[0] & 1).astype(jnp.int32))
        print(f"d4 gb double-buffered DEVICE: {t*1e3:.3f} ms = "
              f"{n/t/1e9:.1f} G (mism {mm})", flush=True)
    except Exception as e:
        print(f"d4 gb double-buffered FAILED {type(e).__name__}: "
              f"{str(e)[:150]}", flush=True)


def d5():
    """Scan tail piece costs at 2^24, device-looped: stats (0.091 known),
    tail_streams, the multi-row gather + melems compact, the ordering
    sort at current vs halved caps, and emit. Sizes the VERDICT item-4
    fold and the cap tuning."""
    from dwarf_bench_tpu.ops.chunk_stats import chunk_stats_xla
    from dwarf_bench_tpu.ops.scan_tail_pallas import scan_tail_streams
    from dwarf_bench_tpu.ops.compact_pallas import (
        compact_mask_pallas,
        emit_prefix_pallas,
    )
    from dwarf_bench_tpu.ops.scan import filter_sparse

    rng = np.random.default_rng(0)
    n = 1 << 24
    x = rng.integers(1, 10000, n, endpoint=True).astype(np.int32)
    x2 = jnp.asarray(x.reshape(-1, 128))
    thr = 5
    stat, base = chunk_stats_xla(x2, thr)
    cap_single, cap_mc, cap_melems = 16384, 512, 4096

    t = _looped(
        lambda s: scan_tail_streams(s, base, thr, cap_single, cap_mc)[0][:1],
        stat, 16,
        lambda s, c: s + (c & 1) * 512,  # nudges a cnt by 1
        lambda o: (o[0] & 1).astype(jnp.int32))
    print(f"d5 tail_streams DEVICE: {t*1e3:.3f} ms", flush=True)

    # ordering sort at current and halved cap_single
    for cs in (16384, 8192):
        pos = jnp.asarray(
            rng.integers(0, n, cs + cap_melems).astype(np.int32))
        val = jnp.asarray(
            rng.integers(0, 10, cs + cap_melems).astype(np.int32))
        t = _looped(
            lambda p: jax.lax.sort((p, val), num_keys=1,
                                   is_stable=False)[1][:1],
            pos, 16,
            lambda p, c: p ^ (c & 1),
            lambda o: (o[0] & 1).astype(jnp.int32))
        print(f"d5 ordering sort cap={cs}+{cap_melems} DEVICE: "
              f"{t*1e3:.3f} ms", flush=True)

    # multi-row gather + melems compact (the phase-B middle)
    xp = jnp.asarray(x)
    mids = jnp.asarray(
        np.sort(rng.choice(n // 128, cap_mc, replace=False)).astype(
            np.int32))

    def mid_fn(mids_in):
        rows = xp.reshape(-1, 128)[mids_in]
        gm = rows < thr
        grank = jnp.cumsum(gm.astype(jnp.int32), axis=1) - gm
        gpos = jnp.where(gm, grank, np.int32(0x7FFFFFFF))
        (mpos, mval), _ = compact_mask_pallas(
            gm.reshape(-1), (gpos.reshape(-1),
                             rows.reshape(-1).astype(jnp.int32)),
            capacity=cap_melems)
        return mpos[:1]

    t = _looped(mid_fn, mids, 16,
                lambda m, c: jnp.minimum(m + (c & 1), n // 128 - 1),
                lambda o: (o[0] & 1).astype(jnp.int32))
    print(f"d5 gather+melems-compact DEVICE: {t*1e3:.3f} ms", flush=True)

    # emit at capacity 2^24
    sv = jnp.asarray(rng.integers(0, 5, 20480).astype(np.int32))
    t = _looped(lambda s: emit_prefix_pallas(s, n)[:1], sv, 16,
                lambda s, c: s + (c & 1),
                lambda o: (o[0] & 1).astype(jnp.int32))
    print(f"d5 emit_prefix DEVICE: {t*1e3:.3f} ms", flush=True)

    # e2e with halved cap_single (the cheap cap-tuning candidate)
    xs = jnp.asarray(x)
    for cs in (16384, 8192):
        t = _looped(
            lambda v: filter_sparse(v, cap_single=cs)[0][:1], xs, 8,
            lambda v, c: v ^ (c & 1),
            lambda o: (o[0] & 1).astype(jnp.int32))
        print(f"d5 filter_sparse cap_single={cs} DEVICE: {t*1e3:.3f} ms "
              f"= {n/t/1e9:.1f} G", flush=True)


def d6():
    """Reduce device-looped truth (the round-1 '755 GB/s' queue-k claim
    needs re-verification under honest timing) + the cuckoo 2^24 build
    failure repro from the bench extras."""
    from dwarf_bench_tpu.ops import reduce as reduce_ops

    rng = np.random.default_rng(0)
    n = 1 << 24
    x = jnp.asarray(
        rng.integers(1, 10000, n, endpoint=True).astype(np.int32))
    for name, fn in (("pallas", reduce_ops.reduce_sum_pallas),
                     ("xla", reduce_ops.reduce_sum_xla)):
        t = _looped(lambda v: fn(v).reshape(1), x, 16,
                    lambda v, c: v + (c & 1),
                    lambda o: (o[0] & 1).astype(jnp.int32))
        print(f"d6 reduce {name} DEVICE: {t*1e3:.3f} ms = "
              f"{n*4/t/1e9:.0f} GB/s", flush=True)

    from dwarf_bench_tpu.ops import cuckoo
    keys = rng.permutation(1 << 25)[: 1 << 24].astype(np.uint32) + 1
    dk = jnp.asarray(keys)
    try:
        tbl = cuckoo.build(dk, 4 << 24, np.uint32(1), np.uint32(2),
                           100_000)
        conv = bool(np.asarray(tbl.success))
        print(f"d6 cuckoo 2^24 build: rounds={int(np.asarray(tbl.rounds))}"
              f" converged={conv}", flush=True)
    except Exception as e:
        print(f"d6 cuckoo 2^24 build FAILED {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)


def d7():
    """Re-measure everything with the O(1) in-place iteration coupling
    (time_device_looped_inplace): the elementwise perturbation of d1/d2
    materializes a full copy when the consumer is a Pallas kernel, so
    those readings over-report by up to ~0.08 ms at 2^24. Includes a
    control (trivial fn on a 2^24 carry) to verify XLA aliases the
    loop-carried buffer."""
    from dwarf_bench_tpu.utils.timing import time_device_looped_inplace
    from dwarf_bench_tpu.ops.sort import sort_auto
    from dwarf_bench_tpu.ops.scan import filter_sparse
    from dwarf_bench_tpu.ops import csr_join, groupby
    from dwarf_bench_tpu.ops import reduce as reduce_ops
    from dwarf_bench_tpu.ops.hist_pallas import histogram_16k_swar_pallas
    from dwarf_bench_tpu.ops.chunk_stats import chunk_stats_xla
    from dwarf_bench_tpu.ops.mxu_gather import gather_16k_rel
    from dwarf_bench_tpu.ops.primitives import sort_by_key

    rng = np.random.default_rng(0)
    n24 = 1 << 24
    x24 = jnp.asarray(
        rng.integers(1, 10000, n24, endpoint=True).astype(np.int32))

    # control: loop-carry aliasing (should be ~0 ms/iter)
    t = time_device_looped_inplace(
        lambda x: x[:1], x24,
        update=lambda a, s: (a[0].at[0].set(1 + (s & 1)),),
        fold=lambda o: (o[0] & 1).astype(jnp.int32))
    print(f"d7 CONTROL trivial fn, 2^24 carry: {t*1e3:.3f} ms/iter",
          flush=True)

    t = time_device_looped_inplace(
        filter_sparse, x24,
        update=lambda a, s: (a[0].at[0].set(1 + (s & 1) * 9999),),
        fold=lambda o: (o[0][0] ^ o[1]) & 1)
    print(f"d7 filter_sparse 2^24: {t*1e3:.3f} ms = {n24/t/1e9:.1f} G",
          flush=True)

    t = time_device_looped_inplace(
        lambda x: chunk_stats_xla(x, 5)[0], x24.reshape(-1, 128),
        update=lambda a, s: (a[0].at[0, 0].set(1 + (s & 1)),),
        fold=lambda o: (o[0] & 1).astype(jnp.int32))
    print(f"d7 chunk_stats_xla 2^24: {t*1e3:.3f} ms", flush=True)

    n22 = 1 << 22
    x22 = jnp.asarray(
        rng.integers(1, 10000, n22, endpoint=True).astype(np.int32))
    t = time_device_looped_inplace(
        sort_auto, x22,
        update=lambda a, s: (a[0].at[0].set(1 + (s & 1)),),
        fold=lambda o: (o[0] & 1).astype(jnp.int32))
    print(f"d7 sort_auto 2^22: {t*1e3:.3f} ms = {n22/t/1e9:.2f} G",
          flush=True)
    t = time_device_looped_inplace(
        lambda x: histogram_16k_swar_pallas(x, hi_bins=80), x22,
        update=lambda a, s: (a[0].at[0].set(1 + (s & 1)),),
        fold=lambda o: (o[0] & 1).astype(jnp.int32))
    print(f"d7 hist hi80 2^22: {t*1e3:.3f} ms", flush=True)

    kk = jnp.asarray(rng.integers(0, 64, n22).astype(np.uint32))
    vv = jnp.asarray(
        rng.integers(1, 10000, n22, endpoint=True).astype(np.uint32))
    t = time_device_looped_inplace(
        lambda k, v: groupby.groupby_sum(k, v, 64, vals_below_2p14=True),
        kk, vv,
        update=lambda a, s: (a[0], a[1].at[0].set(
            (1 + (s & 1)).astype(jnp.uint32))),
        fold=lambda o: (o[0] & 1).astype(jnp.int32))
    print(f"d7 groupby G=64 2^22: {t*1e3:.3f} ms = {n22/t/1e9:.1f} G",
          flush=True)

    for name, fn in (("pallas", reduce_ops.reduce_sum_pallas),
                     ("xla", reduce_ops.reduce_sum_xla)):
        t = time_device_looped_inplace(
            lambda v: fn(v).reshape(1), x24,
            update=lambda a, s: (a[0].at[0].set(1 + (s & 1)),),
            fold=lambda o: (o[0] & 1).astype(jnp.int32))
        print(f"d7 reduce {name} 2^24: {t*1e3:.3f} ms = "
              f"{n24 * 4 / t / 1e9:.0f} GB/s", flush=True)

    m = 1 << 20
    A = rng.integers(1, 10000, m, endpoint=True).astype(np.uint32)
    B = rng.integers(1, 10000, m, endpoint=True).astype(np.uint32)
    tbl = csr_join.build_dense(jnp.asarray(A))
    minv = int(np.asarray(tbl.minv))
    ki = jnp.asarray((B.astype(np.int64) - minv).astype(np.int32))
    t = time_device_looped_inplace(
        lambda q: gather_16k_rel(tbl.packed3, tbl.base128, q)[0], ki,
        update=lambda a, s: (a[0].at[0].set(1 + (s & 1)),),
        fold=lambda o: (o[0] & 1).astype(jnp.int32))
    print(f"d7 probe XLA rel 2^20: {t*1e3:.3f} ms", flush=True)
    k16 = jnp.asarray(rng.integers(0, 10000, m).astype(np.uint16))
    ids = jnp.asarray(np.arange(m, dtype=np.uint32))
    t = time_device_looped_inplace(
        lambda kq: sort_by_key(kq, ids, stable=False)[1][:1], k16,
        update=lambda a, s: (a[0].at[0].set(
            (1 + (s & 1)).astype(jnp.uint16)),),
        fold=lambda o: (o[0] & 1).astype(jnp.int32))
    print(f"d7 pair sort 2^20: {t*1e3:.3f} ms", flush=True)


def d8():
    """Scan glue hunt: stage the fused sparse path (no lax.cond) and
    time cumulative prefixes — the d5/d7 pieces sum to ~0.165 but the
    e2e reads 0.263; find the missing ~0.1."""
    from functools import partial as _p

    from dwarf_bench_tpu.ops.chunk_stats import chunk_stats_xla
    from dwarf_bench_tpu.ops.scan_tail_pallas import scan_tail_streams
    from dwarf_bench_tpu.ops.compact_pallas import (
        compact_mask_pallas,
        emit_prefix_pallas,
    )
    from dwarf_bench_tpu.ops.scan import filter_sparse
    from dwarf_bench_tpu.utils.timing import time_device_looped_inplace

    n = 1 << 24
    thr = 5
    cap_single, cap_mc, cap_melems = 16384, 512, 4096
    chunk = 128
    BIG = np.int32(0x7FFFFFFF)

    def pipeline(stage, x):
        nch = n // chunk
        stat, base = chunk_stats_xla(x.reshape(nch, chunk), thr)
        if stage == 0:
            return stat[:1]
        spos, sval, mids, mbase, ns, nm = scan_tail_streams(
            stat, base, thr, cap_single, cap_mc
        )
        if stage == 1:
            return spos[:1]
        total = (base[-1] + (stat[-1] >> 9)).astype(jnp.int32)
        n_melems = total - ns
        iota_m = jnp.arange(cap_mc, dtype=jnp.int32)
        valid_m = iota_m < nm
        midsafe = jnp.where(valid_m, mids, 0)
        rows = x.reshape(nch, chunk)[midsafe]
        gm = (rows < thr) & valid_m[:, None]
        grank = jnp.cumsum(gm.astype(jnp.int32), axis=1) - gm
        gpos = jnp.where(gm, mbase[:, None] + grank, BIG)
        (mpos, mval), _ = compact_mask_pallas(
            gm.reshape(-1),
            (gpos.reshape(-1), rows.reshape(-1).astype(jnp.int32)),
            capacity=cap_melems,
        )
        if stage == 2:
            return mpos[:1]
        iota_e = jnp.arange(cap_melems, dtype=jnp.int32)
        mpos = jnp.where(iota_e < n_melems, mpos, BIG)
        all_pos = jnp.concatenate([spos, mpos])
        all_val = jnp.concatenate([sval, mval])
        _, svals = jax.lax.sort(
            (all_pos, all_val), num_keys=1, is_stable=False
        )
        if stage == 3:
            return svals[:1]
        out = emit_prefix_pallas(svals[: cap_single + cap_melems], n)
        return out[:1]

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.integers(1, 10000, n, endpoint=True).astype(np.int32))
    for stage in (0, 1, 2, 3, 4):
        t = time_device_looped_inplace(
            _p(pipeline, stage), x,
            update=lambda a, s: (
                a[0].at[s & 1023].set(1 + (s & 1) * 9999),),
            fold=lambda o: (o[0] & 1).astype(jnp.int32))
        print(f"d8 pipeline stage<={stage}: {t*1e3:.3f} ms", flush=True)
    t = time_device_looped_inplace(
        filter_sparse, x,
        update=lambda a, s: (a[0].at[s & 1023].set(1 + (s & 1) * 9999),),
        fold=lambda o: (o[0][0] ^ o[1]) & 1)
    print(f"d8 filter_sparse e2e (with cond): {t*1e3:.3f} ms", flush=True)


def d9():
    """Scan levers: (a) the lax.cond tax — same pipeline with the
    fallback branch replaced by a second copy of the fast branch vs the
    real butterfly fallback; (b) tail rows variants; (c) e2e with
    tail_rows=32."""
    from functools import partial as _p

    from dwarf_bench_tpu.ops.chunk_stats import chunk_stats_xla
    from dwarf_bench_tpu.ops.scan_tail_pallas import scan_tail_streams
    from dwarf_bench_tpu.ops.scan import filter_sparse
    from dwarf_bench_tpu.utils.timing import time_device_looped_inplace

    rng = np.random.default_rng(0)
    n = 1 << 24
    x = jnp.asarray(
        rng.integers(1, 10000, n, endpoint=True).astype(np.int32))
    x2 = x.reshape(-1, 128)
    stat, base = chunk_stats_xla(x2, 5)

    for rows in (8, 16, 32):
        fn = _p(scan_tail_streams, threshold=5, cap_single=16384,
                cap_mc=512, rows=rows)
        t = time_device_looped_inplace(
            lambda s: fn(s, base)[0][:1], stat,
            update=lambda a, s: (a[0].at[s & 1023].set(512 * (1 + (s & 1))),),
            fold=lambda o: (o[0] & 1).astype(jnp.int32))
        print(f"d9 tail_streams rows={rows}: {t*1e3:.3f} ms", flush=True)

    for tr in (8, 32):
        t = time_device_looped_inplace(
            _p(filter_sparse, tail_rows=tr), x,
            update=lambda a, s: (
                a[0].at[s & 1023].set(1 + (s & 1) * 9999),),
            fold=lambda o: (o[0][0] ^ o[1]) & 1)
        print(f"d9 filter_sparse tail_rows={tr}: {t*1e3:.3f} ms = "
              f"{n/t/1e9:.1f} G", flush=True)


def d10():
    """Radix cond-tax: the raw counting pipeline (no dispatch) vs the
    lax.switch sort_auto (1 construct) — against the two-nested-cond
    0.505 ms record. Plus full CPU-oracle revalidation of the switch
    dispatch on device at small sizes."""
    from dwarf_bench_tpu.ops.sort import (
        _sort_counting_shifted,
        sort_auto,
    )
    from dwarf_bench_tpu.utils.timing import time_device_looped_inplace

    rng = np.random.default_rng(0)
    n = 1 << 22
    x = jnp.asarray(
        rng.integers(1, 10000, n, endpoint=True).astype(np.int32))
    t = time_device_looped_inplace(
        lambda v: _sort_counting_shifted(v, jnp.min(v), hi_bins=80), x,
        update=lambda a, s: (a[0].at[s & 1023].set(1 + (s & 1)),),
        fold=lambda o: (o[0] & 1).astype(jnp.int32))
    print(f"d10 counting pipeline (no dispatch): {t*1e3:.3f} ms "
          f"= {n/t/1e9:.2f} G", flush=True)
    t = time_device_looped_inplace(
        sort_auto, x,
        update=lambda a, s: (a[0].at[s & 1023].set(1 + (s & 1)),),
        fold=lambda o: (o[0] & 1).astype(jnp.int32))
    print(f"d10 sort_auto (lax.switch): {t*1e3:.3f} ms = "
          f"{n/t/1e9:.2f} G", flush=True)
    for xs in (
        rng.integers(1, 10000, 25600, endpoint=True).astype(np.int32),
        np.full(25600, 7, np.int32),
        rng.integers(-(2**28), 2**28, 4096).astype(np.int32),  # lax.sort
        rng.integers(0, (1 << 14) - 1, 4096).astype(np.int32),  # hi128
    ):
        got = np.asarray(sort_auto(jnp.asarray(xs)))
        assert np.array_equal(got, np.sort(xs)), xs[:4]
    print("d10 switch dispatch small/degenerate device validation OK",
          flush=True)


def d11():
    """Histogram block A/B under in-place device timing (the 0.458 ms
    counting pipeline is 0.017 ms from the 9.5 G bar): rows x stack."""
    from dwarf_bench_tpu.ops.hist_pallas import histogram_16k_swar_pallas
    from dwarf_bench_tpu.ops.sort import _sort_counting_shifted
    from dwarf_bench_tpu.utils.timing import time_device_looped_inplace

    rng = np.random.default_rng(0)
    n = 1 << 22
    k = jnp.asarray(rng.integers(0, 10000, n).astype(np.int32))
    for rows, stack in ((32, 1), (64, 1), (64, 16), (32, 16)):
        fn = partial(histogram_16k_swar_pallas, hi_bins=80, rows=rows,
                     stack=stack)
        try:
            t = time_device_looped_inplace(
                fn, k,
                update=lambda a, s: (a[0].at[s & 1023].set(1 + (s & 1)),),
                fold=lambda o: (o[0] & 1).astype(jnp.int32))
            print(f"d11 hist rows={rows} stack={stack}: {t*1e3:.3f} ms",
                  flush=True)
        except Exception as e:
            print(f"d11 rows={rows} stack={stack} FAILED "
                  f"{type(e).__name__}: {str(e)[:100]}", flush=True)
    x = jnp.asarray(
        rng.integers(1, 10000, n, endpoint=True).astype(np.int32))
    t = time_device_looped_inplace(
        lambda v: _sort_counting_shifted(v, jnp.min(v), hi_bins=80), x,
        update=lambda a, s: (a[0].at[s & 1023].set(1 + (s & 1)),),
        fold=lambda o: (o[0] & 1).astype(jnp.int32))
    print(f"d11 counting e2e: {t*1e3:.3f} ms = {n/t/1e9:.2f} G",
          flush=True)


def main():
    from dwarf_bench_tpu.common.device import (
        enable_persistent_compile_cache,
    )

    enable_persistent_compile_cache()
    groups = sys.argv[1:] or ["h1"]
    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", flush=True)
    for g in groups:
        globals()[g]()


if __name__ == "__main__":
    main()
