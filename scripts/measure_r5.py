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
    for rows in (512, 1024, 2048):
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
