"""Round-3 TPU experiments, part A: the VPU one-hot floor + kernel pieces.

Every one-hot-matmul engine (histogram/radix, group-by, the join probe) is
floored by one-hot CONSTRUCTION on the VPU; rounds 1-2 established that
sub-32-bit vector compares don't lower in Mosaic, so narrowing the compare
dtype is out. This round tests a different lever: SWAR — pack 4 elements'
digit bytes into one uint32 lane (sublane-packing, no cross-lane shuffles),
zero-detect all 4 bytes per bin with ~6 int32 ops (exact per-byte detector,
no cross-byte carries), and feed the resulting packed 0x80-indicator bytes
to the int8 MXU via a bitcast. A match contributes (-128)*(-128) = 16384 to
the int32 accumulator, so counts = dot >> 14.

Groups (run as `python scripts/measure_r4.py g2 g3 ...`):

  g1: scan phase breakdown at 2^24 (chunk_stats_xla alone vs filter_sparse
      end-to-end) — sizes the mega-fusion headroom (verdict r2 #4).
  g2: SWAR histogram formulations vs shipped histogram_16k_pallas(hi80):
      f1 lax.bitcast_convert_type + reshape to (hb, 4W), one dot;
      f3 pltpu.bitcast to (4hb, W) + one (4hb, 512) dot + 4 strided
         diagonal-block slices (16x MXU but MXU is far from the bound);
      f4 pltpu.bitcast + 4 stride-4 row slices + 4 paired dots.
  g3: lax.sort shape curve for the join build (verdict r2 #1): flat 2-op
      (u16,u32) baseline; flat 1-op u32; batched (4, 2^18) 1-op; batched
      2-op (256,4096)/(512,2048)/(128,8192); and 2^21-element (512,4096).
  g5: counting-sort expansion pieces at 2^22: full _expand_runs; the 16K
      boundary scatter alone; cumsum_pallas alone (verdict r2 #3).
  g6: join probe pieces at 2^20: gather_16k_rel (shipped f32-HIGHEST,
      plus hi80 and int8-4-plane variants — both measured SLOWER);
      full build_dense / probe_dense split so the 2.0 ms budget is
      itemized (verdict r2 #8).
  g7: scan tail pieces standalone at 2^24 (each carries ~0.1 ms of
      standalone-jit overhead — in-pipeline costs are far lower, which
      is why the old 7-dispatch pipeline sums to 0.31 ms, not 0.9).
  g9: G=2^16 weighted-histogram SWAR A/B (0.798 vs 0.822 — MXU-bound).
  g10/g12: the scan-engine decision data: stats XLA 0.180 / pallas-r2
      0.218 / fused-packed 0.316 standalone; single-step tail 0.377 vs
      streaming tail 0.198; end-to-end interleaved A/B: xla-stats +
      streaming tail 0.239-0.244 ms vs the round-2 path 0.310-0.313.

  CAUTION: run with the host QUIET — a concurrent CPU sweep inflated
  an earlier batch's readings up to 6x (the queue-k enqueue side is
  host-bound); every number above was re-taken quiet.
"""

from __future__ import annotations

import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dwarf_bench_tpu.ops.hist_pallas import histogram_16k_pallas
from dwarf_bench_tpu.utils.timing import time_amortized

_W = 2048


def _sync_scalar(x):
    return np.asarray(jax.jit(lambda a: a.ravel()[0])(x))


# --- g2: SWAR histogram -------------------------------------------------


@partial(jax.jit, static_argnames=("hi_bins", "form", "rows", "interpret"))
def hist_swar(k, hi_bins=80, form="f1", rows=8, interpret=False):
    """histogram_16k semantics (hi_bins*128 bins, out-of-range ignored)
    with SWAR-packed one-hot construction. ``form`` picks the MXU feed:
    f1 = lax.bitcast_convert_type + reshape, f3 = pltpu.bitcast + big dot +
    diagonal extraction, f4 = pltpu.bitcast + 4 paired dots."""
    assert rows % 4 == 0
    n = k.shape[0]
    block = rows * _W
    pad = (-n) % block
    sentinel = np.int32(hi_bins << 7)
    kp = jnp.pad(k.astype(jnp.int32), (0, pad), constant_values=sentinel)
    k2 = kp.reshape(-1, _W)
    nblocks = (n + pad) // block
    L7 = np.uint32(0x7F7F7F7F)
    MUL = np.uint32(0x01010101)

    def kernel(k_ref, out_ref, acc_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_ref[...] = jnp.zeros((hi_bins, 128), jnp.int32)

        pats_hi = (
            jax.lax.broadcasted_iota(jnp.uint32, (hi_bins, _W), 0) * MUL
        )
        pats_lo = jax.lax.broadcasted_iota(jnp.uint32, (128, _W), 0) * MUL

        def zdetect(p, pats, nb):
            # 0x80 exactly at zero bytes; no cross-byte carries:
            # (t & 0x7f..) + 0x7f.. keeps every byte's carry internal
            t = jnp.broadcast_to(p, (nb, _W)) ^ pats
            return ~(((t & L7) + L7) | t | L7)

        if form == "f5":
            # BIN-packed SWAR: each i32 lane holds one element's indicator
            # bytes for FOUR CONSECUTIVE BINS, so pltpu.bitcast expands
            # (nb/4, W) i32 -> (nb, W) i8 = exactly the one-hot, with no
            # cross-element interleave and the same dot shape as shipped.
            pats4_hi = (
                jax.lax.broadcasted_iota(jnp.uint32, (hi_bins // 4, _W), 0)
                * np.uint32(4 * 0x01010101)
                + np.uint32(0x03020100)
            )
            pats4_lo = (
                jax.lax.broadcasted_iota(jnp.uint32, (32, _W), 0)
                * np.uint32(4 * 0x01010101)
                + np.uint32(0x03020100)
            )
            for r in range(rows):
                row = k_ref[r, :].reshape(1, _W)
                bad = row.astype(jnp.uint32) >= jnp.uint32(int(sentinel))
                hi = jnp.where(bad, np.int32(255), row >> 7)
                lo = jnp.where(bad, np.int32(255), row & 127)
                ph = hi.astype(jnp.uint32) * MUL
                plo = lo.astype(jnp.uint32) * MUL
                zh = zdetect(ph, pats4_hi, hi_bins // 4)
                zl = zdetect(plo, pats4_lo, 32)
                oh_hi = pltpu.bitcast(zh, jnp.int8)  # (hi_bins, W)
                oh_lo = pltpu.bitcast(zl, jnp.int8)  # (128, W)
                dot = jax.lax.dot_general(
                    oh_hi, oh_lo, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                acc_ref[...] += dot >> 14

            @pl.when(i == nblocks - 1)
            def _():
                out_ref[...] = acc_ref[...]

            return

        for g in range(rows // 4):
            hs, ls = [], []
            for j in range(4):
                row = k_ref[4 * g + j, :].reshape(1, _W)
                bad = row.astype(jnp.uint32) >= jnp.uint32(int(sentinel))
                hi = jnp.where(bad, np.int32(255), row >> 7)
                lo = jnp.where(bad, np.int32(255), row & 127)
                hs.append(hi.astype(jnp.uint32) << (8 * j))
                ls.append(lo.astype(jnp.uint32) << (8 * j))
            ph = (hs[0] | hs[1]) | (hs[2] | hs[3])
            plo = (ls[0] | ls[1]) | (ls[2] | ls[3])
            zh = zdetect(ph, pats_hi, hi_bins)
            zl = zdetect(plo, pats_lo, 128)
            if form == "f1":
                zh8 = jax.lax.bitcast_convert_type(zh, jnp.int8).reshape(
                    hi_bins, 4 * _W
                )
                zl8 = jax.lax.bitcast_convert_type(zl, jnp.int8).reshape(
                    128, 4 * _W
                )
                dot = jax.lax.dot_general(
                    zh8, zl8, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                acc_ref[...] += dot >> 14
            elif form == "f3":
                zh8 = pltpu.bitcast(zh, jnp.int8)  # (4*hi_bins, W)
                zl8 = pltpu.bitcast(zl, jnp.int8)  # (512, W)
                big = jax.lax.dot_general(
                    zh8, zl8, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )  # (4hb, 512); want sum_j big[4h+j, 4l+j]
                d = jnp.zeros((hi_bins, 128), jnp.int32)
                for j in range(4):
                    d = d + big[j::4, j::4]
                acc_ref[...] += d >> 14
            else:  # f4
                zh8 = pltpu.bitcast(zh, jnp.int8)
                zl8 = pltpu.bitcast(zl, jnp.int8)
                d = jnp.zeros((hi_bins, 128), jnp.int32)
                for j in range(4):
                    d = d + jax.lax.dot_general(
                        zh8[j::4, :], zl8[j::4, :],
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                acc_ref[...] += d >> 14

        @pl.when(i == nblocks - 1)
        def _():
            out_ref[...] = acc_ref[...]

    out = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((rows, _W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hi_bins, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((hi_bins, 128), jnp.int32)],
        interpret=interpret,
    )(k2)
    return out.reshape(-1)


def g2():
    # f1/f3/f4 failed Mosaic lowering (bitwidth-changing bitcast_convert /
    # strided slices unsupported — /tmp/iso_swar.py probes, r3); f5 is the
    # bin-packed form built on the two primitives that DID lower:
    # pltpu.bitcast and int8 dots on its output.
    rng = np.random.default_rng(0)
    for form in ("f5",):
        try:
            # smoke: lowering + exactness at a small size
            ks = jnp.asarray(
                rng.integers(0, 10000, 1 << 16).astype(np.int32)
            )
            ref = histogram_16k_pallas(ks, hi_bins=80)
            got = hist_swar(ks, hi_bins=80, form=form)
            diff = int(_sync_scalar(jnp.sum(jnp.abs(ref - got))))
            if diff != 0:
                print(f"g2 {form}: WRONG (absdiff={diff})", flush=True)
                continue
            k = jnp.asarray(
                rng.integers(0, 10000, 1 << 22).astype(np.int32)
            )
            ref = histogram_16k_pallas(k, hi_bins=80)
            got = hist_swar(k, hi_bins=80, form=form)
            diff = int(_sync_scalar(jnp.sum(jnp.abs(ref - got))))
            t = time_amortized(
                partial(hist_swar, hi_bins=80, form=form), k
            )
            print(
                f"g2 {form}: 2^22 {t*1e3:.3f} ms (absdiff={diff})",
                flush=True,
            )
        except Exception as e:
            msg = str(e).replace("\n", " ")[:300]
            print(f"g2 {form}: FAILED {type(e).__name__}: {msg}",
                  flush=True)
    k = jnp.asarray(rng.integers(0, 10000, 1 << 22).astype(np.int32))
    t = time_amortized(partial(histogram_16k_pallas, hi_bins=80), k)
    print(f"g2 shipped hi80: 2^22 {t*1e3:.3f} ms", flush=True)


# --- g1: scan pieces ----------------------------------------------------


def g1():
    from dwarf_bench_tpu.ops.chunk_stats import chunk_stats_xla
    from dwarf_bench_tpu.ops import scan

    rng = np.random.default_rng(0)
    n = 1 << 24
    x = jnp.asarray(rng.integers(1, 10001, n).astype(np.int32))
    x2 = x.reshape(-1, 128)
    f = jax.jit(lambda a: chunk_stats_xla(a, jnp.int32(5)))
    t = time_amortized(f, x2)
    print(f"g1 chunk_stats_xla 2^24: {t*1e3:.3f} ms", flush=True)
    t = time_amortized(jax.jit(scan.filter_sparse), x)
    print(f"g1 filter_sparse 2^24: {t*1e3:.3f} ms", flush=True)


# --- g3: sort shapes ----------------------------------------------------


def g3():
    rng = np.random.default_rng(0)
    n = 1 << 20
    k16 = jnp.asarray(rng.integers(0, 10000, n).astype(np.uint16))
    id32 = jnp.asarray(np.arange(n, dtype=np.uint32))
    u32 = jnp.asarray(rng.integers(0, 1 << 32, n, dtype=np.uint64)
                      .astype(np.uint32))

    def pair_flat(a, b):
        return jax.lax.sort((a, b), num_keys=1, is_stable=False)

    t = time_amortized(jax.jit(pair_flat), k16, id32)
    print(f"g3 pair (u16,u32) flat 2^20: {t*1e3:.3f} ms", flush=True)

    def one_flat(a):
        return jax.lax.sort((a,), num_keys=1, is_stable=False)

    t = time_amortized(jax.jit(one_flat), u32)
    print(f"g3 1-op u32 flat 2^20: {t*1e3:.3f} ms", flush=True)

    for shape in ((4, 1 << 18),):
        t = time_amortized(jax.jit(one_flat), u32.reshape(shape))
        print(f"g3 1-op u32 {shape}: {t*1e3:.3f} ms", flush=True)

    for shape in ((256, 4096), (512, 2048), (128, 8192)):
        t = time_amortized(
            jax.jit(pair_flat), k16.reshape(shape), id32.reshape(shape)
        )
        print(f"g3 pair (u16,u32) {shape}: {t*1e3:.3f} ms", flush=True)

    n2 = 1 << 21
    k16b = jnp.asarray(rng.integers(0, 10000, n2).astype(np.uint16))
    id32b = jnp.asarray(np.arange(n2, dtype=np.uint32))
    t = time_amortized(
        jax.jit(pair_flat),
        k16b.reshape(512, 4096), id32b.reshape(512, 4096),
    )
    print(f"g3 pair (u16,u32) (512,4096) [2^21]: {t*1e3:.3f} ms",
          flush=True)


# --- g5: expansion pieces ----------------------------------------------


def g5():
    from dwarf_bench_tpu.ops.sort import _expand_runs, histogram_dispatch
    from dwarf_bench_tpu.ops.cumsum_pallas import cumsum_pallas

    rng = np.random.default_rng(0)
    n = 1 << 22
    k = jnp.asarray(rng.integers(0, 10000, n).astype(np.int32))
    counts = histogram_dispatch(k, hi_bins=80)
    counts = jnp.pad(counts, (0, (1 << 14) - counts.shape[0]))
    t = time_amortized(
        jax.jit(partial(_expand_runs, n=n)), counts
    )
    print(f"g5 _expand_runs 2^22: {t*1e3:.3f} ms", flush=True)

    @jax.jit
    def scatter_only(c):
        starts = jnp.cumsum(c) - c
        return jnp.zeros((n,), jnp.int32).at[starts].add(1, mode="drop")

    s = scatter_only(counts)
    t = time_amortized(scatter_only, counts)
    print(f"g5 boundary scatter 2^22: {t*1e3:.3f} ms", flush=True)
    t = time_amortized(jax.jit(cumsum_pallas), s)
    print(f"g5 cumsum_pallas 2^22: {t*1e3:.3f} ms", flush=True)

    @jax.jit
    def scatter_i8(c):
        starts = jnp.cumsum(c) - c
        return jnp.zeros((n,), jnp.int8).at[starts].add(
            jnp.int8(1), mode="drop"
        )

    try:
        s8 = scatter_i8(counts)
        t = time_amortized(scatter_i8, counts)
        print(f"g5 boundary scatter i8 2^22: {t*1e3:.3f} ms", flush=True)
        t = time_amortized(jax.jit(cumsum_pallas), s8)
        print(f"g5 cumsum_pallas(i8 in) 2^22: {t*1e3:.3f} ms", flush=True)
    except Exception as e:
        print(f"g5 i8 path FAILED {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)


# --- g6: join pieces ----------------------------------------------------


def g6():
    from dwarf_bench_tpu.ops import csr_join
    from dwarf_bench_tpu.ops.mxu_gather import gather_16k, gather_16k_rel

    rng = np.random.default_rng(0)
    n = 1 << 20
    A = rng.integers(1, 10000, n, endpoint=True).astype(np.uint32)
    B = rng.integers(1, 10000, n, endpoint=True).astype(np.uint32)
    da, db = jnp.asarray(A), jnp.asarray(B)

    t_build = time_amortized(jax.jit(csr_join.build_dense), da)
    tbl = csr_join.build_dense(da)

    t_probe = time_amortized(
        jax.jit(csr_join.probe_dense), tbl, db
    )
    print(f"g6 build_dense 2^20: {t_build*1e3:.3f} ms; "
          f"probe_dense: {t_probe*1e3:.3f} ms", flush=True)

    ki = jnp.asarray((B - 1).astype(np.int32))
    t = time_amortized(
        jax.jit(partial(gather_16k_rel)), tbl.packed3, tbl.base128, ki
    )
    print(f"g6 gather_16k_rel (shipped): {t*1e3:.3f} ms", flush=True)
    t = time_amortized(
        jax.jit(partial(gather_16k_rel, hi_rows=80)),
        tbl.packed3, tbl.base128, ki,
    )
    print(f"g6 gather_16k_rel hi80: {t*1e3:.3f} ms", flush=True)
    for hr in (128, 80):
        t = time_amortized(
            jax.jit(partial(gather_16k_rel, hi_rows=hr,
                            engine="int8")),
            tbl.packed3, tbl.base128, ki,
        )
        print(f"g6 gather_16k_rel int8-4p hi{hr}: {t*1e3:.3f} ms",
              flush=True)
    t = time_amortized(
        jax.jit(partial(gather_16k, planes=4, plane_dtype="int8")),
        tbl.packed3, ki,
    )
    print(f"g6 gather_16k int8 4-plane: {t*1e3:.3f} ms", flush=True)

    # sort-only inside build (the 1.0 ms bound): u16 key + u32 id
    k16 = jnp.asarray((A - 1).astype(np.uint16))
    id32 = jnp.asarray(np.arange(n, dtype=np.uint32))

    def pair_flat(a, b):
        return jax.lax.sort((a, b), num_keys=1, is_stable=False)

    t = time_amortized(jax.jit(pair_flat), k16, id32)
    print(f"g6 build pair sort alone: {t*1e3:.3f} ms", flush=True)


# --- g7: scan tail pieces at 2^24 ---------------------------------------


def g7():
    from dwarf_bench_tpu.ops.chunk_stats import chunk_stats_xla
    from dwarf_bench_tpu.ops.compact_pallas import (
        compact_mask_pallas,
        emit_prefix_pallas,
    )

    rng = np.random.default_rng(0)
    n = 1 << 24
    nch = n // 128
    x = jnp.asarray(rng.integers(1, 10001, n).astype(np.int32))
    x2 = x.reshape(nch, 128)
    stat, base = chunk_stats_xla(x2, jnp.int32(5))
    cnt = stat >> 9
    vsw = stat & 511
    single = (cnt == 1) & (vsw >= 1) & (vsw <= 255)
    multi = (cnt >= 1) & ~single
    cap_single = max(16384, n >> 10)
    cap_mc = max(512, n >> 15)

    f1 = jax.jit(
        lambda m, a, b: compact_mask_pallas(m, (a, b), capacity=cap_single)
    )
    t = time_amortized(f1, single, base, jnp.int32(5) - vsw)
    print(f"g7 compact singles (2-col, nch=2^17): {t*1e3:.3f} ms",
          flush=True)

    ids = jnp.arange(nch, dtype=jnp.int32)
    f2 = jax.jit(lambda m, a: compact_mask_pallas(m, (a,), capacity=cap_mc))
    t = time_amortized(f2, multi, ids)
    print(f"g7 compact multi ids (1-col): {t*1e3:.3f} ms", flush=True)

    (mids,), nm = f2(multi, ids)
    midsafe = jnp.where(jnp.arange(cap_mc) < nm, mids, 0)
    f3 = jax.jit(lambda xx, mm: xx.reshape(nch, 128)[mm])
    t = time_amortized(f3, x, midsafe)
    print(f"g7 row gather ({cap_mc}, 128): {t*1e3:.3f} ms", flush=True)

    cap_melems = max(4096, n >> 12)
    allpos = jnp.asarray(
        rng.integers(0, 1 << 20, cap_single + cap_melems).astype(np.int32)
    )
    allval = jnp.asarray(
        rng.integers(1, 5, cap_single + cap_melems).astype(np.int32)
    )
    f4 = jax.jit(
        lambda a, b: jax.lax.sort((a, b), num_keys=1, is_stable=False)
    )
    t = time_amortized(f4, allpos, allval)
    print(f"g7 ordering sort ({cap_single + cap_melems}): {t*1e3:.3f} ms",
          flush=True)

    f5 = jax.jit(lambda v: emit_prefix_pallas(v, n))
    t = time_amortized(f5, allval)
    print(f"g7 emit_prefix (cap 2^24): {t*1e3:.3f} ms", flush=True)


# --- g9: G=2^16 group-by weighted-histogram variants ---------------------


def g9():
    from dwarf_bench_tpu.ops.hist_pallas import (
        weighted_histogram_i8_pallas,
        weighted_histogram_i8_swar_pallas,
    )

    rng = np.random.default_rng(0)
    n = 1 << 20
    k = jnp.asarray(rng.integers(0, 1 << 16, n).astype(np.int32))
    v = jnp.asarray(
        rng.integers(1, 10000, n, endpoint=True).astype(np.int32)
    )
    a = weighted_histogram_i8_pallas(k, v, hi_bins=512)
    b = weighted_histogram_i8_swar_pallas(k, v, hi_bins=512)
    diff = int(_sync_scalar(jnp.sum(jnp.abs(a - b))))
    t0 = time_amortized(
        jax.jit(partial(weighted_histogram_i8_pallas, hi_bins=512)), k, v
    )
    t1 = time_amortized(
        jax.jit(partial(weighted_histogram_i8_swar_pallas, hi_bins=512)),
        k, v,
    )
    print(f"g9 weighted i8 hi512: {t0*1e3:.3f} ms; SWAR: {t1*1e3:.3f} ms "
          f"(absdiff={diff})", flush=True)


# --- g10: fused-scan piece timings (the g1 regression hunt) --------------


def g10():
    from dwarf_bench_tpu.ops import scan
    from dwarf_bench_tpu.ops.chunk_stats import chunk_stats_xla
    from dwarf_bench_tpu.ops.chunk_stats_pallas import (
        chunk_stats_fused,
        chunk_stats_pallas,
    )
    from dwarf_bench_tpu.ops.scan_tail_pallas import scan_tail_compact

    rng = np.random.default_rng(0)
    n = 1 << 24
    x = jnp.asarray(rng.integers(1, 10001, n).astype(np.int32))
    x2 = x.reshape(-1, 128)
    thr = jnp.int32(5)
    for name, fn in (
        ("fused", chunk_stats_fused),
        ("pallas_r2", chunk_stats_pallas),
        ("xla", chunk_stats_xla),
    ):
        t = time_amortized(jax.jit(fn), x2, thr)
        print(f"g10 stats {name} 2^24: {t*1e3:.3f} ms", flush=True)
    stat, base = chunk_stats_xla(x2, thr)
    cap_s, cap_m = max(16384, n >> 10), max(512, n >> 15)
    f = jax.jit(partial(scan_tail_compact, cap_single=cap_s,
                        cap_mc=cap_m))
    t = time_amortized(f, stat, base, thr)
    print(f"g10 scan_tail_compact 2^24: {t*1e3:.3f} ms", flush=True)
    t = time_amortized(
        jax.jit(partial(scan.filter_sparse, stats_pallas=False)), x
    )
    print(f"g10 filter_sparse OLD path 2^24: {t*1e3:.3f} ms", flush=True)


# --- g12: the round-3 scan combination ----------------------------------


def g12():
    from dwarf_bench_tpu.ops import scan
    from dwarf_bench_tpu.ops.chunk_stats import chunk_stats_xla
    from dwarf_bench_tpu.ops.scan_tail_pallas import scan_tail_streams

    rng = np.random.default_rng(0)
    n = 1 << 24
    x = jnp.asarray(rng.integers(1, 10001, n).astype(np.int32))
    stat, base = chunk_stats_xla(x.reshape(-1, 128), jnp.int32(5))
    cap_s, cap_m = max(16384, n >> 10), max(512, n >> 15)
    f = jax.jit(partial(scan_tail_streams, cap_single=cap_s,
                        cap_mc=cap_m))
    t = time_amortized(f, stat, base, jnp.int32(5))
    print(f"g12 scan_tail_streams 2^24: {t*1e3:.3f} ms", flush=True)
    t = time_amortized(jax.jit(scan.filter_sparse), x)
    print(f"g12 filter_sparse NEW (xla stats + streams) 2^24: "
          f"{t*1e3:.3f} ms", flush=True)
    # correctness on device: count + checksum vs old path
    o1, c1 = scan.filter_sparse(x)
    o2, c2 = scan.filter_sparse(x, stats_pallas=False)
    c1, c2 = int(_sync_scalar(c1)), int(_sync_scalar(c2))
    s1 = int(_sync_scalar(jnp.sum(o1[:c1].astype(jnp.uint32))))
    s2 = int(_sync_scalar(jnp.sum(o2[:c2].astype(jnp.uint32))))
    print(f"g12 device check: counts {c1}=={c2}, sums {s1}=={s2}",
          flush=True)


# --- g13: G=64 group-by dot-count reduction ------------------------------


@partial(jax.jit, static_argnames=("num_groups", "rows", "w", "stack",
                                   "interpret"))
def groupby_small_stacked(k, v, num_groups, rows=32, w=4096, stack=4,
                          interpret=False):
    """groupby_small_pallas semantics with ``stack`` row-iterations fused
    into ONE dot: A stacks [oh_a·vlo ; oh_a·vhi] for ``stack`` rows
    (2·stack bands of ga sublanes), B stacks oh_b for the same rows; the
    (2·stack·ga, stack·gb) result's useful blocks are the (lo, hi) plane
    diagonals, extracted with static slices. Cuts per-block dot issues
    from 2·rows to rows/stack (64 -> 8 at rows=32, stack=4) at the price
    of stack× wasted MACs — the MXU is idle in this kernel, the dots'
    ISSUE overhead is the suspect (r2c's concat experiment conflated W
    with the dot count)."""
    from dwarf_bench_tpu.ops.groupby_pallas import _digit_split

    ga, gb = _digit_split(num_groups)
    shift = int(np.log2(gb))
    sentinel = np.uint32(ga << shift)
    assert 127 * rows * w < (1 << 24), (rows, w)
    assert rows % stack == 0
    n = k.shape[0]
    block = rows * w
    pad = (-n) % block
    kp = jnp.pad(k.astype(jnp.uint32), (0, pad), constant_values=sentinel)
    vp = jnp.pad(v.astype(jnp.int32), (0, pad))
    k2 = kp.astype(jnp.int32).reshape(-1, w)
    v2 = vp.reshape(-1, w)
    nblocks = (n + pad) // block

    def kernel(k_ref, v_ref, out_ref, acc_int):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_int[...] = jnp.zeros((ga, gb), jnp.int32)

        iota_a = jax.lax.broadcasted_iota(jnp.int32, (ga, w), 0)
        iota_b = jax.lax.broadcasted_iota(jnp.int32, (gb, w), 0)
        dims = (((1,), (1,)), ((), ()))
        blk_lo = jnp.zeros((ga, gb), jnp.float32)
        blk_hi = jnp.zeros((ga, gb), jnp.float32)
        for g in range(rows // stack):
            a_bands = []
            b_bands = []
            for j in range(stack):
                r = g * stack + j
                row = k_ref[r, :].reshape(1, w)
                val = v_ref[r, :].reshape(1, w)
                bad = row.astype(jnp.uint32) >= jnp.uint32(int(sentinel))
                hi = jnp.where(bad, np.int32(ga), row >> shift)
                lo = row & (gb - 1)
                oh_a = (jnp.broadcast_to(hi, (ga, w)) == iota_a).astype(
                    jnp.bfloat16
                )
                oh_b = (jnp.broadcast_to(lo, (gb, w)) == iota_b).astype(
                    jnp.bfloat16
                )
                vlo = jnp.broadcast_to(
                    (val & 0x7F).astype(jnp.bfloat16), (ga, w))
                vhi = jnp.broadcast_to(
                    ((val >> 7) & 0x7F).astype(jnp.bfloat16), (ga, w))
                a_bands.append(oh_a * vlo)
                a_bands.append(oh_a * vhi)
                b_bands.append(oh_b)
            A = jnp.concatenate(a_bands, axis=0)   # (2*stack*ga, w)
            B = jnp.concatenate(b_bands, axis=0)   # (stack*gb, w)
            big = jax.lax.dot_general(
                A, B, dimension_numbers=dims,
                preferred_element_type=jnp.float32,
            )  # (2*stack*ga, stack*gb); useful: plane-diagonal blocks
            for j in range(stack):
                blk_lo = blk_lo + big[
                    2 * j * ga:(2 * j + 1) * ga, j * gb:(j + 1) * gb]
                blk_hi = blk_hi + big[
                    (2 * j + 1) * ga:(2 * j + 2) * ga,
                    j * gb:(j + 1) * gb]
        acc_int[...] += blk_lo.astype(jnp.int32) + (
            blk_hi.astype(jnp.int32) << 7
        )

        @pl.when(i == nblocks - 1)
        def _():
            out_ref[...] = acc_int[...]

    out = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((rows, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ga, gb), jnp.int32),
        scratch_shapes=[pltpu.VMEM((ga, gb), jnp.int32)],
        interpret=interpret,
    )(k2, v2)
    return out.reshape(-1)[:num_groups].astype(jnp.uint32)


def g13():
    from dwarf_bench_tpu.ops.groupby_pallas import groupby_small_pallas

    rng = np.random.default_rng(0)
    n, G = 1 << 22, 64
    k = jnp.asarray(rng.integers(0, G, n).astype(np.uint32))
    v = jnp.asarray(
        rng.integers(1, 10000, n, endpoint=True).astype(np.uint32))
    ref = groupby_small_pallas(k, v, G)
    t0 = time_amortized(
        jax.jit(partial(groupby_small_pallas, num_groups=G)), k, v)
    print(f"g13 shipped G=64: {t0*1e3:.3f} ms", flush=True)
    for stack in (2, 4, 8):
        try:
            got = groupby_small_stacked(k, v, G, stack=stack)
            diff = int(_sync_scalar(jnp.sum(jnp.abs(
                ref.astype(jnp.int32) - got.astype(jnp.int32)))))
            t = time_amortized(
                jax.jit(partial(groupby_small_stacked, num_groups=G,
                                stack=stack)), k, v)
            print(f"g13 stacked x{stack}: {t*1e3:.3f} ms (absdiff={diff})",
                  flush=True)
        except Exception as e:
            print(f"g13 stacked x{stack}: FAILED {type(e).__name__}: "
                  f"{str(e)[:150]}", flush=True)


def main():
    from dwarf_bench_tpu.common.device import (
        enable_persistent_compile_cache,
    )

    enable_persistent_compile_cache()
    groups = sys.argv[1:] or ["g2"]
    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", flush=True)
    for g in groups:
        globals()[g]()


if __name__ == "__main__":
    main()
