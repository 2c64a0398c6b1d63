"""Fused Pallas 16384-bin histogram (the counting-sort / dense-join engine).

The XLA formulation (ops/sort.histogram_16k) materializes two one-hot
matrices per tile and a (tiles, 128, 128) partials array in HBM. This
kernel fuses everything: per block the hi/lo one-hots are built in VMEM as
(128, W) lane-major compares — both operands of the count matmul contract
over LANES (dot_general ((1,), (1,)) is A @ B^T, which the MXU consumes
natively), so no transposes or relayouts are needed anywhere — and a single
(128, 128) f32 accumulator in VMEM scratch integrates across the
sequential grid. HBM traffic = read the keys once + write 64 KB.

Exactness: the plain histogram runs int8 one-hots through the int8 MXU
path straight into an int32 accumulator (no floating-point bound at all);
the weighted variant uses bf16 7-bit value planes with per-block-exact f32
partials folded to int32.

Semantics match histogram_16k: bin b counts keys whose uint32 value is
b (< 2^14); keys >= 2^14 as uint32 (negatives, EMPTY-style sentinels)
count nowhere. Padding rows are masked by global element index.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 8
_W = 2048  # lanes per sublane row per block


_HIST_ROWS = 8  # block sublane rows (overridable per call — see below)


@partial(jax.jit, static_argnames=("hi_bins", "rows", "interpret"))
def histogram_16k_pallas(
    k: jnp.ndarray,
    hi_bins: int = 128,
    rows: int = _HIST_ROWS,
    interpret: bool = False,
):
    """(hi_bins * 128,) int32 histogram of int32/uint32 keys; out-of-range
    keys (uint32 value >= hi_bins * 128) are ignored. Drop-in for
    sort.histogram_16k at hi_bins=128.

    ``hi_bins`` sizes the hi-digit one-hot: the kernel is VPU-bound on
    one-hot construction (hi_bins + 128 compares/element — int16/int8/bf16
    compares do NOT lower in Mosaic, measure_r3.py d4), so narrow key
    spans pay proportionally less (hi_bins=80 for spans <= 10240, e.g. the
    benchmark's [1, 10000] columns: 0.61 vs 0.77 ms at 2^22,
    measure_r3b.py e2). Padding rides the ``hi_bins << 7`` sentinel
    (out-of-range by construction) instead of per-element index masks."""
    assert hi_bins % 8 == 0 and hi_bins <= 128
    n = k.shape[0]
    block = rows * _W
    pad = (-n) % block
    sentinel = np.int32(hi_bins << 7)
    kp = jnp.pad(k.astype(jnp.int32), (0, pad), constant_values=sentinel)
    k2 = kp.reshape(-1, _W)
    nblocks = (n + pad) // block

    def kernel(k_ref, out_ref, acc_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_ref[...] = jnp.zeros((hi_bins, 128), jnp.int32)

        iota_hi = jax.lax.broadcasted_iota(jnp.int32, (hi_bins, _W), 0)
        iota_lo = jax.lax.broadcasted_iota(jnp.int32, (128, _W), 0)
        for r in range(rows):
            row = k_ref[r, :].reshape(1, _W)
            # uint32 >= hi_bins*128 (negatives, sentinels, padding) routes
            # hi past every iota row -> counts nowhere
            bad = row.astype(jnp.uint32) >= jnp.uint32(int(sentinel))
            hi = jnp.where(bad, np.int32(hi_bins), row >> 7)
            lo = row & 127
            # int8 one-hots: the int8 MXU path is ~2x bf16 and accumulates
            # straight into int32 (no f32 exactness bound at all)
            oh_hi = (jnp.broadcast_to(hi, (hi_bins, _W)) == iota_hi).astype(
                jnp.int8
            )
            oh_lo = (jnp.broadcast_to(lo, (128, _W)) == iota_lo).astype(
                jnp.int8
            )
            acc_ref[...] += jax.lax.dot_general(
                oh_hi,
                oh_lo,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )

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


@partial(jax.jit,
         static_argnames=("hi_bins", "rows", "fast_zdetect", "stack",
                          "interpret"))
def histogram_16k_swar_pallas(
    k: jnp.ndarray,
    hi_bins: int = 128,
    rows: int = 32,  # device A/B at 2^22/hi80: 0.333 ms vs 0.341 (16)
    fast_zdetect: bool = True,
    stack: int = 1,
    interpret: bool = False,  # and 0.358 (8) — fewer grid steps win
):
    """histogram_16k semantics with SWAR one-hot construction (round 3).

    The one-hot build is the VPU floor of every one-hot-matmul engine, and
    sub-32-bit vector compares don't lower in Mosaic (round-2 finding).
    This kernel sidesteps the compare ISA entirely: each uint32 lane holds
    one element's indicator bytes for FOUR CONSECUTIVE BINS — patterns are
    ``4q·0x01010101 + 0x03020100`` against the digit replicated into all
    4 bytes (``digit·0x01010101``) — and a per-byte zero detector writes
    0x80 at matches. ``pltpu.bitcast`` then expands (nb/4, W) i32 to
    (nb, W) int8 along sublanes — on the packed int8 tiling that is a
    pure reinterpretation, and the result IS the one-hot (rows = bins in
    order, no cross-element interleave), so the count matmul is shape-
    identical to ``histogram_16k_pallas``'s. Matches contribute
    (-128)·(-128) = 16384, so per-row dots fold in as ``dot >> 14``
    (per-block cell sums ≤ 16384·rows·W < 2^31).

    ``fast_zdetect`` (round 4) drops the generic 6-op byte detector
    (``~(((t & 0x7f..) + 0x7f..) | t | 0x7f..)``) to THREE ops: digits and
    patterns are 7-bit, so every byte of ``t = d ^ p`` is ≤ 0x7F, every
    byte of ``~t = d ^ ~p`` is ≥ 0x80, and ``(~t) - 0x7F`` has no
    cross-byte borrows with bit 7 set exactly at ``t = 0`` — i.e.
    ``z = ((rep ^ ~pats) - 0x7F7F7F7F) & 0x80808080`` with the pattern
    inversion precomputed (xor+sub+and per 4 bins, the "2-for-1" leverage
    item of docs/performance.md cashed in). The no-borrow precondition
    needs every compared byte ≤ 0x7F, so out-of-range keys route to
    digit 127 on the HI side (fine while hi_bins ≤ 120: patterns stop at
    hi_bins-1) and the LO side is left unmasked — a bad row's lo byte may
    match, but its hi row never does, so the count product is 0. At
    hi_bins = 128 byte 127 is a real bin, so a lane-wide kill mask
    replaces the sentinel (4th op on the hi side only).

    Sentinel (generic path): out-of-range keys (uint32 ≥ hi_bins·128,
    incl. padding) take digit byte 255, which never equals a bin pattern
    ≤ 127.

    ``stack`` (round 4): per-row (nb, W)·(128, W) dots are MXU
    ISSUE-bound, not stream-bound — M, N ≤ 128 use a sliver of the
    systolic array and K = W streams in ~W/128 beats, so the ~2048
    per-row dots' fill/drain dominates (the h1 experiment: the 3-op
    zdetect moved the kernel only 0.56 → 0.39 ms because the dots, not
    the VPU, held the floor). Stacking concatenates ``stack`` rows'
    DIGIT strips along lanes (ONE copy per element row) before the
    zdetect, so one (nb, stack·W) dot serves ``stack`` rows at 1/stack
    the issue count; the accumulation semantics are identical because
    the contraction is a sum over lanes either way."""
    assert hi_bins % 8 == 0 and hi_bins <= 128
    assert rows % stack == 0
    # per-DOT cell sums are pre-shift 16384·(co-matching lanes ≤ stack·W):
    # must stay < 2^31 even when a whole strip hits one (hi, lo) cell
    assert (16384 * stack * _W) < (1 << 31), stack
    n = k.shape[0]
    block = rows * _W
    pad = (-n) % block
    sentinel = np.int32(hi_bins << 7)
    kp = jnp.pad(k.astype(jnp.int32), (0, pad), constant_values=sentinel)
    k2 = kp.reshape(-1, _W)
    nblocks = (n + pad) // block
    L7 = np.uint32(0x7F7F7F7F)
    L8 = np.uint32(0x80808080)
    MUL = np.uint32(0x01010101)
    hi_needs_mask = hi_bins > 120  # byte 127 unusable as a hi sentinel

    L = _W * stack  # lanes per dot (stacked strip width)

    def kernel(k_ref, out_ref, acc_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_ref[...] = jnp.zeros((hi_bins, 128), jnp.int32)

        pats_hi = (
            jax.lax.broadcasted_iota(jnp.uint32, (hi_bins // 4, L), 0)
            * np.uint32(4 * 0x01010101)
            + np.uint32(0x03020100)
        )
        pats_lo = (
            jax.lax.broadcasted_iota(jnp.uint32, (32, L), 0)
            * np.uint32(4 * 0x01010101)
            + np.uint32(0x03020100)
        )
        if fast_zdetect:
            pinv_hi, pinv_lo = ~pats_hi, ~pats_lo

        def zdetect(p, pats, nb):
            t = jnp.broadcast_to(p, (nb, L)) ^ pats
            return ~(((t & L7) + L7) | t | L7)

        def zdetect3(p, pinv, nb):
            # 3-op form (see docstring): bytes of p and ~pinv must be 7-bit
            return (jnp.broadcast_to(p, (nb, L)) ^ pinv) - L7 & L8

        def cat(parts):
            return parts[0] if stack == 1 else jnp.concatenate(
                parts, axis=1
            )

        for r0 in range(0, rows, stack):
            his, los, keeps = [], [], []
            for r in range(r0, r0 + stack):
                row = k_ref[r, :].reshape(1, _W)
                bad = row.astype(jnp.uint32) >= jnp.uint32(int(sentinel))
                if fast_zdetect:
                    if hi_needs_mask:
                        his.append(jnp.where(bad, np.int32(0), row >> 7))
                        keeps.append(jnp.where(bad, np.uint32(0),
                                               np.uint32(0xFFFFFFFF)))
                    else:
                        his.append(jnp.where(bad, np.int32(127),
                                             row >> 7))
                    los.append(row & 127)  # bad killed by the hi side
                else:
                    his.append(jnp.where(bad, np.int32(255), row >> 7))
                    los.append(jnp.where(bad, np.int32(255), row & 127))
            hiw = cat(his).astype(jnp.uint32) * MUL
            low = cat(los).astype(jnp.uint32) * MUL
            if fast_zdetect:
                zh = zdetect3(hiw, pinv_hi, hi_bins // 4)
                if hi_needs_mask:
                    zh = zh & jnp.broadcast_to(cat(keeps),
                                               (hi_bins // 4, L))
                zl = zdetect3(low, pinv_lo, 32)
            else:
                zh = zdetect(hiw, pats_hi, hi_bins // 4)
                zl = zdetect(low, pats_lo, 32)
            oh_hi = pltpu.bitcast(zh, jnp.int8)  # (hi_bins, L)
            oh_lo = pltpu.bitcast(zl, jnp.int8)  # (128, L)
            acc_ref[...] += jax.lax.dot_general(
                oh_hi, oh_lo, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ) >> 14

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


@partial(jax.jit, static_argnames=("hi_bins", "interpret"))
def weighted_histogram_pallas(
    k: jnp.ndarray,
    v: jnp.ndarray,
    hi_bins: int = 128,
    interpret: bool = False,
):
    """(hi_bins * 128,) int32 per-bin sums of ``v`` — the MXU group-by
    engine for up to hi_bins * 128 groups (hi_bins <= 512 -> 2^16 groups,
    the BASELINE.json GroupBy config). PRECONDITION: 0 <= v < 2^14 (the
    benchmark's uniform [1, 10000] value columns): v splits into two 7-bit
    planes, each exact in bf16; Y_plane = onehot_hi * v_plane rides the
    same lanes-contraction matmul as the histogram
    (sums[h, l] = \u03a3_t v_plane[t]\u00b7oh_hi\u00b7oh_lo).

    Exactness: per-BLOCK f32 plane partials are <= 127 * 16384 < 2^21
    (exact); each block folds lo + (hi << 7) <= 2^28 into an int32
    accumulator, which wraps mod 2^32 exactly like the reference's uint32
    aggregation (groupby/groupby.cpp:8-19). Out-of-range keys (uint32 >=
    hi_bins * 128) and padding contribute nothing.
    """
    assert hi_bins % 8 == 0 and hi_bins <= 512
    n = k.shape[0]
    block = _ROWS * _W
    pad = (-n) % block
    kp = jnp.pad(k.astype(jnp.int32), (0, pad))
    vp = jnp.pad(v.astype(jnp.int32), (0, pad))
    k2 = kp.reshape(-1, _W)
    v2 = vp.reshape(-1, _W)
    nblocks = (n + pad) // block
    n_arr = jnp.full((1,), n, jnp.int32)

    def kernel(n_ref, k_ref, v_ref, out_ref, acc_int):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_int[...] = jnp.zeros((hi_bins, 128), jnp.int32)

        blk_lo = jnp.zeros((hi_bins, 128), jnp.float32)
        blk_hi = jnp.zeros((hi_bins, 128), jnp.float32)
        base = i * block
        nn = n_ref[0]
        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (hi_bins, _W), 0)
        for r in range(_ROWS):
            row = k_ref[r, :].reshape(1, _W)
            val = v_ref[r, :].reshape(1, _W)
            idx = base + r * _W + jax.lax.broadcasted_iota(
                jnp.int32, (1, _W), 1
            )
            hi = jnp.where(idx < nn, (row >> 7) & 0x01FFFFFF, hi_bins)
            hi = jnp.where(row < 0, hi_bins, hi)
            lo = row & 127
            oh_hi = (jnp.broadcast_to(hi, (hi_bins, _W)) == sub_iota).astype(
                jnp.bfloat16
            )
            oh_lo = (
                jnp.broadcast_to(lo, (128, _W))
                == jax.lax.broadcasted_iota(jnp.int32, (128, _W), 0)
            ).astype(jnp.bfloat16)
            vlo = jnp.broadcast_to(
                (val & 0x7F).astype(jnp.bfloat16), (hi_bins, _W)
            )
            vhi = jnp.broadcast_to(
                ((val >> 7) & 0x7F).astype(jnp.bfloat16), (hi_bins, _W)
            )
            dims = (((1,), (1,)), ((), ()))
            blk_lo = blk_lo + jax.lax.dot_general(
                oh_hi * vlo, oh_lo, dimension_numbers=dims,
                preferred_element_type=jnp.float32,
            )
            blk_hi = blk_hi + jax.lax.dot_general(
                oh_hi * vhi, oh_lo, dimension_numbers=dims,
                preferred_element_type=jnp.float32,
            )

        # per-block fold: exact f32 partials (< 2^21) -> int32 accumulator
        # (wraps mod 2^32 like the reference's uint32 aggregation)
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
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_ROWS, _W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, _W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hi_bins, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((hi_bins, 128), jnp.int32)],
        interpret=interpret,
    )(n_arr, k2, v2)
    return out.reshape(-1)


@partial(jax.jit, static_argnames=("hi_bins", "interpret"))
def weighted_histogram_i8_pallas(
    k: jnp.ndarray,
    v: jnp.ndarray,
    hi_bins: int = 512,
    interpret: bool = False,
):
    """``weighted_histogram_pallas`` semantics on the int8 MXU path: the
    bf16 variant is MXU-bound at hi_bins=512 (n·hi_bins·128·2 plane MACs ≈
    1.39 ms at 2^20 — measured 1.44 total), so int8 dots halve the MXU and
    the kernel becomes VPU-bound at 0.87 ms (1.65x, measure_r3.py d6).

    Layout rules learned the hard way (rounds 1-2): the hi one-hot is a
    pure int8 one-hot via the i1→int8 astype (the only sub-32-bit mask op
    Mosaic relays); the value planes mask the 128-row LO side — 4x fewer
    masked rows than the hi side — through int32 multiply + astype
    (``jnp.where`` with int8/bf16 operands hits "Invalid relayout ...
    replicated in destination"). Products are ≤ 127 so int8 dots
    accumulate exactly in int32, which wraps mod 2^32 like the reference's
    uint32 aggregation (groupby/groupby.cpp:8-19). Out-of-range keys
    (uint32 ≥ hi_bins·128, incl. the padding sentinel) count nowhere."""
    assert hi_bins % 8 == 0 and hi_bins <= 512
    n = k.shape[0]
    block = _ROWS * _W
    pad = (-n) % block
    sentinel = np.int32(hi_bins << 7)
    kp = jnp.pad(k.astype(jnp.int32), (0, pad), constant_values=sentinel)
    vp = jnp.pad(v.astype(jnp.int32), (0, pad))
    k2 = kp.reshape(-1, _W)
    v2 = vp.reshape(-1, _W)
    nblocks = (n + pad) // block

    def kernel(k_ref, v_ref, out_ref, acc_lo, acc_hi):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_lo[...] = jnp.zeros((hi_bins, 128), jnp.int32)
            acc_hi[...] = jnp.zeros((hi_bins, 128), jnp.int32)

        iota_hi = jax.lax.broadcasted_iota(jnp.int32, (hi_bins, _W), 0)
        iota_lo = jax.lax.broadcasted_iota(jnp.int32, (128, _W), 0)
        dims = (((1,), (1,)), ((), ()))
        for r in range(_ROWS):
            row = k_ref[r, :].reshape(1, _W)
            val = v_ref[r, :].reshape(1, _W)
            bad = row.astype(jnp.uint32) >= jnp.uint32(int(sentinel))
            hi = jnp.where(bad, np.int32(hi_bins), row >> 7)
            lo = row & 127
            oh_hi = (jnp.broadcast_to(hi, (hi_bins, _W)) == iota_hi).astype(
                jnp.int8
            )
            oh_lo32 = (
                jnp.broadcast_to(lo, (128, _W)) == iota_lo
            ).astype(jnp.int32)
            blo = (oh_lo32 * jnp.broadcast_to(val & 0x7F, (128, _W))).astype(
                jnp.int8
            )
            bhi = (
                oh_lo32 * jnp.broadcast_to((val >> 7) & 0x7F, (128, _W))
            ).astype(jnp.int8)
            acc_lo[...] += jax.lax.dot_general(
                oh_hi, blo, dimension_numbers=dims,
                preferred_element_type=jnp.int32,
            )
            acc_hi[...] += jax.lax.dot_general(
                oh_hi, bhi, dimension_numbers=dims,
                preferred_element_type=jnp.int32,
            )

        @pl.when(i == nblocks - 1)
        def _():
            out_ref[...] = acc_lo[...] + (acc_hi[...] << 7)

    out = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((_ROWS, _W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, _W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hi_bins, 128), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((hi_bins, 128), jnp.int32),
            pltpu.VMEM((hi_bins, 128), jnp.int32),
        ],
        interpret=interpret,
    )(k2, v2)
    return out.reshape(-1)


def weighted_histogram_16k_pallas(k, v, interpret: bool = False):
    """Back-compat alias: 2^14 bins."""
    return weighted_histogram_pallas(k, v, hi_bins=128, interpret=interpret)


@partial(jax.jit, static_argnames=("hi_bins", "interpret"))
def weighted_histogram_i8_swar_pallas(
    k: jnp.ndarray,
    v: jnp.ndarray,
    hi_bins: int = 512,
    interpret: bool = False,
):
    """``weighted_histogram_i8_pallas`` with SWAR hi-side one-hots.

    The G=2^16 group-by is MXU-bound on its n·G plane MACs, but the
    hi-digit one-hot construction (hi_bins compare+cast rows per element
    row) is the VPU half of the kernel. Here the hi one-hot is built the
    SWAR way (see histogram_16k_swar_pallas): bins are packed 4 per
    uint32 lane and ``pltpu.bitcast`` expands to int8 rows. A 9-bit hi
    digit does not fit the byte patterns, so hi splits into
    ``hi_bins // 256`` groups of ≤ 256 byte-coded bins, each with a
    packed kill-mask for rows outside the group (and for out-of-range/
    padding keys). Matches carry 0x80 = -128, so each group dot folds in
    as ``acc -= dot >> 7`` (products are -128·vplane; the shift is exact
    on the negated multiple of 128).

    Semantics identical to weighted_histogram_i8_pallas: (hi_bins·128,)
    int32 per-bin sums of ``v`` (< 2^14, two 7-bit planes), out-of-range
    keys count nowhere, int32 wrap matches the reference's uint32
    aggregation (groupby/groupby.cpp:8-19)."""
    assert hi_bins % 256 == 0 and hi_bins <= 512
    ngroups = hi_bins // 256
    n = k.shape[0]
    block = _ROWS * _W
    pad = (-n) % block
    sentinel = np.int32(hi_bins << 7)
    kp = jnp.pad(k.astype(jnp.int32), (0, pad), constant_values=sentinel)
    vp = jnp.pad(v.astype(jnp.int32), (0, pad))
    k2 = kp.reshape(-1, _W)
    v2 = vp.reshape(-1, _W)
    nblocks = (n + pad) // block
    L7 = np.uint32(0x7F7F7F7F)
    MUL = np.uint32(0x01010101)

    def kernel(k_ref, v_ref, out_ref, acc_lo, acc_hi):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_lo[...] = jnp.zeros((hi_bins, 128), jnp.int32)
            acc_hi[...] = jnp.zeros((hi_bins, 128), jnp.int32)

        pats = (
            jax.lax.broadcasted_iota(jnp.uint32, (64, _W), 0)
            * np.uint32(4 * 0x01010101)
            + np.uint32(0x03020100)
        )
        iota_lo = jax.lax.broadcasted_iota(jnp.int32, (128, _W), 0)
        dims = (((1,), (1,)), ((), ()))
        for r in range(_ROWS):
            row = k_ref[r, :].reshape(1, _W)
            val = v_ref[r, :].reshape(1, _W)
            bad = row.astype(jnp.uint32) >= jnp.uint32(int(sentinel))
            hi = jnp.where(bad, np.int32(hi_bins), row >> 7)
            lo = row & 127
            hb = (hi & 255).astype(jnp.uint32) * MUL
            grp = hi >> 8
            oh_lo32 = (jnp.broadcast_to(lo, (128, _W)) == iota_lo).astype(
                jnp.int32
            )
            blo = (oh_lo32 * jnp.broadcast_to(val & 0x7F, (128, _W))).astype(
                jnp.int8
            )
            bhi = (
                oh_lo32 * jnp.broadcast_to((val >> 7) & 0x7F, (128, _W))
            ).astype(jnp.int8)
            for g in range(ngroups):
                # kill whole lanes whose element is outside group g (bad
                # keys have grp = hi_bins >> 8 >= ngroups: never matches)
                keep = jnp.where(
                    grp == g, np.uint32(0xFFFFFFFF), np.uint32(0)
                )
                t = jnp.broadcast_to(hb, (64, _W)) ^ pats
                z = ~(((t & L7) + L7) | t | L7) & jnp.broadcast_to(
                    keep, (64, _W)
                )
                oh_g = pltpu.bitcast(z, jnp.int8)  # (256, W) of -128/0
                dlo = jax.lax.dot_general(
                    oh_g, blo, dimension_numbers=dims,
                    preferred_element_type=jnp.int32,
                )
                dhi = jax.lax.dot_general(
                    oh_g, bhi, dimension_numbers=dims,
                    preferred_element_type=jnp.int32,
                )
                acc_lo[g * 256:(g + 1) * 256, :] += (-dlo) >> 7
                acc_hi[g * 256:(g + 1) * 256, :] += (-dhi) >> 7

        @pl.when(i == nblocks - 1)
        def _():
            out_ref[...] = acc_lo[...] + (acc_hi[...] << 7)

    out = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((_ROWS, _W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, _W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hi_bins, 128), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((hi_bins, 128), jnp.int32),
            pltpu.VMEM((hi_bins, 128), jnp.int32),
        ],
        interpret=interpret,
    )(k2, v2)
    return out.reshape(-1)
