"""Fused Pallas group-by for small group counts (balanced digit split).

The reference's GroupBy aggregates with a CAS+fetch_add hash table over
``groups_count`` dense keys (groupby/groupby.cpp:58-93); the benchmark and
library configs use tiny group counts (20-64, bench.cpp:80). The round-1
engine (ops/groupby.groupby_sum_matmul_bf16) builds a (T, G) one-hot per
tile — G VPU compares per element — and is VPU-bound on one-hot
construction, not on the MXU.

This kernel splits the key into two BALANCED digits, ``hi = k >> log2(gb)``
and ``lo = k & (gb - 1)``, and accumulates ``sums[hi, lo]`` — the same
lanes-contraction weighted-histogram formulation as
ops/hist_pallas.weighted_histogram_pallas, but with digit widths chosen per
G instead of the fixed (hi_bins, 128) split. One-hot construction then
costs ``ga + gb ≈ 2·sqrt(G)`` compares per element instead of G (for G=64:
16 vs 64), and the per-row value planes multiply only the ga-row one-hot.
Output cell (hi, lo) is exactly group ``hi * gb + lo``, so the dense output
is ``acc.reshape(-1)[:G]`` with no remapping.

Exactness: values are split into two 7-bit bf16 planes (exact for
v < 2^14 — the benchmark's uniform [1, 10000] columns); per-block f32
plane partials are ≤ 127 · 16384 < 2^21 (exact); each block folds
``lo + (hi << 7)`` into an int32 accumulator, which wraps mod 2^32 exactly
like the reference's uint32 aggregation (groupby/groupby.cpp:8-19).
Out-of-range keys (uint32 ≥ G) and padding rows contribute nothing.
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


def _digit_split(num_groups: int) -> tuple[int, int]:
    """(ga, gb): gb = power-of-two lane digit in [8, 128], ga = sublane
    digit rounded to a multiple of 8, ga * gb >= num_groups, ga + gb
    (the per-element VPU compare cost) minimized."""
    assert 1 <= num_groups <= (1 << 14)
    best = None
    gb = 8
    while gb <= 128:
        ga = max(8, -(-num_groups // gb))
        ga = (ga + 7) // 8 * 8
        if ga <= 1024 and (best is None or ga + gb < best[0] + best[1]):
            best = (ga, gb)
        gb *= 2
    return best


@partial(jax.jit, static_argnames=("num_groups", "interpret"))
def groupby_small_pallas_f32(
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_groups: int,
    interpret: bool = False,
):
    """Single-f32-plane variant of ``groupby_small_pallas`` — MEASURED AND
    REJECTED (0.327 vs 0.280 ms at G=64, 2^22: the HIGHEST-precision dot
    costs more MXU passes than the saved VPU value plane, measure_r3.py
    d2). Kept as the documented i1-relayout-free f32 select pattern.

    Instead of two 7-bit bf16 value planes (two masked (ga, W) multiplies
    + two dots per row), the value rides ONE f32 select into the hi
    one-hot and ONE dot_general at Precision.HIGHEST per 1024-lane
    half-row.

    Exactness: products are onehot * v with v < 2^14 (exact under HIGHEST's
    bf16x3 operand split, 24 mantissa bits); each half-row dot cell sums at
    most 1024 values < 2^14, so partials are <= 1024 * (2^14 - 1) =
    16,776,192 < 2^24 — every f32 add is exact. Per-row folds into the
    int32 accumulator wrap mod 2^32 like the reference's uint32 aggregation
    (groupby/groupby.cpp:8-19).

    The i1 select uses f32 operands only — f32 shares the (8, 128) native
    vreg layout with the int32 compare, avoiding the i1 relayouts Mosaic
    cannot do for bf16/int8 selects (measured round 2: MosaicError "Invalid
    relayout ... replicated in destination" on the bf16 where-forms).

    Padding keys carry the sentinel ``ga << shift`` (= the smallest uint32
    the hi-route check rejects), so no per-element index masking is needed.
    """
    ga, gb = _digit_split(num_groups)
    shift = int(np.log2(gb))
    sentinel = np.uint32(ga << shift)
    n = k.shape[0]
    block = _ROWS * _W
    pad = (-n) % block
    kp = jnp.pad(k.astype(jnp.uint32), (0, pad), constant_values=sentinel)
    vp = jnp.pad(v.astype(jnp.int32), (0, pad))
    k2 = kp.astype(jnp.int32).reshape(-1, _W)
    v2 = vp.reshape(-1, _W)
    nblocks = (n + pad) // block
    _H = 1024  # half-row: 1024 * (2^14 - 1) < 2^24 keeps f32 cells exact

    def kernel(k_ref, v_ref, out_ref, acc_int):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_int[...] = jnp.zeros((ga, gb), jnp.int32)

        iota_a = jax.lax.broadcasted_iota(jnp.int32, (ga, _H), 0)
        iota_b = jax.lax.broadcasted_iota(jnp.int32, (gb, _H), 0)
        zero = jnp.zeros((ga, _H), jnp.float32)
        dims = (((1,), (1,)), ((), ()))
        for r in range(_ROWS):
            for h in range(_W // _H):
                row = k_ref[r, h * _H : (h + 1) * _H].reshape(1, _H)
                val = v_ref[r, h * _H : (h + 1) * _H].reshape(1, _H)
                # out-of-range keys (uint32 >= ga*gb, incl. the padding
                # sentinel and negatives) route hi past every iota row
                bad = row.astype(jnp.uint32) >= jnp.uint32(int(sentinel))
                hi = jnp.where(bad, np.int32(ga), row >> shift)
                lo = row & (gb - 1)
                cmp_a = jnp.broadcast_to(hi, (ga, _H)) == iota_a
                oh_b = (jnp.broadcast_to(lo, (gb, _H)) == iota_b).astype(
                    jnp.float32
                )
                vf = jnp.broadcast_to(val.astype(jnp.float32), (ga, _H))
                a = jnp.where(cmp_a, vf, zero)
                s = jax.lax.dot_general(
                    a, oh_b, dimension_numbers=dims,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                acc_int[...] += s.astype(jnp.int32)

        @pl.when(i == nblocks - 1)
        def _():
            out_ref[...] = acc_int[...]

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
        out_shape=jax.ShapeDtypeStruct((ga, gb), jnp.int32),
        scratch_shapes=[pltpu.VMEM((ga, gb), jnp.int32)],
        interpret=interpret,
    )(k2, v2)
    return out.reshape(-1)[:num_groups].astype(jnp.uint32)


@partial(jax.jit, static_argnames=("num_groups", "rows", "w", "stack",
                                   "interpret"))
def groupby_small_swar_pallas(
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_groups: int,
    rows: int = 32,
    w: int = 4096,
    stack: int = 1,
    interpret: bool = False,
):
    """``groupby_small_pallas`` semantics on SWAR bin-packed one-hots
    (round 4 — the round-3 histogram winner applied to the balanced-digit
    group-by, docs/performance.md leverage item 3).

    Both digit one-hots ride the 3-op 7-bit zero detector
    (``z = ((rep ^ ~pats) - 0x7F7F7F7F) & 0x80808080``, see
    hist_pallas.histogram_16k_swar_pallas): digits are ≤ 127 by
    construction (ga·gb ≤ 2^14, out-of-range keys route to hi byte 127 —
    unused while ga ≤ 120), so the no-borrow precondition always holds.

      * hi side: pure one-hot — bitcast of ``z`` gives (ga, W) int8 with
        -128 at matches (ga/4 pattern rows · 3 ops).
      * lo side: WEIGHTED one-hots with no per-bin-row multiply:
        ``q = (z >> 7) & 0x01010101`` has a single 0x01 at the matching
        byte, and ``q · plane`` (plane ≤ 127 fits one byte) places the
        7-bit value plane exactly there — the bitcast rows ARE
        ``onehot_lo · v_plane`` (gb/4 rows: 3 + 2 + 1 ops per plane
        multiply). Bad rows may match a lo bin; their hi row never does,
        so the dot product is 0.

    The plane dots are int8 (-128 · plane ≥ -16256, exact int32
    accumulation); each fold is ``acc -= dot >> 7`` (the dot is a
    negated multiple of 128: per-dot cell sums ≥ -128·127·stack·w
    > -2^31). Output and wrap semantics identical to
    ``groupby_small_pallas`` (reference uint32 aggregation,
    groupby/groupby.cpp:8-19). PRECONDITION: 0 <= v < 2^14.

    ``stack`` concatenates that many rows' digit/value strips along
    lanes before the zdetect, so one (ga, stack·w) dot serves ``stack``
    rows — the per-row dots are MXU issue-bound (M = N ≤ 8 sublanes of
    the 128×128 array; K = w streams in ~w/128 beats), which is why the
    round-3 VPU-floor analysis under-predicted this kernel (h1/g1,
    scripts/measure_r5.py)."""
    ga, gb = _digit_split(num_groups)
    assert ga % 4 == 0 and gb % 4 == 0 and ga <= 120, (ga, gb)
    assert rows % stack == 0
    shift = int(np.log2(gb))
    sentinel = np.uint32(ga << shift)
    # per-DOT cell sums must stay int32-exact: 128·127·stack·w < 2^31
    assert 128 * 127 * stack * w < (1 << 31), (stack, w)
    n = k.shape[0]
    block = rows * w
    pad = (-n) % block
    kp = jnp.pad(k.astype(jnp.uint32), (0, pad), constant_values=sentinel)
    vp = jnp.pad(v.astype(jnp.int32), (0, pad))
    k2 = kp.astype(jnp.int32).reshape(-1, w)
    v2 = vp.reshape(-1, w)
    nblocks = (n + pad) // block
    L7 = np.uint32(0x7F7F7F7F)
    L8 = np.uint32(0x80808080)
    M1 = np.uint32(0x01010101)

    L = w * stack  # lanes per dot (stacked strip width)

    def kernel(k_ref, v_ref, out_ref, acc_lo, acc_hi):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_lo[...] = jnp.zeros((ga, gb), jnp.int32)
            acc_hi[...] = jnp.zeros((ga, gb), jnp.int32)

        pinv_a = ~(
            jax.lax.broadcasted_iota(jnp.uint32, (ga // 4, L), 0)
            * np.uint32(4 * 0x01010101)
            + np.uint32(0x03020100)
        )
        pinv_b = ~(
            jax.lax.broadcasted_iota(jnp.uint32, (gb // 4, L), 0)
            * np.uint32(4 * 0x01010101)
            + np.uint32(0x03020100)
        )
        dims = (((1,), (1,)), ((), ()))

        def cat(parts):
            return parts[0] if stack == 1 else jnp.concatenate(
                parts, axis=1
            )

        for r0 in range(0, rows, stack):
            his, los, vls, vhs = [], [], [], []
            for r in range(r0, r0 + stack):
                row = k_ref[r, :].reshape(1, w)
                val = v_ref[r, :].reshape(1, w)
                bad = row.astype(jnp.uint32) >= jnp.uint32(int(sentinel))
                his.append(jnp.where(bad, np.int32(127), row >> shift))
                los.append(row & (gb - 1))  # bad killed by the hi side
                vls.append((val & 0x7F).astype(jnp.uint32))
                vhs.append((val >> 7).astype(jnp.uint32))
            za = (
                jnp.broadcast_to(cat(his).astype(jnp.uint32) * M1,
                                 (ga // 4, L))
                ^ pinv_a
            ) - L7 & L8
            zb = (
                jnp.broadcast_to(cat(los).astype(jnp.uint32) * M1,
                                 (gb // 4, L))
                ^ pinv_b
            ) - L7 & L8
            q = (zb >> 7) & M1  # 0x01 at the matching byte
            wlo = q * jnp.broadcast_to(cat(vls), (gb // 4, L))
            whi = q * jnp.broadcast_to(cat(vhs), (gb // 4, L))
            oh_a = pltpu.bitcast(za, jnp.int8)  # (ga, L): -128 at match
            blo = pltpu.bitcast(wlo, jnp.int8)  # (gb, L): v&127 at match
            bhi = pltpu.bitcast(whi, jnp.int8)  # (gb, L): v>>7 at match
            acc_lo[...] -= jax.lax.dot_general(
                oh_a, blo, dimension_numbers=dims,
                preferred_element_type=jnp.int32,
            ) >> 7
            acc_hi[...] -= jax.lax.dot_general(
                oh_a, bhi, dimension_numbers=dims,
                preferred_element_type=jnp.int32,
            ) >> 7

        @pl.when(i == nblocks - 1)
        def _():
            out_ref[...] = acc_lo[...] + (acc_hi[...] << 7)

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
        scratch_shapes=[
            pltpu.VMEM((ga, gb), jnp.int32),
            pltpu.VMEM((ga, gb), jnp.int32),
        ],
        interpret=interpret,
    )(k2, v2)
    return out.reshape(-1)[:num_groups].astype(jnp.uint32)


@partial(jax.jit, static_argnames=("num_groups", "rows", "w", "interpret"))
def groupby_small_pallas(
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_groups: int,
    rows: int = 32,
    w: int = 4096,
    interpret: bool = False,
):
    """(num_groups,) uint32 per-group sums of ``v`` for keys in
    [0, num_groups), num_groups <= 4096. PRECONDITION: 0 <= v < 2^14.

    Block shape (rows=32, w=4096) and sentinel padding are measured
    winners: the R/W sweep gave 0.232 ms at G=64, 2^22 vs 0.287 for the
    round-1 (8, 2048) block with per-element index masks, and the R=64
    point regressed 2.4x (measure_r3b.py e3, measure_r3c.py f1). Padding
    keys carry ``ga << shift`` — the smallest uint32 the out-of-range
    route rejects — so no index masking is needed anywhere."""
    ga, gb = _digit_split(num_groups)
    shift = int(np.log2(gb))
    sentinel = np.uint32(ga << shift)
    # per-BLOCK f32 plane partials must stay exact: 127 * rows * w < 2^24
    # (32 * 4096 * 127 = 16,646,144 — just under; any larger block wraps)
    assert 127 * rows * w < (1 << 24), (rows, w)
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

        blk_lo = jnp.zeros((ga, gb), jnp.float32)
        blk_hi = jnp.zeros((ga, gb), jnp.float32)
        iota_a = jax.lax.broadcasted_iota(jnp.int32, (ga, w), 0)
        iota_b = jax.lax.broadcasted_iota(jnp.int32, (gb, w), 0)
        dims = (((1,), (1,)), ((), ()))
        for r in range(rows):
            row = k_ref[r, :].reshape(1, w)
            val = v_ref[r, :].reshape(1, w)
            # out-of-range keys (uint32 >= ga*gb, incl. padding sentinel
            # and negatives) route the hi digit past every iota row
            bad = row.astype(jnp.uint32) >= jnp.uint32(int(sentinel))
            hi = jnp.where(bad, np.int32(ga), row >> shift)
            lo = row & (gb - 1)
            oh_a = (jnp.broadcast_to(hi, (ga, w)) == iota_a).astype(
                jnp.bfloat16
            )
            oh_b = (jnp.broadcast_to(lo, (gb, w)) == iota_b).astype(
                jnp.bfloat16
            )
            vlo = jnp.broadcast_to((val & 0x7F).astype(jnp.bfloat16),
                                   (ga, w))
            vhi = jnp.broadcast_to(((val >> 7) & 0x7F).astype(jnp.bfloat16),
                                   (ga, w))
            blk_lo = blk_lo + jax.lax.dot_general(
                oh_a * vlo, oh_b, dimension_numbers=dims,
                preferred_element_type=jnp.float32,
            )
            blk_hi = blk_hi + jax.lax.dot_general(
                oh_a * vhi, oh_b, dimension_numbers=dims,
                preferred_element_type=jnp.float32,
            )

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
