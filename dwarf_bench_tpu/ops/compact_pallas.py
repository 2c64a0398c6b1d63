"""Mask-driven multi-column Pallas streaming compaction.

Generalizes the TwoPassScan kernel (ops/scan_pallas.py) from "predicate
computed in-kernel, one column" to "caller-supplied mask column, 1–3 value
columns": the butterfly's routing decisions (take/displacement/alive) are
computed ONCE from the mask and applied to every column, so compacting a
(position, value) pair costs ~1.3× one column instead of 2 passes.

Used by the sparsity-adaptive filter (ops/scan.filter_sparse) to compact
per-chunk summary arrays, and available as the general copy_if-by-mask
engine (oneDPL copy_if with a stencil, dpl_wrapper.hpp:25-32).

Same streaming-write machinery as scan_pallas: HBM DMA offsets must be
128-lane aligned, so each column keeps a ≤128-element carry merged into a
comb buffer written with one static-size DMA per block at the aligned
running offset; the final grid step flushes the residual carry.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .scan_pallas import _lane_cumsum

_ROWS = 8


def _compact_rows_multi(cols, mask, tile):
    """LSB-first butterfly compaction of each row of (R, tile) blocks for
    several columns sharing one mask. Returns (compacted_cols, m_int)."""
    m = mask.astype(jnp.int32)
    pos = _lane_cumsum(m, tile) - m
    lane = jax.lax.broadcasted_iota(jnp.int32, mask.shape, 1)
    d = jnp.where(mask, lane - pos, 0)
    alive = mask
    cols = list(cols)
    bits = max(1, int(np.ceil(np.log2(tile))))
    for b in range(bits):
        s = 1 << b
        need = alive & (((d >> b) & 1) == 1)
        src_need = pltpu.roll(need.astype(jnp.int32), tile - s, 1) == 1
        src_d = pltpu.roll(d, tile - s, 1)
        take = src_need & (lane < tile - s)
        cols = [
            jnp.where(take, pltpu.roll(c, tile - s, 1), c) for c in cols
        ]
        d = jnp.where(take, src_d - s, jnp.where(alive & ~need, d, 0))
        alive = take | (alive & ~need)
    return cols, m


@partial(
    jax.jit, static_argnames=("n", "npad", "ncols", "tile", "interpret")
)
def _compact_mask_call(mask2, cols2, n, npad, ncols, tile, interpret):
    nblocks = npad // (_ROWS * tile)
    block = _ROWS * tile
    width = block + 128

    def kernel(*refs):
        mask_ref = refs[0]
        col_refs = refs[1 : 1 + ncols]
        out_refs = refs[1 + ncols : 1 + 2 * ncols]
        count_ref = refs[1 + 2 * ncols]
        comb_refs = refs[2 + 2 * ncols : 2 + 3 * ncols]
        carry_refs = refs[2 + 3 * ncols : 2 + 4 * ncols]
        state_ref = refs[2 + 4 * ncols]
        sems = refs[3 + 4 * ncols]
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            state_ref[0] = 0
            state_ref[1] = 0
            for c in range(ncols):
                carry_refs[c][...] = jnp.zeros((1, 128), jnp.int32)

        mask = mask_ref[...] != 0
        compacted, m = _compact_rows_multi(
            [col_refs[c][...] for c in range(ncols)], mask, tile
        )
        sub = jax.lax.broadcasted_iota(jnp.int32, mask.shape, 0)

        @pl.when(i > 0)
        def _():
            for c in range(ncols):
                pltpu.make_async_copy(
                    comb_refs[c], out_refs[c].at[:, pl.ds(0, width)],
                    sems.at[c],
                ).wait()

        # per-row streams + counts, then the pairwise tree merge per column
        cnts = [
            jnp.sum(jnp.where(sub == r, m, 0)) for r in range(_ROWS)
        ]
        col_rows = [
            [
                jnp.sum(jnp.where(sub == r, comp, 0), axis=0, keepdims=True)
                for r in range(_ROWS)
            ]
            for comp in compacted
        ]

        def merge(a, ca, b):
            w = a.shape[1]
            aw = jnp.pad(a, ((0, 0), (0, w)))
            bw = jnp.pad(b, ((0, 0), (0, w)))
            lane2 = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * w), 1)
            return jnp.where(lane2 < ca, aw, pltpu.roll(bw, ca, 1))

        mcnts = list(cnts)
        while len(mcnts) > 1:
            nxt_c = []
            for ci in range(ncols):
                col_rows[ci] = [
                    merge(col_rows[ci][p], mcnts[p], col_rows[ci][p + 1])
                    for p in range(0, len(mcnts), 2)
                ]
            nxt_c = [
                mcnts[p] + mcnts[p + 1] for p in range(0, len(mcnts), 2)
            ]
            mcnts = nxt_c
        cnt = mcnts[0]

        off = state_ref[0]
        rem = state_ref[1]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, width), 1)
        total = rem + cnt
        adv = (total // 128) * 128
        for c in range(ncols):
            blk = col_rows[c][0]
            rolled = pltpu.roll(jnp.pad(blk, ((0, 0), (0, 128))), rem, 1)
            carry_wide = jnp.pad(carry_refs[c][...], ((0, 0), (0, block)))
            comb_refs[c][...] = jnp.where(lane < rem, carry_wide, rolled)
            pltpu.make_async_copy(
                comb_refs[c],
                out_refs[c].at[:, pl.ds(pl.multiple_of(off, 128), width)],
                sems.at[c],
            ).start()
            back = pltpu.roll(comb_refs[c][...], width - adv, 1)
            carry_refs[c][...] = back[:, :128]
        state_ref[0] = off + adv
        state_ref[1] = total - adv

        @pl.when(i == nblocks - 1)
        def _():
            for c in range(ncols):
                pltpu.make_async_copy(
                    comb_refs[c], out_refs[c].at[:, pl.ds(0, width)],
                    sems.at[c],
                ).wait()
                dma = pltpu.make_async_copy(
                    carry_refs[c],
                    out_refs[c].at[
                        :, pl.ds(pl.multiple_of(state_ref[0], 128), 128)
                    ],
                    sems.at[c],
                )
                dma.start()
                dma.wait()
            count_ref[0, 0] = state_ref[0] + state_ref[1]

    blockspec = pl.BlockSpec((_ROWS, tile), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[blockspec] * (1 + ncols),
        out_specs=tuple([pl.BlockSpec(memory_space=pl.ANY)] * ncols)
        + (pl.BlockSpec(memory_space=pltpu.SMEM),),
        out_shape=tuple(
            jax.ShapeDtypeStruct((1, npad + _ROWS * tile + 256), jnp.int32)
            for _ in range(ncols)
        )
        + (jax.ShapeDtypeStruct((1, 1), jnp.int32),),
        scratch_shapes=[
            pltpu.VMEM((1, _ROWS * tile + 128), jnp.int32)
            for _ in range(ncols)
        ]
        + [pltpu.VMEM((1, 128), jnp.int32) for _ in range(ncols)]
        + [pltpu.SMEM((2,), jnp.int32), pltpu.SemaphoreType.DMA((ncols,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(mask2, *cols2)
    return outs


@partial(jax.jit, static_argnames=("capacity", "tile", "interpret"))
def compact_mask_pallas(
    mask: jnp.ndarray,
    cols,
    capacity: int | None = None,
    tile: int = 2048,
    interpret: bool = False,
):
    """copy_if by mask: compact each int32 column in ``cols`` (1-3) to
    the front, preserving order. Returns (tuple_of_outs, count); outputs
    have garbage past ``count``."""
    cols = tuple(cols)
    ncols = len(cols)
    assert 1 <= ncols <= 3
    n = mask.shape[0]
    if capacity is None:
        capacity = n
    block_elems = _ROWS * tile
    pad = (-n) % block_elems
    npad = n + pad
    m2 = jnp.pad(mask.astype(jnp.int32), (0, pad)).reshape(-1, tile)
    cols2 = tuple(
        jnp.pad(c.astype(jnp.int32), (0, pad)).reshape(-1, tile)
        for c in cols
    )
    outs = _compact_mask_call(m2, cols2, n, npad, ncols, tile, interpret)
    count = outs[-1][0, 0]
    return tuple(o[0, :capacity] for o in outs[:-1]), count


@partial(jax.jit, static_argnames=("capacity", "interpret"))
def emit_prefix_pallas(
    vals: jnp.ndarray, capacity: int, interpret: bool = False
):
    """Write ``vals`` (L <= capacity) into the first L slots of a (capacity,)
    output WITHOUT initializing the rest (garbage past the caller's count,
    per the fixed-capacity + count contract). A jnp.zeros-based assembly
    zero-fills the whole buffer first — an O(capacity) HBM write (~0.09 ms
    at 2^24) that this one static-size DMA avoids, mirroring the reference
    kernels, which also leave their output buffers untouched past out_size
    (scan/scan.cl:32-41)."""
    lraw = vals.shape[0]
    assert lraw <= capacity
    lpad = lraw + ((-lraw) % 128)
    v2 = jnp.pad(vals.astype(jnp.int32), (0, lpad - lraw)).reshape(1, -1)
    width = max(capacity, lpad)

    def kernel(v_ref, o_ref, sem):
        dma = pltpu.make_async_copy(v_ref, o_ref.at[:, pl.ds(0, lpad)], sem)
        dma.start()
        dma.wait()

    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((1, width), jnp.int32),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(v2)
    return out[0, :capacity]
