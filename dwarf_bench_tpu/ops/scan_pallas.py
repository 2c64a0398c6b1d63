"""Pallas single-kernel streaming filter (the TwoPassScan hot path).

The reference's two-pass OpenCL scan (scan/scan.cl:3-42) counts per thread
chunk, prefix-sums, then re-reads and scatters. On TPU the grid executes
sequentially on the core, so both passes fuse into ONE streaming kernel:

  per (8, tile) block (VMEM):
    1. mask + within-row target positions (lane cumsum);
    2. per-row in-register compaction by the LSB-first butterfly: for each
       bit b of an element's leftward displacement, conditionally shift by
       2^b (pltpu.roll along lanes) — log2(tile) select passes, no scatter,
       no sort; all 8 sublane rows compact simultaneously (verified against
       copy_if over random selectivities);
    3. a pairwise tree of dynamic rolls merges the 8 row streams into one
       block stream in registers;
    4. aligned streaming write: HBM DMA offsets must be 128-aligned, so
       the block stream is merged with a ≤128-element carry (residual
       tail) in VMEM and written with ONE static-size DMA per block at the
       128-aligned running offset (SMEM scalars persist across the
       sequential grid); the new partial 128-lane chunk becomes the next
       carry and the final grid step flushes it. Later writes overwrite
       earlier garbage tails, so the output has a block of slack.

HBM traffic is read-once + write-compacted — the bandwidth-bound optimum —
with all shuffling done in VMEM/registers.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_THRESHOLD = 5
_ROWS = 8  # sublane count per block


def _lane_cumsum(m, tile):
    """Inclusive cumsum along lanes via Hillis–Steele log-shifts (Mosaic has
    no native cumsum lowering)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, m.shape, 1)
    s = 1
    while s < tile:
        shifted = pltpu.roll(m, s, 1)  # element i-s arrives at lane i
        m = m + jnp.where(lane >= s, shifted, 0)
        s *= 2
    return m


def _compact_rows(x, mask, tile):
    """LSB-first butterfly compaction of each row of an (R, tile) block.
    Returns (compacted, counts[R]) with garbage beyond each row's count."""
    m = mask.astype(jnp.int32)
    pos = _lane_cumsum(m, tile) - m  # exclusive target among selected
    counts = pos[:, -1:] + m[:, -1:]  # (R, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    d = jnp.where(mask, lane - pos, 0)
    alive = mask
    bits = max(1, int(np.ceil(np.log2(tile))))
    for b in range(bits):
        s = 1 << b
        # roll left by s == roll right by tile - s (pltpu.roll needs >= 0)
        need = alive & (((d >> b) & 1) == 1)
        src_x = pltpu.roll(x, tile - s, 1)
        # Mosaic can't rotate i1 vectors — roll the int32 form of the mask
        src_need = pltpu.roll(need.astype(jnp.int32), tile - s, 1) == 1
        src_d = pltpu.roll(d, tile - s, 1)
        take = src_need & (lane < tile - s)  # wrapped lanes are not taken
        x = jnp.where(take, src_x, x)
        d = jnp.where(take, src_d - s, jnp.where(alive & ~need, d, 0))
        alive = take | (alive & ~need)
    return x, counts


@partial(jax.jit, static_argnames=("capacity", "tile", "interpret"))
def filter_pallas(
    x: jnp.ndarray,
    threshold=DEFAULT_THRESHOLD,
    capacity: int | None = None,
    tile: int = 2048,
    interpret: bool = False,
):
    """copy_if(x, x < threshold) → (out, count); out has garbage past count.
    ``capacity`` is accepted for API parity (output is allocated at
    n_padded + tile and sliced to capacity)."""
    n = x.shape[0]
    if capacity is None:
        capacity = n
    block_elems = _ROWS * tile
    pad = (-n) % block_elems
    npad = n + pad
    xp = jnp.pad(x, (0, pad), constant_values=np.int32(2**31 - 1))
    x2 = xp.reshape(-1, tile)  # (nblocks*8, tile); row r of a block is the
    # r-th consecutive chunk, so in-order row DMAs preserve element order
    nblocks = npad // block_elems
    thr = jnp.asarray(threshold, x2.dtype).reshape(1, 1)

    block = _ROWS * tile
    width = block + 128  # comb buffer: carry (≤128) + one whole block

    def kernel(thr_ref, x_ref, out_ref, count_ref, comb_ref, carry_ref,
               state_ref, sem):
        # state_ref: [0] = aligned output offset (multiple of 128),
        #            [1] = residual element count in carry (< 128)
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            state_ref[0] = 0
            state_ref[1] = 0
            carry_ref[...] = jnp.zeros((1, 128), x_ref.dtype)

        xt = x_ref[...]
        mask = xt < thr_ref[0, 0]
        m = mask.astype(jnp.int32)
        compacted, _ = _compact_rows(xt, mask, tile)
        sub = jax.lax.broadcasted_iota(jnp.int32, compacted.shape, 0)

        # The previous step's DMA has been in flight during this block's
        # butterfly; it must complete before comb_ref is overwritten (and
        # consecutive DMAs overlap in HBM, so ordering matters).
        @pl.when(i > 0)
        def _():
            pltpu.make_async_copy(
                comb_ref, out_ref.at[:, pl.ds(0, width)], sem
            ).wait()

        # extract the 8 per-row compacted streams + counts
        rows = []
        cnts = []
        for r in range(_ROWS):
            is_r = sub == r
            rows.append(
                jnp.sum(jnp.where(is_r, compacted, 0), axis=0, keepdims=True)
            )
            cnts.append(jnp.sum(jnp.where(is_r, m, 0)))

        # pairwise tree merge: one dynamic roll per merge consolidates the
        # whole block in registers, so only ONE HBM DMA per block remains
        def merge(a, ca, b, cb):
            w = a.shape[1]
            aw = jnp.pad(a, ((0, 0), (0, w)))
            bw = jnp.pad(b, ((0, 0), (0, w)))
            lane2 = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * w), 1)
            merged = jnp.where(lane2 < ca, aw, pltpu.roll(bw, ca, 1))
            return merged, ca + cb

        while len(rows) > 1:
            nxt_r, nxt_c = [], []
            for p in range(0, len(rows), 2):
                mr, mc = merge(rows[p], cnts[p], rows[p + 1], cnts[p + 1])
                nxt_r.append(mr)
                nxt_c.append(mc)
            rows, cnts = nxt_r, nxt_c
        blk, cnt = rows[0], cnts[0]  # (1, block), scalar

        # HBM DMA offsets must be 128-aligned, so the write happens at the
        # aligned offset with the partial tail carried in VMEM:
        # comb = [carry (rem elems) | block data (cnt elems) | garbage]
        off = state_ref[0]
        rem = state_ref[1]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, width), 1)
        rolled = pltpu.roll(jnp.pad(blk, ((0, 0), (0, 128))), rem, 1)
        carry_wide = jnp.pad(carry_ref[...], ((0, 0), (0, block)))
        comb_ref[...] = jnp.where(lane < rem, carry_wide, rolled)
        dma = pltpu.make_async_copy(
            comb_ref,
            out_ref.at[:, pl.ds(pl.multiple_of(off, 128), width)],
            sem,
        )
        dma.start()  # waited at the top of the NEXT grid step (overlap)
        total = rem + cnt
        adv = (total // 128) * 128
        # new carry = lanes [adv, adv+128) of comb
        back = pltpu.roll(comb_ref[...], width - adv, 1)
        carry_ref[...] = back[:, :128]
        state_ref[0] = off + adv
        state_ref[1] = total - adv

        @pl.when(i == nblocks - 1)
        def _():
            # drain the last block's DMA (its tail overlaps the flush), then
            # flush the residual carry chunk (garbage beyond rem is fine —
            # it lies past the reported count)
            pltpu.make_async_copy(
                comb_ref, out_ref.at[:, pl.ds(0, width)], sem
            ).wait()
            dma = pltpu.make_async_copy(
                carry_ref,
                out_ref.at[:, pl.ds(pl.multiple_of(state_ref[0], 128), 128)],
                sem,
            )
            dma.start()
            dma.wait()
            count_ref[0, 0] = state_ref[0] + state_ref[1]

    out, count = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_ROWS, tile), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, npad + _ROWS * tile + 256), x2.dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, _ROWS * tile + 128), x2.dtype),  # comb
            pltpu.VMEM((1, 128), x2.dtype),  # carry
            pltpu.SMEM((2,), jnp.int32),  # aligned offset, residual
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(thr, x2)
    return out[0, :capacity], count[0, 0]
