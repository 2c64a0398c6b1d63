"""Single-dispatch tail for the sparsity-adaptive filter (phase B fuse).

After phase A (per-chunk stats + offsets), the sparse filter's tail was a
chain of small dispatches: classify singles/multis, two
``compact_mask_pallas`` calls over the (nch,) chunk arrays, and a
``base[mids]`` gather — each touching ~0.5 MB but paying kernel-launch and
XLA-glue overhead (docs/performance.md: jit-level small ops cost ~0.065 ms
each). This kernel does all of it in ONE pallas_call with the whole chunk
array resident in VMEM (nch ≤ 2^18 chunks = 1 MB per column):

  * classification from ``stat`` (scan.filter_sparse's single/multi rules,
    reference pass-1 analog scan/scan.cl:3-22);
  * order-preserving butterfly compaction of (base, threshold − vsw) over
    single chunks → the self-describing output stream (spos, sval);
  * order-preserving compaction of (chunk_id, base) over multi chunks →
    (mids, mbase) for the gather path — the ``base[mids]`` gather
    disappears because base rides the same compaction.

Single grid step: per-sublane-row butterfly (ops/compact_pallas
_compact_rows_multi) + the pairwise row-stream merge tree, no carry
machinery. ``nch`` is capped at 128 rows × 2048 lanes = 2^18 chunks (2^25
elements at chunk=128) — the merge-tree extraction is O(R²·tile) — and
filter_sparse keeps the multi-dispatch path beyond that.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .compact_pallas import _compact_rows_multi

_TILE = 2048
_MAX_ROWS = 128
_BIG = np.int32(0x7FFFFFFF)
_ROWS = 8


@partial(
    jax.jit, static_argnames=("cap_single", "cap_mc", "rows", "interpret")
)
def scan_tail_streams(
    stat: jnp.ndarray,
    base: jnp.ndarray,
    threshold,
    cap_single: int,
    cap_mc: int,
    rows: int = 8,
    interpret: bool = False,
):
    """``scan_tail_compact`` semantics on the STREAMING carry-buffer
    machinery (one kernel, sequential grid) instead of the single-step
    merge tree: the round-3 single-shot kernel measured 1.852 ms at 2^24
    — its (1, nch)-row pairwise merges run dynamic-shift rolls at 1/8
    sublane utilization — while this structure (compact_pallas's per-row
    butterfly + 8-row merge + 128-lane-aligned comb/carry DMA appends)
    measures like compact_mask_pallas itself, but compacts BOTH
    classified streams (singles' (base, thr−vsw), multis'
    (chunk_id, base)) from one read of the chunk arrays.

    Returns (spos, sval, mids, mbase, n_single, n_multi); spos carries
    the _BIG sentinel past n_single, the other columns are garbage past
    their counts."""
    nch = stat.shape[0]
    block = rows * _TILE
    pad = (-nch) % block
    npad = nch + pad
    nblocks = npad // block
    # padding chunks carry stat = 0 (cnt = 0): neither single nor multi
    stat2 = jnp.pad(stat.astype(jnp.int32), (0, pad)).reshape(-1, _TILE)
    base2 = jnp.pad(base.astype(jnp.int32), (0, pad)).reshape(-1, _TILE)
    thr_arr = jnp.full((1,), threshold, jnp.int32)
    width = block + 128

    def kernel(thr_ref, stat_ref, base_ref,
               s0_ref, s1_ref, m0_ref, m1_ref, count_ref,
               comb0, comb1, comb2, comb3,
               carry0, carry1, carry2, carry3, state_ref, sems):
        i = pl.program_id(0)
        combs = (comb0, comb1, comb2, comb3)
        carries = (carry0, carry1, carry2, carry3)
        outs = (s0_ref, s1_ref, m0_ref, m1_ref)

        @pl.when(i == 0)
        def _():
            for c in range(4):
                carries[c][...] = jnp.zeros((1, 128), jnp.int32)
            state_ref[0] = 0
            state_ref[1] = 0
            state_ref[2] = 0
            state_ref[3] = 0

        st = stat_ref[...]
        bs = base_ref[...]
        cnt = st >> 9
        vsw = st & 511
        single = (cnt == 1) & (vsw >= 1) & (vsw <= 255)
        multi = (cnt >= 1) & ~single
        sval = thr_ref[0] - vsw
        sub = jax.lax.broadcasted_iota(jnp.int32, (rows, _TILE), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (rows, _TILE), 1)
        chunk_id = i * block + sub * _TILE + lane

        @pl.when(i > 0)
        def _():
            for c in range(4):
                pltpu.make_async_copy(
                    combs[c], outs[c].at[:, pl.ds(0, width)], sems.at[c]
                ).wait()

        for s, (mask, cols) in enumerate(
            (((single), [bs, sval]), ((multi), [chunk_id, bs]))
        ):
            compacted, m = _compact_rows_multi(cols, mask, _TILE)
            cnts = [
                jnp.sum(jnp.where(sub == r, m, 0)) for r in range(rows)
            ]
            col_rows = [
                [
                    jnp.sum(jnp.where(sub == r, comp, 0), axis=0,
                            keepdims=True)
                    for r in range(rows)
                ]
                for comp in compacted
            ]

            def merge(a, ca, b):
                w = a.shape[1]
                aw = jnp.pad(a, ((0, 0), (0, w)))
                bw = jnp.pad(b, ((0, 0), (0, w)))
                lane2 = jax.lax.broadcasted_iota(
                    jnp.int32, (1, 2 * w), 1
                )
                return jnp.where(lane2 < ca, aw, pltpu.roll(bw, ca, 1))

            mcnts = list(cnts)
            while len(mcnts) > 1:
                for ci in range(2):
                    col_rows[ci] = [
                        merge(col_rows[ci][p], mcnts[p],
                              col_rows[ci][p + 1])
                        for p in range(0, len(mcnts), 2)
                    ]
                mcnts = [
                    mcnts[p] + mcnts[p + 1]
                    for p in range(0, len(mcnts), 2)
                ]
            scnt = mcnts[0]

            off = state_ref[2 * s]
            rem = state_ref[2 * s + 1]
            lanew = jax.lax.broadcasted_iota(jnp.int32, (1, width), 1)
            total = rem + scnt
            adv = (total // 128) * 128
            for ci in range(2):
                c = 2 * s + ci
                blk = col_rows[ci][0]
                rolled = pltpu.roll(
                    jnp.pad(blk, ((0, 0), (0, 128))), rem, 1
                )
                carry_wide = jnp.pad(
                    carries[c][...], ((0, 0), (0, block))
                )
                combs[c][...] = jnp.where(lanew < rem, carry_wide, rolled)
                pltpu.make_async_copy(
                    combs[c],
                    outs[c].at[:, pl.ds(pl.multiple_of(off, 128), width)],
                    sems.at[c],
                ).start()
                back = pltpu.roll(combs[c][...], width - adv, 1)
                carries[c][...] = back[:, :128]
            state_ref[2 * s] = off + adv
            state_ref[2 * s + 1] = total - adv

        @pl.when(i == nblocks - 1)
        def _():
            for c in range(4):
                pltpu.make_async_copy(
                    combs[c], outs[c].at[:, pl.ds(0, width)], sems.at[c]
                ).wait()
                dma = pltpu.make_async_copy(
                    carries[c],
                    outs[c].at[
                        :,
                        pl.ds(
                            pl.multiple_of(state_ref[2 * (c // 2)], 128),
                            128,
                        ),
                    ],
                    sems.at[c],
                )
                dma.start()
                dma.wait()
            count_ref[0] = state_ref[0] + state_ref[1]
            count_ref[1] = state_ref[2] + state_ref[3]

    blockspec = pl.BlockSpec((rows, _TILE), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    outw = npad + block + 256
    outs = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  blockspec, blockspec],
        out_specs=tuple([pl.BlockSpec(memory_space=pl.ANY)] * 4)
        + (pl.BlockSpec(memory_space=pltpu.SMEM),),
        out_shape=tuple(
            jax.ShapeDtypeStruct((1, outw), jnp.int32) for _ in range(4)
        )
        + (jax.ShapeDtypeStruct((2,), jnp.int32),),
        scratch_shapes=[pltpu.VMEM((1, width), jnp.int32)
                        for _ in range(4)]
        + [pltpu.VMEM((1, 128), jnp.int32) for _ in range(4)]
        + [pltpu.SMEM((4,), jnp.int32), pltpu.SemaphoreType.DMA((4,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(thr_arr, stat2, base2)
    s0, s1, m0, m1, cnts = outs
    ns, nm = cnts[0], cnts[1]
    iota_s = jnp.arange(cap_single, dtype=jnp.int32)
    spos = jnp.where(iota_s < ns, s0[0, :cap_single], _BIG)
    return (
        spos, s1[0, :cap_single], m0[0, :cap_mc], m1[0, :cap_mc], ns, nm
    )


def _merge_streams(comps, m, rows, tile):
    """Merge per-row compacted streams (rows, tile) into (1, rows*tile)
    streams, preserving row order; returns (streams, total_count)."""
    sub = jax.lax.broadcasted_iota(jnp.int32, (rows, tile), 0)
    cnts = [jnp.sum(jnp.where(sub == r, m, 0)) for r in range(rows)]
    col_rows = [
        [
            jnp.sum(jnp.where(sub == r, c, 0), axis=0, keepdims=True)
            for r in range(rows)
        ]
        for c in comps
    ]

    def merge(a, ca, b):
        w = a.shape[1]
        aw = jnp.pad(a, ((0, 0), (0, w)))
        bw = jnp.pad(b, ((0, 0), (0, w)))
        lane2 = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * w), 1)
        return jnp.where(lane2 < ca, aw, pltpu.roll(bw, ca, 1))

    mcnts = list(cnts)
    while len(mcnts) > 1:
        for ci in range(len(col_rows)):
            col_rows[ci] = [
                merge(col_rows[ci][p], mcnts[p], col_rows[ci][p + 1])
                for p in range(0, len(mcnts), 2)
            ]
        mcnts = [mcnts[p] + mcnts[p + 1] for p in range(0, len(mcnts), 2)]
    return [cr[0] for cr in col_rows], mcnts[0]


@partial(
    jax.jit, static_argnames=("cap_single", "cap_mc", "interpret")
)
def scan_tail_compact(
    stat: jnp.ndarray,
    base: jnp.ndarray,
    threshold,
    cap_single: int,
    cap_mc: int,
    interpret: bool = False,
):
    """(spos, sval, mids, mbase, n_single, n_multi) from per-chunk stats.

    MEASURED NEGATIVE RESULT — superseded by ``scan_tail_streams``: this
    single-grid-step variant's pairwise merge tree runs dynamic-shift
    rolls over (1, nch) rows at 1/8 sublane utilization and measured
    0.377 ms standalone at 2^24 vs 0.198 for the streaming version
    (scripts/measure_r4.py g10/g12). Kept A/B-addressable and
    unit-tested as the record of why the streaming carry-buffer
    structure is the right one.

    spos carries the _BIG sentinel past n_single (ordering-sort contract);
    mids/mbase are garbage past n_multi (callers mask, as with the
    previous compact_mask_pallas output)."""
    nch = stat.shape[0]
    pad = (-nch) % _TILE
    rows = (nch + pad) // _TILE
    # the pairwise merge tree needs a power-of-two row count
    rows = 1 << (rows - 1).bit_length()
    npad = rows * _TILE
    pad = npad - nch
    assert rows <= _MAX_ROWS, nch
    # padding chunks carry stat = 0 (cnt = 0): neither single nor multi
    stat2 = jnp.pad(stat.astype(jnp.int32), (0, pad)).reshape(rows, _TILE)
    base2 = jnp.pad(base.astype(jnp.int32), (0, pad)).reshape(rows, _TILE)
    thr_arr = jnp.full((1,), threshold, jnp.int32)
    width = max(npad, cap_single, cap_mc)

    def kernel(thr_ref, stat_ref, base_ref,
               spos_ref, sval_ref, mids_ref, mbase_ref, cnts_ref):
        st = stat_ref[...]
        bs = base_ref[...]
        cnt = st >> 9
        vsw = st & 511
        single = (cnt == 1) & (vsw >= 1) & (vsw <= 255)
        multi = (cnt >= 1) & ~single
        sval = thr_ref[0] - vsw

        comp_s, ms = _compact_rows_multi([bs, sval], single, _TILE)
        (s_pos, s_val), ns = _merge_streams(comp_s, ms, rows, _TILE)

        sub = jax.lax.broadcasted_iota(jnp.int32, (rows, _TILE), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (rows, _TILE), 1)
        chunk_id = sub * _TILE + lane
        comp_m, mm = _compact_rows_multi([chunk_id, bs], multi, _TILE)
        (m_ids, m_base), nm = _merge_streams(comp_m, mm, rows, _TILE)

        lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, width), 1)
        sp = jnp.pad(s_pos, ((0, 0), (0, width - npad)))
        sv = jnp.pad(s_val, ((0, 0), (0, width - npad)))
        spos_ref[...] = jnp.where(
            lane1 < ns, sp, _BIG
        )[:, :cap_single]
        sval_ref[...] = sv[:, :cap_single]
        mi = jnp.pad(m_ids, ((0, 0), (0, width - npad)))
        mb = jnp.pad(m_base, ((0, 0), (0, width - npad)))
        mids_ref[...] = mi[:, :cap_mc]
        mbase_ref[...] = mb[:, :cap_mc]
        cnts_ref[0] = ns
        cnts_ref[1] = nm

    outs = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, cap_single), jnp.int32),
            jax.ShapeDtypeStruct((1, cap_single), jnp.int32),
            jax.ShapeDtypeStruct((1, cap_mc), jnp.int32),
            jax.ShapeDtypeStruct((1, cap_mc), jnp.int32),
            jax.ShapeDtypeStruct((2,), jnp.int32),
        ],
        interpret=interpret,
    )(thr_arr, stat2, base2)
    spos, sval, mids, mbase, cnts = outs
    return (
        spos[0], sval[0], mids[0], mbase[0], cnts[0], cnts[1]
    )
