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
