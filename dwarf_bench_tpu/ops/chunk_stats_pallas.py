"""Streaming Pallas phase-A chunk statistics (sparsity-adaptive filter).

Semantics identical to ops/chunk_stats.chunk_stats_xla (the TPU analog of
TwoPassScan's pass-1 counting, scan/scan.cl:3-22): per 128-lane chunk, the
match count and the window-clipped match-value sum, packed as
``stat = cnt * 512 + min(vsum, 511)``.

Round-1 measured XLA's fused (nch, 128) row reductions at 0.16 ms for 2^24
rows — 2x the HBM read bound — and an early hand-written Pallas kernel at
0.56 ms (small blocks + N=1 MXU matvecs). This kernel uses the pattern that
took ops/reduce.reduce_sum_pallas to 755 GB/s instead:

  * 2 MB input blocks (256 x 2048 int32) through the sequential grid;
  * the per-chunk segment reductions ride the MXU as ONE (R, W) x (W, 16)
    matmul per quantity against a block-diagonal 0/1 segment matrix
    (seg[l, j] = 1 iff lane l belongs to the j-th 128-lane chunk of the
    row) — 16 MACs/element instead of log-shift lane reductions;
  * bf16 operands are exact: the mask is 0/1 and the window encoding is an
    integer <= 256 (8 mantissa bits); per-chunk f32 partials are <= 128*256
    < 2^24, so every accumulation is exact.

The exclusive output-offset prefix (``base``) stays outside: it is a
cumsum over nch = n/128 elements (~23 us at 2^24 via XLA), not worth a
carry in this kernel.

STATUS (measured, v5e): 0.22 ms standalone vs 0.50 ms for the XLA form at
2^24 — but 0.53 vs 0.38 ms for the FULL filter_sparse (measure_r3b.py
e1): XLA fuses its stats pass into the classification consumers, while
this kernel forces a materialize + extra dispatches. filter_sparse
therefore defaults to the XLA form; this kernel stays addressable via
``filter_sparse(..., stats_pallas=True)`` and is the starting point for a
future whole-phase-A mega-fusion (stats + classification + compaction
cursors in one carry-buffer kernel).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_R = 256  # sublanes per block: 256 x 2048 x 4 B = 2 MB VMEM blocks
_W = 2048
_SEG = _W // 128  # 128-lane chunks per sublane row


_RR = 1024  # chunk rows per block for the roll kernel: 1024x128x4 = 512 KB


@partial(jax.jit, static_argnames=("rows", "interpret"))
def chunk_stats_roll_pallas(
    x2: jnp.ndarray, threshold, rows: int = _RR, interpret: bool = False
):
    """chunk_stats_xla semantics via LANE-ROLL reductions (round 4).

    Every prior Pallas stats variant reduced the 128-lane chunks through
    MXU matvecs/segment dots and lost to XLA's fused row reductions (the
    0.218/0.316 vs 0.180 ms record, measure_r4 g10). This kernel lays the
    chunks out as (rows, 128) blocks — the 128-lane chunk IS the vreg
    lane extent — and all-reduces each row with the 7-step circular roll
    doubling (``p += roll(p, k)`` for k = 1..64): ~14 elementwise ops +
    ~7 ops of window encoding per element, no dots, no grid-step matvec
    latency. Count and window sum ride ONE reduction (``vclip +
    (m << 16)``: row sums ≤ 128·65792 < 2^24). Per 128-row sub-block the
    per-chunk scalars sit on the DIAGONAL of the all-reduced (128, 128)
    tile (every lane holds its row's total), extracted by an identity
    mask + 7 halving sublane adds — ~3 array-ops per 16384 elements.

    Returns (stat, base) — drop-in for chunk_stats_xla (the ``base``
    exclusive prefix rides cumsum_pallas over nch elements on the way
    out). Same window-encoding caveats (thresholds near INT32_MIN are the
    caller's routing concern)."""
    # output blocks are (rows/128, 128): Mosaic requires the sublane
    # tile be a multiple of 8 (or the whole array) -> rows % 1024 == 0
    assert rows % 1024 == 0
    nch = x2.shape[0]
    thr = jnp.asarray(threshold, jnp.int32)
    pad = (-nch) % rows
    xp = jnp.pad(
        x2.astype(jnp.int32), ((0, pad), (0, 0)), constant_values=thr
    )
    nblocks = xp.shape[0] // rows
    sub = rows // 128

    def kernel(thr_ref, x_ref, out_ref):
        t = thr_ref[0]
        x = x_ref[...]
        d = t - jnp.maximum(x, t - 512)
        vclip = jnp.clip(d, 0, 256)
        p = jnp.where(x < t, vclip + 65536, vclip)
        for k in (1, 2, 4, 8, 16, 32, 64):
            p = p + pltpu.roll(p, k, 1)
        # every lane now holds its chunk's cnt·2^16 + vsum (exact < 2^24)
        cnt = p >> 16
        vs = jnp.minimum(p & 65535, 511)
        stat = (cnt << 9) + vs
        rsub = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        csub = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        eye = (rsub == csub).astype(jnp.int32)
        for g in range(sub):
            v = stat[g * 128 : (g + 1) * 128, :] * eye
            w = 128
            while w > 1:  # halving sublane adds -> (1, 128) diagonal
                v = v[: w // 2, :] + v[w // 2 : w, :]
                w //= 2
            out_ref[g, :] = v.reshape(128)

    thr_arr = jnp.full((1,), thr, jnp.int32)
    out = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((rows, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((sub, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblocks * sub, 128), jnp.int32),
        interpret=interpret,
    )(thr_arr, xp)
    stat = out.reshape(-1)[:nch]
    cnt = stat >> 9
    if jax.default_backend() == "cpu" and not interpret:
        base = jnp.cumsum(cnt) - cnt
    else:
        from .cumsum_pallas import cumsum_pallas

        base = cumsum_pallas(cnt, two_plane=False,
                             interpret=interpret) - cnt
    return stat, base


@partial(jax.jit, static_argnames=("interpret",))
def chunk_stats_fused(x2: jnp.ndarray, threshold, interpret: bool = False):
    """chunk_stats_xla semantics in ONE kernel, ``base`` included.

    MEASURED NEGATIVE RESULT — the shipped scan keeps chunk_stats_xla:
    quiet-host standalone at 2^24 this kernel is 0.316 ms vs 0.218 for
    the two-dot round-2 Pallas kernel and 0.180 for the XLA reductions
    (scripts/measure_r4.py g10) — the single packed dot must run at
    Precision.HIGHEST (6 passes) on a skinny matmul, which costs more
    than the dot it saves. Kept A/B-addressable and unit-tested as the
    record, and as the only stats variant that yields ``base`` with no
    separate cumsum.

    Differences from ``chunk_stats_pallas`` (round-2, kept below):

      * ONE segment matmul instead of two: the per-element operand packs
        the match bit above the window encoding — ``vclip + 65536·m`` —
        so a chunk's f32 partial is ``cnt·65536 + vsum`` ≤ 128·65792
        < 2^24 (exact; vsum itself can reach 2^15, hence the 2^16 slot).
        Operands are ≤ 65792 (17 bits), so the dot runs at
        Precision.HIGHEST (bf16x3 carries 24 mantissa bits); the MAC
        count is 16·6/element — still noise.
      * the exclusive output-offset prefix (``base``) rides the same
        kernel: within-row lane prefix + cross-row offsets are two tiny
        triangular matmuls (the ops/cumsum_pallas pattern) and an int32
        carry scalar in SMEM links the sequential grid — no separate XLA
        cumsum dispatch over nch elements.

    Returns (stat, base), (nch,) int32 each — drop-in for chunk_stats_xla.
    """
    nch = x2.shape[0]
    thr = jnp.asarray(threshold, jnp.int32)
    flat = x2.reshape(-1)
    n = flat.shape[0]
    block = _R * _W
    pad = (-n) % block
    xp = jnp.pad(flat, (0, pad), constant_values=thr)
    xr = xp.reshape(-1, _W)
    nblocks = (n + pad) // block

    def kernel(thr_ref, x_ref, stat_ref, base_ref,
               seg_ref, ut_ref, lt_ref, carry_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            lane = jax.lax.broadcasted_iota(jnp.int32, (_W, _SEG), 0)
            segj = jax.lax.broadcasted_iota(jnp.int32, (_W, _SEG), 1)
            seg_ref[...] = ((lane >> 7) == segj).astype(jnp.float32)
            sa = jax.lax.broadcasted_iota(jnp.int32, (_SEG, _SEG), 0)
            sb = jax.lax.broadcasted_iota(jnp.int32, (_SEG, _SEG), 1)
            ut_ref[...] = (sa <= sb).astype(jnp.float32)
            ra = jax.lax.broadcasted_iota(jnp.int32, (_R, _R), 0)
            rb = jax.lax.broadcasted_iota(jnp.int32, (_R, _R), 1)
            lt_ref[...] = (ra > rb).astype(jnp.float32)
            carry_ref[0] = 0

        t = thr_ref[0]
        x = x_ref[...]
        # window encoding (chunk_stats_xla): d = clip(t - max(x, t-512),
        # 0, 256); non-matches contribute 0. Pack the match bit at 2^16:
        # a chunk's window sum can reach exactly 128·256 = 2^15, so a
        # 2^15 packing would overflow into the count field.
        d = t - jnp.maximum(x, t - 512)
        vclip = jnp.clip(d, 0, 256)
        packed = jnp.where(x < t, vclip + 65536, vclip).astype(jnp.float32)
        p = jax.lax.dot_general(
            packed, seg_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(jnp.int32)  # (R, SEG): cnt·2^16 + vsum, exact (< 2^24)
        cnt = p >> 16
        vs = jnp.minimum(p & 65535, 511)
        stat_ref[...] = cnt * 512 + vs

        cf = cnt.astype(jnp.float32)
        incl = jax.lax.dot_general(
            cf, ut_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # within-row inclusive prefix over the 16 chunk lanes
        totals = incl[:, _SEG - 1:]  # (R, 1)
        ro = jax.lax.dot_general(
            lt_ref[...], totals, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            # totals can reach R·SEG·128 = 2^19 — past bf16's 256
            # exact-int operand limit, so Mosaic's default-precision f32
            # dot would silently round it on device (the cumsum_pallas
            # truncation class, docs/performance.md). HIGHEST on an
            # (R, R) @ (R, 1) matvec is noise.
            precision=jax.lax.Precision.HIGHEST,
        )  # (R, 1) sum of earlier rows
        base_ref[...] = (
            incl.astype(jnp.int32) + ro.astype(jnp.int32)
            - cnt + carry_ref[0]
        )
        carry_ref[0] = carry_ref[0] + (
            incl[_R - 1, _SEG - 1] + ro[_R - 1, 0]
        ).astype(jnp.int32)

    thr_arr = jnp.full((1,), thr, jnp.int32)
    stat, base = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_R, _W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_R, _SEG), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_R, _SEG), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nblocks * _R, _SEG), jnp.int32),
            jax.ShapeDtypeStruct((nblocks * _R, _SEG), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((_W, _SEG), jnp.float32),
            pltpu.VMEM((_SEG, _SEG), jnp.float32),
            pltpu.VMEM((_R, _R), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
        interpret=interpret,
    )(thr_arr, xr)
    return stat.reshape(-1)[:nch], base.reshape(-1)[:nch]


@partial(jax.jit, static_argnames=("interpret",))
def chunk_stats_pallas(x2: jnp.ndarray, threshold, interpret: bool = False):
    """x2: (nch, 128) int32. Returns (stat, base): (nch,) int32 each —
    drop-in for chunk_stats_xla. Callers guarantee padding rows never
    match (filter_sparse overwrites the tail with ``threshold``); the
    kernel's own block padding uses ``threshold`` for the same reason.
    """
    nch = x2.shape[0]
    thr = jnp.asarray(threshold, jnp.int32)
    flat = x2.reshape(-1)
    n = flat.shape[0]
    block = _R * _W
    pad = (-n) % block
    xp = jnp.pad(flat, (0, pad), constant_values=thr)
    xr = xp.reshape(-1, _W)
    nblocks = (n + pad) // block

    def kernel(thr_ref, x_ref, out_ref, seg_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            lane = jax.lax.broadcasted_iota(jnp.int32, (_W, _SEG), 0)
            segj = jax.lax.broadcasted_iota(jnp.int32, (_W, _SEG), 1)
            seg_ref[...] = ((lane >> 7) == segj).astype(jnp.bfloat16)

        t = thr_ref[0]
        x = x_ref[...]
        m = (x < t).astype(jnp.bfloat16)  # 0/1 exact in bf16
        # window encoding: d = clip(t - max(x, t - 512), 0, 256) — integers
        # <= 256, exact in bf16; non-matches contribute 0
        d = t - jnp.maximum(x, t - 512)
        vclip = jnp.clip(d, 0, 256).astype(jnp.bfloat16)
        dims = (((1,), (0,)), ((), ()))
        cnt = jax.lax.dot_general(
            m, seg_ref[...], dimension_numbers=dims,
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)  # (R, SEG) per-chunk match counts, <= 128
        vs = jax.lax.dot_general(
            vclip, seg_ref[...], dimension_numbers=dims,
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)  # (R, SEG) per-chunk window sums, <= 2^15
        out_ref[...] = cnt * 512 + jnp.minimum(vs, 511)

    thr_arr = jnp.full((1,), thr, jnp.int32)
    out = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_R, _W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_R, _SEG), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblocks * _R, _SEG), jnp.int32),
        scratch_shapes=[pltpu.VMEM((_W, _SEG), jnp.bfloat16)],
        interpret=interpret,
    )(thr_arr, xr)
    stat = out.reshape(-1)[:nch]
    cnt = stat >> 9
    base = jnp.cumsum(cnt) - cnt
    return stat, base
