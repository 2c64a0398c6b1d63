"""Two-phase Pallas bitonic merge (round 5).

The jnp/XLA form of the bitonic merge (ops/bitonic.py) is mathematically
log2(N) passes but XLA materializes several intermediates per
compare-exchange stage: measured 101 ms (2-col) / 159 ms (3-col) at 2^25
on v5e (scripts/measure_r6.py d1) against a ~17 ms bandwidth model — the
stages do not fuse.

This kernel runs the SAME network in exactly TWO streaming HBM passes
via the FFT-style major/minor split. View the (N,) array as an (R, C)
matrix (row-major, C lanes):

  * global strides s >= C connect (r, j) <-> (r + s/C, j) — COLUMN
    work: pass 1 streams (R, 128) column tiles and runs the stride
    cascade R/2..1 along the sublane axis entirely in VMEM;
  * strides s < C stay inside a row — pass 2 streams (8, C) row blocks
    and runs the cascade C/2..1 along the lane axis.

Each stage is two static `pltpu.roll`s + selects per column; the
partner-side masks make wrapped elements unused, so the rolls need no
edge handling (same math as ops/bitonic.merge_bitonic's small-stride
path, verified against it in tests). Unsigned key order is preserved by
XOR-biasing the comparison columns to int32 inside the kernel (Mosaic's
signed compares are the safe path; payload columns ride unbiased).

Grid steps are independent in both passes (no cross-block carries), so
the pipeline overlaps DMA with compute freely.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIAS = np.int32(-0x80000000)  # XOR bias: uint32 order -> int32 order


def _exchange(cols, ncmp, stride, axis, size):
    """One compare-exchange stage on in-register blocks: partner values
    arrive by ±stride rolls along ``axis``; lo keeps min, hi keeps max
    of the (biased col0 [, col1]) lexicographic order."""
    idx = jax.lax.broadcasted_iota(jnp.int32, cols[0].shape, axis)
    is_lo = (idx & stride) == 0
    fwd = [pltpu.roll(c, size - stride, axis) for c in cols]
    bwd = [pltpu.roll(c, stride, axis) for c in cols]
    p = [jnp.where(is_lo, f, b) for f, b in zip(fwd, bwd)]

    def less(a_k, a_a, b_k, b_a):
        if ncmp >= 2:
            return (a_k < b_k) | ((a_k == b_k) & (a_a < b_a))
        return a_k < b_k

    a1 = p[1] if ncmp >= 2 else None
    b1 = cols[1] if ncmp >= 2 else None
    p_less = less(p[0], a1, cols[0], b1)
    me_less = less(cols[0], b1, p[0], a1)
    # selecting between two i1 vectors lowers to an i8->i1 trunc Mosaic
    # rejects — route the boolean select through int32
    take = jnp.where(
        is_lo, p_less.astype(jnp.int32), me_less.astype(jnp.int32)
    ) == 1
    return [jnp.where(take, pp, c) for pp, c in zip(p, cols)]


def _cascade(cols, ncmp, axis, size, max_stride):
    s = max_stride
    while s >= 1:
        cols = _exchange(cols, ncmp, s, axis, size)
        s //= 2
    return cols


def _phase_kernel(ncols, ncmp, cascades):
    """``cascades``: list of (axis, size, max_stride) run in order."""

    def kernel(*refs):
        ins = refs[:ncols]
        outs = refs[ncols:]
        cols = [r[...] for r in ins]
        for c in range(min(ncmp, ncols)):
            cols[c] = cols[c] ^ _BIAS
        for axis, size, max_stride in cascades:
            cols = _cascade(cols, ncmp, axis, size, max_stride)
        for c in range(ncols):
            if c < ncmp:
                cols[c] = cols[c] ^ _BIAS
            outs[c][...] = cols[c]

    return kernel


@partial(
    jax.jit, static_argnames=("num_cmp", "interpret", "lanes")
)
def merge_bitonic_pallas(cols, num_cmp: int = 2, interpret: bool = False,
                         lanes: int | None = None):
    """ops/bitonic.merge_bitonic semantics (sort a bitonic sequence under
    the lexicographic (col0[, col1]) uint32 order) in two streaming
    passes. N must be a power of two; small N falls back to the jnp
    network (same results)."""
    from .bitonic import merge_bitonic

    cols = tuple(cols)
    n = cols[0].shape[0]
    assert n & (n - 1) == 0
    ncols = len(cols)
    if lanes is None:
        # scoped-VMEM budget (measured OOMs, batch 5/6): the pass-2
        # block is (8, c_w) × ncols × ~4 buffers -> c_w = 16384 fits 2
        # columns, 8192 fits 3. Pass 2 also runs the sublane strides
        # (4c_w, 2c_w, c_w) inside its 8-row block, so pass 1 only
        # needs strides >= 8·c_w: its (r_h, 128) column blocks stay
        # small (r_h = n / 8c_w).
        lanes = 16384 if ncols <= 2 else 8192
    c_w = lanes
    c1 = 8 * c_w
    r_h = n // c_w
    if n < 2 * c1:  # too small for the two-pass split
        return merge_bitonic(cols, num_cmp=num_cmp)
    dtypes = [c.dtype for c in cols]
    cols2 = [
        jax.lax.bitcast_convert_type(c, jnp.int32).reshape(n // c1, c1)
        for c in cols
    ]

    # pass 1: column cascade over the (n/8c_w, 8c_w) view — global
    # strides n/2 .. 8c_w
    r1 = n // c1
    outs = pl.pallas_call(
        _phase_kernel(ncols, num_cmp, [(0, r1, r1 // 2)]),
        grid=(c1 // 128,),
        in_specs=[
            pl.BlockSpec((r1, 128), lambda g: (0, g),
                         memory_space=pltpu.VMEM)
        ] * ncols,
        out_specs=tuple(
            pl.BlockSpec((r1, 128), lambda g: (0, g),
                         memory_space=pltpu.VMEM)
            for _ in range(ncols)
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((r1, c1), jnp.int32)
            for _ in range(ncols)
        ),
        interpret=interpret,
    )(*cols2)
    outs = outs if isinstance(outs, tuple) else (outs,)

    # pass 2 on the (n/c_w, c_w) view: sublane strides 4..1 (global
    # 4c_w .. c_w) within each aligned 8-row block, then the lane
    # cascade (global c_w/2 .. 1)
    outs = tuple(o.reshape(r_h, c_w) for o in outs)
    outs = pl.pallas_call(
        _phase_kernel(ncols, num_cmp, [(0, 8, 4), (1, c_w, c_w // 2)]),
        grid=(r_h // 8,),
        in_specs=[
            pl.BlockSpec((8, c_w), lambda g: (g, 0),
                         memory_space=pltpu.VMEM)
        ] * ncols,
        out_specs=tuple(
            pl.BlockSpec((8, c_w), lambda g: (g, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(ncols)
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((r_h, c_w), jnp.int32)
            for _ in range(ncols)
        ),
        interpret=interpret,
    )(*outs)
    outs = outs if isinstance(outs, tuple) else (outs,)
    return tuple(
        jax.lax.bitcast_convert_type(o.reshape(n), dt)
        for o, dt in zip(outs, dtypes)
    )
