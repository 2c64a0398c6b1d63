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


def _phase_kernel(ncols, ncmp, axis, size, max_stride):
    def kernel(*refs):
        ins = refs[:ncols]
        outs = refs[ncols:]
        cols = [r[...] for r in ins]
        for c in range(min(ncmp, ncols)):
            cols[c] = cols[c] ^ _BIAS
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
    if n < (1 << 17):
        return merge_bitonic(cols, num_cmp=num_cmp)
    ncols = len(cols)
    if lanes is None:
        lanes = max(16384, n // 2048)
    c_w = lanes
    r_h = n // c_w
    dtypes = [c.dtype for c in cols]
    cols2 = [
        jax.lax.bitcast_convert_type(c, jnp.int32).reshape(r_h, c_w)
        for c in cols
    ]

    # pass 1: column cascade (global strides n/2 .. c_w)
    outs = pl.pallas_call(
        _phase_kernel(ncols, num_cmp, 0, r_h, r_h // 2),
        grid=(c_w // 128,),
        in_specs=[
            pl.BlockSpec((r_h, 128), lambda g: (0, g),
                         memory_space=pltpu.VMEM)
        ] * ncols,
        out_specs=tuple(
            pl.BlockSpec((r_h, 128), lambda g: (0, g),
                         memory_space=pltpu.VMEM)
            for _ in range(ncols)
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((r_h, c_w), jnp.int32)
            for _ in range(ncols)
        ),
        interpret=interpret,
    )(*cols2)
    outs = outs if isinstance(outs, tuple) else (outs,)

    # pass 2: lane cascade (strides c_w/2 .. 1) per row
    outs = pl.pallas_call(
        _phase_kernel(ncols, num_cmp, 1, c_w, c_w // 2),
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
