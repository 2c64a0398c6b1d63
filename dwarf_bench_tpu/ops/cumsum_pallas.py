"""MXU-based Pallas streaming inclusive cumsum.

XLA's long-array cumsum runs ~5.7 Grows/s on v5e (measured, 2^22); this
kernel rides the MXU instead of lane shuffles: per (128, W) block the
within-row inclusive prefix is ONE f32 matmul against an upper-triangular
ones matrix, cross-row offsets are a second tiny matmul against a strictly
lower-triangular matrix (no transposes — the row-totals column vector is
consumed as-is), and a carry scalar in SMEM links the sequential grid.

Exactness: f32 MXU accumulation is exact for integer partials < 2^24, so
the PRECONDITION is that every 131072-element block's running partial sums
stay < 2^24 in magnitude (callers must guarantee this). The counting
sort's run-expansion input (ops/sort._expand_runs) sums to 16384 GLOBALLY,
so it always qualifies. Cross-block carry is int32 and wraps mod 2^32
exactly like jnp.cumsum on int32.

``carry_init`` folds an affine shift into the same pass (the counting sort
passes minv - 1 so out = cumsum(s) - 1 + minv costs nothing extra).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_R = 128
_W = 1024


@partial(jax.jit, static_argnames=("interpret", "two_plane"))
def cumsum_pallas(
    x: jnp.ndarray, carry_init=0, interpret: bool = False,
    two_plane: bool = True,
) -> jnp.ndarray:
    """Inclusive int32 cumsum of a 1D int32/int16/int8 column, plus
    ``carry_init``. PRECONDITIONS: -2^15 <= x < 2^15 elementwise (the
    sign-preserving two-bf16-plane operand split below covers int16
    range — or |x| <= 255 with ``two_plane=False``, which skips the
    second plane dot; ops/sort._expand_runs dispatches on the max
    boundary multiplicity it derives from the histogram's zero runs),
    and every 131072-element block sums to < 2^24 in magnitude.

    Narrow (int8/int16) inputs are accepted but MEASURED SLOWER on v5e:
    the sub-32-bit VMEM load + cast lowers as a relayout that cost 3x
    the full-width kernel (0.448 vs 0.150 ms at 2^22 with int8 input,
    scripts/measure_r4.py g5) — callers should pass int32; the narrow
    path is kept as the documented negative result."""
    n = x.shape[0]
    block = _R * _W
    pad = (-n) % block
    xp = jnp.pad(
        x if x.dtype in (jnp.int8, jnp.int16) else x.astype(jnp.int32),
        (0, pad),
    )
    x2 = xp.reshape(-1, _W)  # row r of a block = r-th consecutive W-chunk
    nblocks = (n + pad) // block
    init = jnp.full((1,), carry_init, jnp.int32)

    def kernel(init_ref, x_ref, out_ref, ut_ref, lt_ref, carry_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            # UT[a, b] = 1 if a <= b (inclusive prefix); LT[a, b] = 1 if
            # a > b (strictly lower: row offsets = sums of earlier rows)
            ra = jax.lax.broadcasted_iota(jnp.int32, (_W, _W), 0)
            rb = jax.lax.broadcasted_iota(jnp.int32, (_W, _W), 1)
            ut_ref[...] = (ra <= rb).astype(jnp.float32)
            sa = jax.lax.broadcasted_iota(jnp.int32, (_R, _R), 0)
            sb = jax.lax.broadcasted_iota(jnp.int32, (_R, _R), 1)
            lt_ref[...] = (sa > sb).astype(jnp.float32)
            carry_ref[0] = init_ref[0]

        xi = x_ref[...].astype(jnp.int32)  # (R, W)
        # within-row inclusive prefix. Mosaic's DEFAULT-precision f32
        # dot truncates operands to bf16 (8-bit mantissa), and input
        # values CAN exceed 255: the counting sort's boundary column
        # carries one multiplicity per run of empty bins — thousands in
        # degenerate distributions. Split into two 8-bit planes (each
        # exact in bf16; the UT side is 0/1): two cheap dots instead of
        # one 6-pass HIGHEST dot on the big operand.
        dims = (((1,), (0,)), ((), ()))
        if two_plane:
            lo = (xi & 0xFF).astype(jnp.float32)
            # arithmetic shift keeps the sign in the hi plane: x =
            # 256·hi + lo for any |x| < 2^15, hi in [-128, 127] (exact
            # in bf16)
            hi = (xi >> 8).astype(jnp.float32)
            pc = jax.lax.dot_general(
                lo, ut_ref[...], dimension_numbers=dims,
                preferred_element_type=jnp.float32,
            ) + 256.0 * jax.lax.dot_general(
                hi, ut_ref[...], dimension_numbers=dims,
                preferred_element_type=jnp.float32,
            )
        else:
            pc = jax.lax.dot_general(
                xi.astype(jnp.float32), ut_ref[...],
                dimension_numbers=dims,
                preferred_element_type=jnp.float32,
            )
        totals = pc[:, _W - 1 :]  # (R, 1) row sums
        # HIGHEST is REQUIRED here: Mosaic's default f32 dot truncates
        # operands to bf16, and row totals exceed 256 (bf16's exact-int
        # limit) whenever one 131072-block holds > 256 boundary markers
        # — true for every small-n counting sort. The silent one-off
        # run shifts were caught by the first TPU small-grid radix
        # sweep (0/9 valid at 25600). The matvec is (R, R) @ (R, 1) —
        # the 6-pass cost is noise.
        ro = jax.lax.dot_general(
            lt_ref[...], totals,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (R, 1) sum of EARLIER rows
        out_ref[...] = (
            pc.astype(jnp.int32) + ro.astype(jnp.int32) + carry_ref[0]
        )
        block_total = (pc[_R - 1, _W - 1] + ro[_R - 1, 0]).astype(jnp.int32)
        carry_ref[0] = carry_ref[0] + block_total

    out = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_R, _W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_R, _W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x2.shape, jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((_W, _W), jnp.float32),
            pltpu.VMEM((_R, _R), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
        interpret=interpret,
    )(init, x2)
    return out.reshape(-1)[:n]
