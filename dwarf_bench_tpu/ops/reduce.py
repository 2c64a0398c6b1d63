"""Sum reduction.

Reference: reduce/reduce.cpp:50-61 — SYCL work-group tree reduction via
``sycl::reduction``. int32 accumulation wraps mod 2^32 exactly like the
reference's ``int`` sum — addition is commutative/associative modulo 2^32
so reduction order does not affect the result, and the numpy oracle
matches bit-exactly.

Two engines: XLA ``jnp.sum`` (measured 259 GB/s read on v5e — the compiler
reduction does not saturate HBM) and a streaming Pallas kernel (big VMEM
blocks, a lane-parallel (8, 128) int32 accumulator across the sequential
grid, one final in-register tree) that is the per-chip roofline sanity
check (SURVEY.md §7 build plan 2b).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_R = 256  # sublanes per block: 256 x 2048 x 4 B = 2 MB VMEM blocks
_W = 2048


@jax.jit
def reduce_sum_xla(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(x)


@partial(jax.jit, static_argnames=("interpret",))
def reduce_sum_pallas(x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Streaming int32 sum at HBM bandwidth. Padding contributes zeros."""
    n = x.shape[0]
    block = _R * _W
    pad = (-n) % block
    xp = jnp.pad(x.astype(jnp.int32), (0, pad))
    x2 = xp.reshape(-1, _W)
    nblocks = (n + pad) // block

    def kernel(x_ref, out_ref, acc_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_ref[...] = jnp.zeros((8, _W), jnp.int32)

        # lane+sublane-parallel partial sums; int32 wraps like the oracle
        acc = acc_ref[...]
        for r in range(_R // 8):
            acc = acc + x_ref[r * 8 : (r + 1) * 8, :]
        acc_ref[...] = acc

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            out_ref[0, 0] = jnp.sum(acc_ref[...], dtype=jnp.int32)

    out = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((_R, _W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        scratch_shapes=[pltpu.VMEM((8, _W), jnp.int32)],
        interpret=interpret,
    )(x2)
    return out[0, 0]


def reduce_sum(x: jnp.ndarray) -> jnp.ndarray:
    """Best engine for the backend (trace-time choice).

    Round 4's honest device-looped timing INVERTED the round-1 queue-k
    verdict: XLA's fused reduce runs at the HBM read bound (0.074 ms at
    2^24 on v5e) while the hand-written Pallas streamer is ~3x slower
    (0.22 ms) — the old '755 vs 259 GB/s' readings were per-call
    dispatch artifacts (scripts/measure_r5.py d6/d7,
    docs/performance.md round 4). XLA everywhere."""
    return reduce_sum_xla(x)


def reduce_oracle(x) -> int:
    """std::accumulate with int accumulator (reduce/reduce.cpp:10-22)."""
    return int(np.sum(np.asarray(x, dtype=np.int32), dtype=np.int32))
