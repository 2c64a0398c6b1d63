"""Sum reduction.

Reference: reduce/reduce.cpp:50-61 — SYCL work-group tree reduction via
``sycl::reduction``. On TPU a full reduction is a single XLA ``reduce`` that
tiles HBM→VMEM and runs at memory bandwidth; no hand-written tree needed.
int32 accumulation wraps mod 2^32 exactly like the reference's ``int`` sum —
addition is commutative/associative modulo 2^32 so reduction order does not
affect the result, and the numpy oracle matches bit-exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def reduce_sum(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(x)


def reduce_oracle(x) -> int:
    """std::accumulate with int accumulator (reduce/reduce.cpp:10-22)."""
    return int(np.sum(np.asarray(x, dtype=np.int32), dtype=np.int32))
