"""Full sort of integer columns.

Reference: sort/radix.cpp:34 delegates to oneDPL ``std::sort`` on device (the
"Radix" name notwithstanding) and sort/tbbsort.cpp:22 to TBB parallel_sort on
host. The TPU baseline is XLA's optimized variadic sort (``jax.lax.sort``);
a hand-written Pallas LSD radix sort lives in sort_pallas.py for the hot
path. Behavior: ascending full sort of an int32 column.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def sort_xla(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.sort(x)


def sort_oracle(x) -> np.ndarray:
    """std::sort oracle (sort/radix.cpp:8-13)."""
    return np.sort(np.asarray(x), kind="stable")
