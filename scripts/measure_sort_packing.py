"""Micro-facts for the join pair-sort leverage (docs/performance.md #1).

The CSR-join build's bound is ONE unstable 2-operand lax.sort of
(u16 key, u32 id) at 2^20 (~1.09 ms measured). Ideas to beat it all reduce
to single-operand sorts after bit-packing:

  a) flat single-op u32 sort (what a packed sort would cost, lower bound —
     NOTE: ids are masked to 18 bits, which at N=2^20 silently drops the
     top 2 id bits, so the output is a TIMING bound only, not a usable
     sort result);
  b) batched (4, 2^18) single-op u32: key(14b) << 18 | local_id(18b) packs
     EXACTLY into u32 when rows are pre-split into 4 contiguous segments —
     yields 4 key-grouped segments that still need a merge;
  c) the current 2-op unstable (u16, u32) baseline, re-measured.

Prints one line per measurement.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dwarf_bench_tpu.utils.timing import time_amortized

N = 1 << 20


def main():
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print("device:", dev)
    keys16 = jax.device_put(
        rng.integers(1, 10000, N, endpoint=True).astype(np.uint16), dev
    )
    ids = jax.device_put(np.arange(N, dtype=np.uint32), dev)

    @jax.jit
    def pair_sort(k, i):
        return jax.lax.sort((k, i), num_keys=1, is_stable=False)

    @jax.jit
    def packed_flat(k, i):
        p = (k.astype(jnp.uint32) << 18) | (i & jnp.uint32((1 << 18) - 1))
        return jax.lax.sort((p,), is_stable=False)

    @jax.jit
    def packed_batched(k, i):
        p = (k.astype(jnp.uint32) << 18) | (i & jnp.uint32((1 << 18) - 1))
        return jax.lax.sort(
            (p.reshape(4, N // 4),), dimension=1, is_stable=False
        )

    t = time_amortized(pair_sort, keys16, ids, k=12)
    print(f"2-op (u16,u32) unstable flat : {t * 1e3:.4f} ms")
    t = time_amortized(packed_flat, keys16, ids, k=12)
    print(f"1-op u32 unstable flat       : {t * 1e3:.4f} ms")
    t = time_amortized(packed_batched, keys16, ids, k=12)
    print(f"1-op u32 unstable (4, 2^18)  : {t * 1e3:.4f} ms")


if __name__ == "__main__":
    main()
