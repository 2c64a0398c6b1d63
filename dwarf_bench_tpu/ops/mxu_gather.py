"""Small-table gather on the MXU (one-hot matmul lookup).

1D random gathers are serialized on TPU (~0.1 Gelem/s measured — see
docs/performance.md), which makes every table lookup in the join/groupby
probe paths a scalar loop in disguise. For tables of up to 2^14 entries the
lookup can instead ride the systolic array: split the table index into
hi/lo 7-bit digits, and for each 8-bit value plane p of the table (values
≤ 255 are exact in bf16) compute per tile

    A   = onehot_hi (T, 128) @ plane[hi, lo] (128, 128)   -> (T, 128)
    out = rowsum(A * onehot_lo)                            -> (T,)

Each output element is a single product of exact bf16 operands accumulated
in f32, so the lookup is bit-exact for any int32/uint32 table. Cost is
N * 16384 MACs per plane — ~0.1 ms per plane at 2^20 on one v5e core,
versus ~10 ms for the serialized gather.

This is the TPU re-derivation of the reference's O(1) probe into its
count/position buffers (common/dpcpp/omnisci_hashtable.hpp:149-192): the
"random access" becomes a dense matmul against the whole (small) table.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_TILE = 8192
_K = 1 << 14  # table capacity: two 7-bit digits


@partial(jax.jit, static_argnames=("planes",))
def gather_16k(table: jnp.ndarray, idx: jnp.ndarray, planes: int = 4):
    """out[i] = table[idx[i]] for idx in [0, len(table)); out-of-range
    indices (negative or >= 2^14) return 0.

    ``table``: (K,) int32/uint32, K <= 16384.  ``planes``: number of 8-bit
    value planes to reconstruct — 4 covers any 32-bit value; callers with
    bounded tables (e.g. positions < 2^24) can pass fewer to save matmuls.
    """
    k = table.shape[0]
    assert k <= _K, f"table too large for MXU gather: {k}"
    t = jnp.pad(table.astype(jnp.uint32), (0, _K - k)).reshape(128, 128)

    n = idx.shape[0]
    pad = (-n) % _TILE
    # padding indexes out of range -> contributes 0
    ip = jnp.pad(idx.astype(jnp.int32), (0, pad), constant_values=np.int32(-1))
    it = ip.reshape(-1, _TILE)
    cols = jnp.arange(128, dtype=jnp.int32)
    plane_mats = [
        ((t >> (8 * p)) & 0xFF).astype(jnp.bfloat16) for p in range(planes)
    ]

    def tile_lookup(it_i):
        hi = it_i >> 7
        lo = it_i & 127
        oh_hi = (hi[:, None] == cols[None, :]).astype(jnp.bfloat16)
        oh_lo = (lo[:, None] == cols[None, :]).astype(jnp.float32)
        out = jnp.zeros((_TILE,), jnp.uint32)
        for p, mat in enumerate(plane_mats):
            a = jnp.dot(oh_hi, mat, preferred_element_type=jnp.float32)
            v = jnp.sum(a * oh_lo, axis=1)
            out = out + (v.astype(jnp.uint32) << (8 * p))
        return out

    out = jax.vmap(tile_lookup)(it).reshape(-1)[:n]
    return out.astype(table.dtype)
