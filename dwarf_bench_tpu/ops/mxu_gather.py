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


@partial(jax.jit, static_argnames=("planes", "plane_dtype"))
def gather_16k(
    table: jnp.ndarray,
    idx: jnp.ndarray,
    planes: int = 4,
    plane_dtype: str = "bf16",
):
    """out[i] = table[idx[i]] for idx in [0, len(table)); out-of-range
    indices (negative or >= 2^14) return 0.

    ``table``: (K,) int32/uint32, K <= 16384.  ``planes``: number of value
    planes to reconstruct; callers with bounded tables (e.g. positions
    < 2^24) can pass fewer to save matmuls.  ``plane_dtype``: "bf16" uses
    8-bit planes (values <= 255 exact in bf16); "int8" uses 7-bit planes on
    the int8 MXU path (2x bf16 throughput on v5e), so ``planes`` 7-bit
    planes cover ``7 * planes`` bits.
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
    if plane_dtype == "int8":
        bits, mdt, adt = 7, jnp.int8, jnp.int32
    else:
        bits, mdt, adt = 8, jnp.bfloat16, jnp.float32
    mask = (1 << bits) - 1
    plane_mats = [
        ((t >> (bits * p)) & mask).astype(mdt) for p in range(planes)
    ]

    def tile_lookup(it_i):
        hi = it_i >> 7
        lo = it_i & 127
        oh_hi = (hi[:, None] == cols[None, :]).astype(mdt)
        oh_lo = (lo[:, None] == cols[None, :]).astype(adt)
        out = jnp.zeros((_TILE,), jnp.uint32)
        for p, mat in enumerate(plane_mats):
            a = jnp.dot(oh_hi, mat, preferred_element_type=adt)
            v = jnp.sum(a * oh_lo, axis=1)
            out = out + (v.astype(jnp.uint32) << (bits * p))
        return out

    out = jax.vmap(tile_lookup)(it).reshape(-1)[:n]
    return out.astype(table.dtype)


@partial(jax.jit, static_argnames=("engine", "hi_rows"))
def gather_16k_rel(
    packed3: jnp.ndarray,
    base128: jnp.ndarray,
    idx: jnp.ndarray,
    engine: str = "f32",
    hi_rows: int = 128,
):
    """Bucket-relative lookup: out[i] = (base128[idx[i] >> 7],
    packed3[idx[i]]) with packed3 values < 2^24 and base128 values < 2^24.
    Out-of-range idx -> (0, 0).

    This is the 3-plane probe layout for the dense CSR join: pos relative to
    the 128-key bucket base fits 14 bits and the count 10, so (rel << 10 |
    cnt) needs 24 bits instead of the 32 the absolute (pos << 12 | cnt)
    packing needs. The bucket base rides three MXU MATVECS against the
    hi-digit one-hot (128 MACs/elem — noise next to the 16384/plane) rather
    than a VPU one-hot select (which measured as costly as a whole plane).

    ``engine`` selects the plane formulation (explicit string — a silent
    fall-through between forms caused a round-3 advisor finding):
      * ``"f32"`` (default, the measured winner): the three 8-bit planes
        fold into ONE f32 matmul at Precision.HIGHEST — identical MXU work
        (f32 = 3 bf16 passes) but a third of the VPU select passes. Exact
        because every product is onehot * v with v < 2^24 and the bf16x3
        operand split carries 24 mantissa bits.
      * ``"bf16_planes"``: three separate 8-bit bf16 plane matmuls.
      * ``"int8"``: four 7-bit planes on the int8 MXU path (measured
        SLOWER end to end — the stage-2 selects dominate, measure_r4 g6).

    ``hi_rows`` < 128 shrinks the table to its populated hi-digit rows
    (range-aware, like the hi80 histogram): valid indices must then be
    < hi_rows·128 — stage-1 MACs scale with hi_rows (a [1, 10000] key
    span pays 80/128 of the full-table matmul). Out-of-range indices
    still return (0, 0): their hi digit matches no one-hot column.
    """
    t = packed3.astype(jnp.uint32)[: hi_rows * 128].reshape(hi_rows, 128)

    n = idx.shape[0]
    pad = (-n) % _TILE
    ip = jnp.pad(idx.astype(jnp.int32), (0, pad), constant_values=np.int32(-1))
    it = ip.reshape(-1, _TILE)
    cols = jnp.arange(hi_rows, dtype=jnp.int32)
    cols_lo = jnp.arange(128, dtype=jnp.int32)
    # ONE f32 matvec at HIGHEST precision: exact for base < 2^24 (one-hot
    # times a bf16x3-split operand carries 24 mantissa bits), and 128
    # MACs/elem is noise next to the 16384/plane of the table matmul
    base_vec = base128.astype(jnp.float32)[:hi_rows, None]
    assert engine in ("f32", "bf16_planes", "int8"), engine
    if engine == "int8":
        # four 7-bit int8 planes (values < 2^24 -> ceil(24/7) = 4): the
        # int8 MXU path trades plane count for rate; stage-2 recombines
        # the plane selections with shifts (measured A/B vs the f32 form
        # in scripts/measure_r4.py g6)
        plane_mats = [
            ((t >> (7 * p)) & 0x7F).astype(jnp.int8) for p in range(4)
        ]
    elif engine == "f32":
        plane_mats = [t.astype(jnp.float32)]
    else:
        plane_mats = [
            ((t >> (8 * p)) & 0xFF).astype(jnp.bfloat16) for p in range(3)
        ]

    def tile_lookup(it_i):
        hi = it_i >> 7
        lo = it_i & 127
        if engine == "int8":
            oh_hi8 = (hi[:, None] == cols[None, :]).astype(jnp.int8)
            oh_lo32 = (lo[:, None] == cols_lo[None, :]).astype(jnp.int32)
            rel = jnp.zeros((_TILE,), jnp.uint32)
            for p, mat in enumerate(plane_mats):
                a = jax.lax.dot_general(
                    oh_hi8, mat, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                v = jnp.sum(a * oh_lo32, axis=1)
                rel = rel + (v.astype(jnp.uint32) << (7 * p))
            oh_hi = (hi[:, None] == cols[None, :]).astype(jnp.bfloat16)
            b = jnp.dot(
                oh_hi.astype(jnp.float32), base_vec,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )[:, 0]
            return rel, b.astype(jnp.int32)
        oh_hi = (hi[:, None] == cols[None, :]).astype(jnp.bfloat16)
        oh_lo = (lo[:, None] == cols_lo[None, :]).astype(jnp.float32)
        if engine == "f32":
            a = jnp.dot(
                oh_hi.astype(jnp.float32),
                plane_mats[0],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            rel = jnp.sum(a * oh_lo, axis=1).astype(jnp.uint32)
        else:
            rel = jnp.zeros((_TILE,), jnp.uint32)
            for p, mat in enumerate(plane_mats):
                a = jnp.dot(oh_hi, mat, preferred_element_type=jnp.float32)
                v = jnp.sum(a * oh_lo, axis=1)
                rel = rel + (v.astype(jnp.uint32) << (8 * p))
        b = jnp.dot(
            oh_hi.astype(jnp.float32),
            base_vec,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )[:, 0]
        return rel, b.astype(jnp.int32)

    rel, b = jax.vmap(tile_lookup)(it)
    return rel.reshape(-1)[:n], b.reshape(-1)[:n]
