"""Fused Pallas probe for the dense CSR join (bucket-relative 3-plane).

The XLA probe (ops/mxu_gather.gather_16k_rel) is already MXU-formulated —
one f32 table matmul at Precision.HIGHEST + a base matvec — but each stage
materializes its (tile, 128) intermediates to HBM and the one-hot
construction, select and reduction run as separate XLA kernels. This kernel
fuses the whole lookup per 2048-query row in VMEM:

    oh_hi (128, W)   lane-major hi-digit one-hot (f32: shares the int32
                     compare's (8, 128) native layout — no i1 relayout)
    R = T^T-contract: dot_general(T (128h, 128l), oh_hi, contract h)
                     -> (128l, W), Precision.HIGHEST (exact: T < 2^24)
    rel = ones (1, 128) @ (R * oh_lo)  — one-nonzero-per-column select,
                     HIGHEST keeps the 24-bit products exact
    base = base128 (1, 128) @ oh_hi    — HIGHEST, base < 2^24

so the VPU one-hot work overlaps the MXU plane matmul instead of
serializing with it, and nothing but the two (8, W) int32 results touches
HBM. Semantics match csr_join.probe_dense's rel path: out-of-range queries
(uint32 >= 2^14 after the min-shift, incl. EMPTY padding) route the hi
digit past every one-hot row and return (pos=0, cnt=0); ``found`` is
exactly ``cnt > 0`` (absent in-range keys have cnt == 0 in the table).

Reference parity: omnisci_hashtable.hpp:149-192 (JoinOneToMany probe).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 8
_W = 2048
_RANGE = 1 << 14


@partial(jax.jit, static_argnames=("interpret",))
def probe_dense_rel_pallas(
    packed3: jnp.ndarray,
    base128: jnp.ndarray,
    ki: jnp.ndarray,
    interpret: bool = False,
):
    """(pos, cnt) int32 per query: pos = base128[k >> 7] + (packed3[k] >>
    10), cnt = packed3[k] & 1023, with (0, 0) for out-of-range k. ``ki``:
    int32 min-shifted keys, invalid rows < 0 or >= 2^14."""
    n = ki.shape[0]
    block = _ROWS * _W
    pad = (-n) % block
    kp = jnp.pad(ki.astype(jnp.int32), (0, pad), constant_values=np.int32(-1))
    k2 = kp.reshape(-1, _W)
    nblocks = (n + pad) // block
    t = packed3.astype(jnp.float32).reshape(128, 128)
    bvec = base128.astype(jnp.float32).reshape(1, 128)

    def kernel(t_ref, b_ref, k_ref, pos_ref, cnt_ref, ones_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            ones_ref[...] = jnp.ones((1, 128), jnp.float32)

        iota = jax.lax.broadcasted_iota(jnp.int32, (128, _W), 0)
        hp = jax.lax.Precision.HIGHEST
        for r in range(_ROWS):
            row = k_ref[r, :].reshape(1, _W)
            # uint32 >= 2^14 (negatives, EMPTY padding) -> hi = 128: no
            # one-hot row matches, rel and base come out 0
            bad = row.astype(jnp.uint32) >= jnp.uint32(_RANGE)
            hi = jnp.where(bad, np.int32(128), row >> 7)
            lo = row & 127
            oh_hi = (jnp.broadcast_to(hi, (128, _W)) == iota).astype(
                jnp.float32
            )
            oh_lo = (jnp.broadcast_to(lo, (128, _W)) == iota).astype(
                jnp.float32
            )
            rmat = jax.lax.dot_general(
                t_ref[...], oh_hi,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=hp,
            )  # (128 lo, W): T[hi_j, :] broadcast down each query column
            rel = jax.lax.dot_general(
                ones_ref[...], rmat * oh_lo,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=hp,
            ).astype(jnp.int32)  # (1, W) packed3[k]
            base = jax.lax.dot_general(
                b_ref[...], oh_hi,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=hp,
            ).astype(jnp.int32)  # (1, W) base128[hi]
            cnt = rel & 1023
            pos = jnp.where(cnt > 0, base + (rel >> 10), 0)
            pos_ref[r, :] = pos.reshape(_W)
            cnt_ref[r, :] = cnt.reshape(_W)

    pos, cnt = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, _W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_ROWS, _W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, _W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(k2.shape, jnp.int32),
            jax.ShapeDtypeStruct(k2.shape, jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((1, 128), jnp.float32)],
        interpret=interpret,
    )(t, bvec, k2)
    return pos.reshape(-1)[:n], cnt.reshape(-1)[:n]
