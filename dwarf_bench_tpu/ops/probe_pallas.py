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


@partial(jax.jit, static_argnames=("hi_rows", "stack", "interpret"))
def probe_dense_cat_pallas(
    packed3: jnp.ndarray,
    base128: jnp.ndarray,
    ki: jnp.ndarray,
    hi_rows: int = 128,
    stack: int = 1,
    interpret: bool = False,
):
    """Round-4 fused probe: scaled-plane CONCATENATION makes ONE
    default-precision bf16 dot produce the fully-combined 24-bit value.

    The HIGHEST-precision single-f32-dot form (probe_dense_rel_pallas
    below) pays ~6 bf16 MXU passes; separate 8-bit plane dots pay 3 but
    triple the stage-2 selects. This kernel gets 3 passes AND one select:
    bf16 represents ``v · 2^k`` exactly for v ≤ 255, so the three 8-bit
    planes PRE-SCALED by 2^(8p) stack along the contraction dim —
    ``Tcat[(128 lo + 1), 3·hi_rows]`` — and the dot against the hi one-hot
    REPLICATED 3× combines the planes inside the f32 accumulator (sums
    < 2^24: exact) with zero VPU combine. Row 128 of the output carries
    ``base128``'s scaled planes, so the per-bucket base ride the SAME dot
    (no separate matvec). Stage 2 is one select: ``rel = ones @ (B[:128]
    ⊙ oh_lo)`` at HIGHEST (one nonzero per column, < 2^24 — exact).

    Semantics identical to probe_dense_rel_pallas / csr_join.probe_dense's
    rel path: ``ki`` int32 min-shifted keys; out-of-range (negative,
    >= hi_rows·128) → (0, 0); pos = 0 where cnt == 0.
    ``hi_rows`` < 128 is the range-aware fast path (valid keys must be
    < hi_rows·128 — the hi80 asymmetry of the histogram/probe family).
    ``stack`` batches that many query rows per dot along the N (lane)
    dimension — the per-row dots are MXU issue-bound (j1/j2,
    scripts/measure_r5.py).

    Reference parity: omnisci_hashtable.hpp:149-192 (JoinOneToMany probe).
    """
    h = hi_rows
    assert _ROWS % stack == 0
    n = ki.shape[0]
    block = _ROWS * _W
    pad = (-n) % block
    kp = jnp.pad(ki.astype(jnp.int32), (0, pad),
                 constant_values=np.int32(-1))
    k2 = kp.reshape(-1, _W)
    nblocks = (n + pad) // block
    t = packed3.astype(jnp.uint32)[: h * 128].reshape(h, 128)
    # TcatT: (129, 3h) bf16 — row l holds [plane0[:,l], 256·plane1[:,l],
    # 65536·plane2[:,l]]; row 128 holds base128's scaled planes.
    cols = []
    bv = base128.astype(jnp.uint32)[:h].reshape(h, 1)
    for p in range(3):
        pl_mat = ((t >> (8 * p)) & 0xFF).astype(jnp.float32)
        pb = ((bv >> (8 * p)) & 0xFF).astype(jnp.float32)
        cols.append(
            jnp.concatenate([pl_mat, pb], axis=1)
            * np.float32(1 << (8 * p))
        )
    # interpret mode (CPU CI) lacks a bf16 DotThunk; f32 there is a
    # superset of bf16's exactness (operands are v·2^8p, v <= 255)
    mdt = jnp.float32 if interpret else jnp.bfloat16
    tcat_t = jnp.concatenate(cols, axis=0).T.astype(mdt)
    # (129, 3h): [:, p·h + j] = plane_p[j, l] · 2^(8p)

    def kernel(t_ref, k_ref, pos_ref, cnt_ref, ones_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            ones_ref[...] = jnp.ones((1, 128), jnp.float32)

        L = _W * stack
        iota3 = jax.lax.broadcasted_iota(jnp.int32, (3 * h, L), 0)
        iota_mod = iota3 - (iota3 // h) * h  # hi-digit iota tiled 3x
        iota_l = jax.lax.broadcasted_iota(jnp.int32, (128, L), 0)
        hp = jax.lax.Precision.HIGHEST
        for r0 in range(0, _ROWS, stack):
            his, los = [], []
            for r in range(r0, r0 + stack):
                row = k_ref[r, :].reshape(1, _W)
                bad = row.astype(jnp.uint32) >= jnp.uint32(h * 128)
                his.append(jnp.where(bad, np.int32(h), row >> 7))
                los.append(row & 127)
            hiw = his[0] if stack == 1 else jnp.concatenate(his, axis=1)
            low = los[0] if stack == 1 else jnp.concatenate(los, axis=1)
            oh3 = (jnp.broadcast_to(hiw, (3 * h, L)) == iota_mod).astype(
                mdt
            )
            b = jax.lax.dot_general(
                t_ref[...], oh3,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (129, L): rows 0..127 = packed3[k], row 128 = base128[hi]
            oh_lo = (jnp.broadcast_to(low, (128, L)) == iota_l).astype(
                jnp.float32
            )
            rel = jax.lax.dot_general(
                ones_ref[...], b[:128, :] * oh_lo,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=hp,
            ).astype(jnp.int32)  # (1, L) packed3[k]
            base = b[128:129, :].astype(jnp.int32)
            cnt = rel & 1023
            pos = jnp.where(cnt > 0, base + (rel >> 10), 0)
            for j in range(stack):
                sl = slice(j * _W, (j + 1) * _W)
                pos_ref[r0 + j, :] = pos[0, sl]
                cnt_ref[r0 + j, :] = cnt[0, sl]

    pos, cnt = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
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
    )(tcat_t, k2)
    return pos.reshape(-1)[:n], cnt.reshape(-1)[:n]


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
