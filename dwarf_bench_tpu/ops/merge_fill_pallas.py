"""Fused fill pass for the bitonic merge probe (round 5).

After the merge, the probe needs three global scans over the 2^25-element
merged order — cumsum of value deltas, carry-last-source-key, and a
seen-any-source guard — plus the found/dest/value glue. As separate XLA
ops these cost ~38 ms at 2^25 on v5e (cummax alone 24 ms,
scripts/measure_r6.py d1); this kernel computes everything in ONE
streaming pass (~2 HBM-BW ms): per (8, C) block, Hillis–Steele lane
scans + a tiny cross-row scan, with the running (sum, max) carries in
SMEM across the sequential grid.

Scan-fusion trick: the separate "seen any source" guard disappears by
scanning ``max(key + 1)`` instead of ``max(key)`` — carry 0 means "no
source yet", and an EMPTY source (key+1 wraps to 0) is absorbed by the
max. found = carry == query_key + 1. All comparisons run on int32 with
the unsigned XOR bias.

Outputs (dest, val): dest = (query_index << 1) | found for real query
rows, 0xFFFFFFFF elsewhere (sorts last / compacts away); val = the
matched table value (mod 2^16 in val16 mode) or 0.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_C = 4096
_R = 8
_MIN32 = np.int32(-0x80000000)


def _hillis(x, op, identity, size, axis):
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    s = 1
    while s < size:
        shifted = pltpu.roll(x, s, axis)
        x = op(x, jnp.where(lane >= s, shifted, identity))
        s *= 2
    return x


@partial(
    jax.jit,
    static_argnames=("nq", "val16", "membership", "interpret"),
)
def merge_fill_pallas(
    sk: jnp.ndarray,
    sa: jnp.ndarray,
    dv: jnp.ndarray | None,
    nq: int,
    val16: bool = False,
    membership: bool = False,
    interpret: bool = False,
):
    n = sk.shape[0]
    block = _R * _C
    assert n % block == 0, "merged length is a power of two >= 2^15"
    nblocks = n // block
    use_dv = dv is not None and not (val16 or membership)
    ki = jax.lax.bitcast_convert_type(sk, jnp.int32).reshape(-1, _C)
    ai = jax.lax.bitcast_convert_type(sa, jnp.int32).reshape(-1, _C)
    ins = [ki, ai]
    if use_dv:
        ins.append(
            jax.lax.bitcast_convert_type(dv, jnp.int32).reshape(-1, _C)
        )

    def kernel(*refs):
        k_ref, a_ref = refs[0], refs[1]
        dv_ref = refs[2] if use_dv else None
        dest_ref, val_ref = refs[-4], refs[-3]
        carry_ref = refs[-2]  # SMEM: [0] = sum, [1] = biased max
        del refs
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            carry_ref[0] = 0
            carry_ref[1] = _MIN32

        k = k_ref[...]
        a = a_ref[...]
        is_src = a >= 0  # TAG is bit 31: queries are negative as int32
        # --- carry-last-source-(key+1), biased unsigned max ------------
        kp1 = k + 1  # EMPTY -> 0 == "none": absorbed by the max
        ckin = jnp.where(is_src, kp1 ^ _MIN32, _MIN32)
        smax = _hillis(ckin, jnp.maximum, _MIN32, _C, 1)
        rmax = smax[:, _C - 1 :]  # (R, 1)
        imax = _hillis(rmax, jnp.maximum, _MIN32, _R, 0)
        offmax = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (_R, 1), 0) >= 1,
            pltpu.roll(imax, 1, 0), _MIN32,
        )
        ck = jnp.maximum(jnp.maximum(smax, offmax), carry_ref[1])
        found = (~is_src) & (ck == (kp1 ^ _MIN32)) & (k != -1)
        # --- value fill (delta cumsum) ---------------------------------
        if membership:
            val = jnp.zeros_like(k)
        else:
            if val16:
                sv = jnp.where(is_src, a & 0xFFFF, 0)
            else:
                sv = jnp.where(is_src, dv_ref[...], 0)
            ssum = _hillis(sv, jnp.add, 0, _C, 1)
            rsum = ssum[:, _C - 1 :]
            isum = _hillis(rsum, jnp.add, 0, _R, 0)
            offsum = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (_R, 1), 0) >= 1,
                pltpu.roll(isum, 1, 0), 0,
            )
            fv = ssum + offsum + carry_ref[0]
            if val16:
                fv = fv & 0xFFFF
            val = jnp.where(found, fv, 0)
            carry_ref[0] = carry_ref[0] + isum[_R - 1, 0]
        carry_ref[1] = jnp.maximum(carry_ref[1], imax[_R - 1, 0])
        qp = a & 0x7FFFFFFF
        is_real = (~is_src) & (qp < nq)
        dest_ref[...] = jnp.where(
            is_real, (qp << 1) | found.astype(jnp.int32), -1
        )
        val_ref[...] = val

    blockspec = pl.BlockSpec((_R, _C), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    dest, val = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[blockspec] * len(ins),
        out_specs=(blockspec, blockspec),
        out_shape=(
            jax.ShapeDtypeStruct(ki.shape, jnp.int32),
            jax.ShapeDtypeStruct(ki.shape, jnp.int32),
        ),
        scratch_shapes=[pltpu.SMEM((2,), jnp.int32), pltpu.SMEM((1,),
                                                                jnp.int32)],
        interpret=interpret,
    )(*ins)
    return (
        jax.lax.bitcast_convert_type(dest.reshape(n), jnp.uint32),
        jax.lax.bitcast_convert_type(val.reshape(n), jnp.uint32),
    )
