"""Round-2 TPU experiments, part C.

Part B: packed (int8/bf16) vector compares are unsupported on this target,
and W=8192 + a concatenated single dot REGRESSED G=64 (0.42 vs 0.29 ms).
Remaining levers measured here:

  c1/c2: small-G group-by op-count micro-opts at W=2048 — drop the
      SMEM-n/idx masking (padding keys carry the ga*gb sentinel value
      instead), fold the one-hot astype+multiply into a single
      where-select; c1 keeps two dots, c2 uses the concat single dot.
  c3: is the int8 MXU path actually 2x bf16? The weighted histogram at
      hi_bins=512 (the G=2^16 group-by) is MXU-BOUND (n*G*planes MACs), so
      an int8 variant isolates the MXU rate where the VPU can't mask it.
  c4: do dynamic scalar-indexed VMEM stores compile? (Gates a fused
      run-expansion kernel for the counting sort.)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dwarf_bench_tpu.ops.groupby import (
    groupby_sum_2level,
    groupby_sum_matmul_bf16,
)
from dwarf_bench_tpu.ops.groupby_pallas import _digit_split
from dwarf_bench_tpu.ops.hist_pallas import weighted_histogram_pallas
from dwarf_bench_tpu.utils.timing import time_amortized

_ROWS = 8
_W = 2048


@partial(jax.jit,
         static_argnames=("num_groups", "one_dot", "interpret"))
def groupby_small_v3(
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_groups: int,
    one_dot: bool = False,
    interpret: bool = False,
):
    """Op-count-optimized balanced-digit group-by: padding rows carry the
    key value ga*gb (maps to the sentinel hi digit), so no SMEM length or
    per-row index mask is needed; the value planes are folded into the hi
    one-hot with a single where-select per plane."""
    ga, gb = _digit_split(num_groups)
    shift = int(np.log2(gb))
    sentinel = np.int32(ga << shift)
    n = k.shape[0]
    block = _ROWS * _W
    pad = (-n) % block
    kp = jnp.pad(k.astype(jnp.int32), (0, pad), constant_values=sentinel)
    vp = jnp.pad(v.astype(jnp.int32), (0, pad))
    k2 = kp.reshape(-1, _W)
    v2 = vp.reshape(-1, _W)
    nblocks = (n + pad) // block

    def kernel(k_ref, v_ref, out_ref, acc_int):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_int[...] = jnp.zeros((ga, gb), jnp.int32)

        rows_out = 2 * ga if one_dot else ga
        blk = jnp.zeros((rows_out, gb), jnp.float32)
        blk2 = jnp.zeros((ga, gb), jnp.float32)
        iota_a = jax.lax.broadcasted_iota(jnp.int32, (ga, _W), 0)
        iota_b = jax.lax.broadcasted_iota(jnp.int32, (gb, _W), 0)
        zero = jnp.zeros((ga, _W), jnp.bfloat16)
        for r in range(_ROWS):
            row = k_ref[r, :].reshape(1, _W)
            val = v_ref[r, :].reshape(1, _W)
            # uint32 >= ga*gb (negatives, out-of-range, padding sentinel)
            # routes hi outside the iota range
            bad = row.astype(jnp.uint32) >= jnp.uint32(int(sentinel))
            hi = jnp.where(bad, np.int32(ga), row >> shift)
            lo = row & (gb - 1)
            cmp_a = jnp.broadcast_to(hi, (ga, _W)) == iota_a
            oh_b = (jnp.broadcast_to(lo, (gb, _W)) == iota_b).astype(
                jnp.bfloat16
            )
            bvlo = jnp.broadcast_to(
                (val & 0x7F).astype(jnp.bfloat16), (ga, _W)
            )
            bvhi = jnp.broadcast_to(
                ((val >> 7) & 0x7F).astype(jnp.bfloat16), (ga, _W)
            )
            a_lo = jnp.where(cmp_a, bvlo, zero)
            a_hi = jnp.where(cmp_a, bvhi, zero)
            dims = (((1,), (1,)), ((), ()))
            if one_dot:
                blk = blk + jax.lax.dot_general(
                    jnp.concatenate([a_lo, a_hi], axis=0), oh_b,
                    dimension_numbers=dims,
                    preferred_element_type=jnp.float32,
                )
            else:
                blk = blk + jax.lax.dot_general(
                    a_lo, oh_b, dimension_numbers=dims,
                    preferred_element_type=jnp.float32,
                )
                blk2 = blk2 + jax.lax.dot_general(
                    a_hi, oh_b, dimension_numbers=dims,
                    preferred_element_type=jnp.float32,
                )

        if one_dot:
            acc_int[...] += blk[:ga].astype(jnp.int32) + (
                blk[ga:].astype(jnp.int32) << 7
            )
        else:
            acc_int[...] += blk.astype(jnp.int32) + (
                blk2.astype(jnp.int32) << 7
            )

        @pl.when(i == nblocks - 1)
        def _():
            out_ref[...] = acc_int[...]

    out = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((_ROWS, _W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, _W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ga, gb), jnp.int32),
        scratch_shapes=[pltpu.VMEM((ga, gb), jnp.int32)],
        interpret=interpret,
    )(k2, v2)
    return out.reshape(-1)[:num_groups].astype(jnp.uint32)


@partial(jax.jit, static_argnames=("hi_bins", "interpret"))
def weighted_histogram_i8(
    k: jnp.ndarray,
    v: jnp.ndarray,
    hi_bins: int = 512,
    interpret: bool = False,
):
    """weighted_histogram_pallas with int8 one-hots and int8 value planes
    (oh * vplane <= 127 fits int8) on the int8 MXU path, accumulating
    straight into int32 — measures whether int8 matmul is 2x bf16 where
    the kernel is MXU-bound."""
    assert hi_bins % 8 == 0 and hi_bins <= 512
    n = k.shape[0]
    block = _ROWS * _W
    pad = (-n) % block
    sentinel = np.int32(hi_bins << 7)
    kp = jnp.pad(k.astype(jnp.int32), (0, pad), constant_values=sentinel)
    vp = jnp.pad(v.astype(jnp.int32), (0, pad))
    k2 = kp.reshape(-1, _W)
    v2 = vp.reshape(-1, _W)
    nblocks = (n + pad) // block

    def kernel(k_ref, v_ref, out_ref, acc_int):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_int[...] = jnp.zeros((hi_bins, 128), jnp.int32)

        iota_a = jax.lax.broadcasted_iota(jnp.int32, (hi_bins, _W), 0)
        iota_b = jax.lax.broadcasted_iota(jnp.int32, (128, _W), 0)
        zero = jnp.zeros((hi_bins, _W), jnp.int8)
        for r in range(_ROWS):
            row = k_ref[r, :].reshape(1, _W)
            val = v_ref[r, :].reshape(1, _W)
            bad = row.astype(jnp.uint32) >= jnp.uint32(int(sentinel))
            hi = jnp.where(bad, np.int32(hi_bins), row >> 7)
            lo = row & 127
            cmp_a = jnp.broadcast_to(hi, (hi_bins, _W)) == iota_a
            oh_b = (jnp.broadcast_to(lo, (128, _W)) == iota_b).astype(
                jnp.int8
            )
            bvlo = jnp.broadcast_to(
                (val & 0x7F).astype(jnp.int8), (hi_bins, _W)
            )
            bvhi = jnp.broadcast_to(
                ((val >> 7) & 0x7F).astype(jnp.int8), (hi_bins, _W)
            )
            dims = (((1,), (1,)), ((), ()))
            acc_int[...] += jax.lax.dot_general(
                jnp.where(cmp_a, bvlo, zero), oh_b,
                dimension_numbers=dims, preferred_element_type=jnp.int32,
            ) + (
                jax.lax.dot_general(
                    jnp.where(cmp_a, bvhi, zero), oh_b,
                    dimension_numbers=dims,
                    preferred_element_type=jnp.int32,
                )
                << 7
            )

        @pl.when(i == nblocks - 1)
        def _():
            out_ref[...] = acc_int[...]

    out = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((_ROWS, _W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, _W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hi_bins, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((hi_bins, 128), jnp.int32)],
        interpret=interpret,
    )(k2, v2)
    return out.reshape(-1)


@partial(jax.jit, static_argnames=("interpret",))
def dyn_store_probe(idx: jnp.ndarray, interpret: bool = False):
    """c4: store 1 at (idx[t] >> 7, idx[t] & 127) of a zeroed (64, 128)
    VMEM buffer via scalar-dynamic pl.store — compiles or not?"""
    nt = idx.shape[0]

    def kernel(idx_ref, out_ref):
        out_ref[...] = jnp.zeros((64, 128), jnp.int32)

        def body(t, _):
            r = idx_ref[t] >> 7
            c = idx_ref[t] & 127
            cur = out_ref[pl.ds(r, 1), pl.ds(c, 1)]
            out_ref[pl.ds(r, 1), pl.ds(c, 1)] = cur + 1
            return 0

        jax.lax.fori_loop(0, nt, body, 0)

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.int32),
        interpret=interpret,
    )(idx.astype(jnp.int32))


def main():
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print("device:", dev, flush=True)

    def run(label, n, fn, *args, check_vs=None):
        try:
            t = time_amortized(fn, *args, k=8)
            line = f"{label:44s}: {t * 1e3:.4f} ms = {n / t / 1e9:6.2f} G/s"
            if check_vs is not None:
                eq = bool(np.asarray(jnp.all(fn(*args) == check_vs(*args))))
                line += f"  exact={eq}"
            print(line, flush=True)
            return t
        except Exception as e:  # noqa: BLE001
            print(f"{label:44s}: FAILED {type(e).__name__}: {e}", flush=True)
            return None

    n = 1 << 22
    for G in (64, 4096):
        k = jax.device_put(rng.integers(0, G, n).astype(np.uint32), dev)
        v = jax.device_put(
            rng.integers(1, 10000, n, endpoint=True).astype(np.uint32), dev
        )
        chk = jax.jit(partial(groupby_sum_matmul_bf16, num_groups=G))
        run(f"groupby G={G} v3 (opt ops, 2 dots)", n,
            jax.jit(partial(groupby_small_v3, num_groups=G)), k, v,
            check_vs=chk)
        if G == 64:
            run(f"groupby G={G} v4 (opt ops, 1 concat dot)", n,
                jax.jit(partial(groupby_small_v3, num_groups=G,
                                one_dot=True)), k, v, check_vs=chk)

    n16 = 1 << 20
    G16 = 1 << 16
    k = jax.device_put(rng.integers(0, G16, n16).astype(np.uint32), dev)
    v = jax.device_put(
        rng.integers(1, 10000, n16, endpoint=True).astype(np.uint32), dev
    )
    base = jax.jit(partial(groupby_sum_2level, num_groups=G16))
    run("groupby G=2^16 baseline (bf16, hi512)", n16, base, k, v)
    run("groupby G=2^16 int8 MXU (c3)", n16,
        jax.jit(lambda kk, vv: weighted_histogram_i8(kk, vv, 512)[:G16]
                .astype(jnp.uint32)),
        k, v, check_vs=base)

    # c4: dynamic scalar VMEM stores
    idx = jax.device_put(
        rng.integers(0, 64 * 128, 256).astype(np.int32), dev
    )
    try:
        out = np.asarray(dyn_store_probe(idx))
        exp = np.zeros((64, 128), np.int32)
        np.add.at(exp, (np.asarray(idx) >> 7, np.asarray(idx) & 127), 1)
        print("dyn VMEM store: OK exact=", np.array_equal(out, exp),
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"dyn VMEM store: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
