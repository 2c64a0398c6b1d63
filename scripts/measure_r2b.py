"""Round-2 TPU experiments, part B: bf16 compares + wider blocks.

Part A (scripts/measure_r2.py) showed Mosaic packs int8 4x/vreg but cannot
compare int8 vectors ("Target does not support this comparison"). bf16
packs 2x/vreg and cmpf may be supported; digits (0..128, sentinel -1) are
exact in bf16. Also: the balanced-digit group-by kernel has 16x less VPU
work per grid step than the histogram, so its per-step fixed cost matters —
measure a 4x wider block.

Variants, all checked device-side against shipped engines:
  A. hist16k with bf16 compares (W=2048 and W=4096);
  B. groupby G=64/4096 balanced digits + W=8192 + bf16 compares + single
     concat-plane dot;
  C. groupby G=64 with W=8192 only (int32 compares) — isolates the W
     effect if bf16 compares fail to lower.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dwarf_bench_tpu.ops.groupby import groupby_sum_matmul_bf16
from dwarf_bench_tpu.ops.groupby_pallas import _digit_split
from dwarf_bench_tpu.ops.hist_pallas import histogram_16k_pallas
from dwarf_bench_tpu.utils.timing import time_amortized

_ROWS = 8


@partial(jax.jit, static_argnames=("w", "interpret"))
def hist16k_bf16cmp(k: jnp.ndarray, w: int = 2048, interpret: bool = False):
    """histogram_16k semantics with bf16 one-hot construction: digits are
    narrowed to bf16 on the (1, W) row, the (128, W) broadcast compares run
    on bf16 (2x vreg packing), and the one-hots feed a bf16 dot with f32
    per-block partials (<= 16384 < 2^24, exact) folded to int32."""
    n = k.shape[0]
    block = _ROWS * w
    pad = (-n) % block
    kp = jnp.pad(k.astype(jnp.int32), (0, pad))
    k2 = kp.reshape(-1, w)
    nblocks = (n + pad) // block
    n_arr = jnp.full((1,), n, jnp.int32)

    def kernel(n_ref, k_ref, out_ref, acc_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_ref[...] = jnp.zeros((128, 128), jnp.int32)

        base = i * block
        nn = n_ref[0]
        iota_bf = jax.lax.broadcasted_iota(jnp.int32, (128, w), 0).astype(
            jnp.bfloat16
        )
        blk = jnp.zeros((128, 128), jnp.float32)
        for r in range(_ROWS):
            row = k_ref[r, :].reshape(1, w)
            idx = base + r * w + jax.lax.broadcasted_iota(
                jnp.int32, (1, w), 1
            )
            bad = (idx >= nn) | (row < 0) | (row >= (1 << 14))
            hi = jnp.where(bad, -1, row >> 7).astype(jnp.bfloat16)
            lo = (row & 127).astype(jnp.bfloat16)
            oh_hi = (jnp.broadcast_to(hi, (128, w)) == iota_bf).astype(
                jnp.bfloat16
            )
            oh_lo = (jnp.broadcast_to(lo, (128, w)) == iota_bf).astype(
                jnp.bfloat16
            )
            blk = blk + jax.lax.dot_general(
                oh_hi, oh_lo,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        acc_ref[...] += blk.astype(jnp.int32)

        @pl.when(i == nblocks - 1)
        def _():
            out_ref[...] = acc_ref[...]

    out = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_ROWS, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((128, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((128, 128), jnp.int32)],
        interpret=interpret,
    )(n_arr, k2)
    return out.reshape(-1)


@partial(jax.jit,
         static_argnames=("num_groups", "w", "bf16cmp", "interpret"))
def groupby_small_v2(
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_groups: int,
    w: int = 8192,
    bf16cmp: bool = True,
    interpret: bool = False,
):
    """groupby_small_pallas variants: block width ``w``, optional bf16
    one-hot compares, and the two value planes stacked into ONE dot
    ((2*ga, W) @ (gb, W) -> (2*ga, gb), split + shift after)."""
    ga, gb = _digit_split(num_groups)
    shift = int(np.log2(gb))
    n = k.shape[0]
    block = _ROWS * w
    pad = (-n) % block
    kp = jnp.pad(k.astype(jnp.int32), (0, pad))
    vp = jnp.pad(v.astype(jnp.int32), (0, pad))
    k2 = kp.reshape(-1, w)
    v2 = vp.reshape(-1, w)
    nblocks = (n + pad) // block
    n_arr = jnp.full((1,), n, jnp.int32)

    def kernel(n_ref, k_ref, v_ref, out_ref, acc_int):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_int[...] = jnp.zeros((ga, gb), jnp.int32)

        blk = jnp.zeros((2 * ga, gb), jnp.float32)
        base = i * block
        nn = n_ref[0]
        if bf16cmp:
            iota_a = jax.lax.broadcasted_iota(jnp.int32, (ga, w), 0).astype(
                jnp.bfloat16
            )
            iota_b = jax.lax.broadcasted_iota(jnp.int32, (gb, w), 0).astype(
                jnp.bfloat16
            )
        else:
            iota_a = jax.lax.broadcasted_iota(jnp.int32, (ga, w), 0)
            iota_b = jax.lax.broadcasted_iota(jnp.int32, (gb, w), 0)
        for r in range(_ROWS):
            row = k_ref[r, :].reshape(1, w)
            val = v_ref[r, :].reshape(1, w)
            idx = base + r * w + jax.lax.broadcasted_iota(
                jnp.int32, (1, w), 1
            )
            bad = (idx >= nn) | (row < 0) | (row >= num_groups)
            hi_i = jnp.where(bad, -1, row >> shift)
            lo_i = jnp.where(bad, -1, row & (gb - 1))
            if bf16cmp:
                hi = hi_i.astype(jnp.bfloat16)
                lo = lo_i.astype(jnp.bfloat16)
            else:
                hi, lo = hi_i, lo_i
            oh_a = (jnp.broadcast_to(hi, (ga, w)) == iota_a).astype(
                jnp.bfloat16
            )
            oh_b = (jnp.broadcast_to(lo, (gb, w)) == iota_b).astype(
                jnp.bfloat16
            )
            vlo = jnp.broadcast_to((val & 0x7F).astype(jnp.bfloat16),
                                   (ga, w))
            vhi = jnp.broadcast_to(((val >> 7) & 0x7F).astype(jnp.bfloat16),
                                   (ga, w))
            a2 = jnp.concatenate([oh_a * vlo, oh_a * vhi], axis=0)
            blk = blk + jax.lax.dot_general(
                a2, oh_b,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        acc_int[...] += blk[:ga].astype(jnp.int32) + (
            blk[ga:].astype(jnp.int32) << 7
        )

        @pl.when(i == nblocks - 1)
        def _():
            out_ref[...] = acc_int[...]

    out = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_ROWS, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ga, gb), jnp.int32),
        scratch_shapes=[pltpu.VMEM((ga, gb), jnp.int32)],
        interpret=interpret,
    )(n_arr, k2, v2)
    return out.reshape(-1)[:num_groups].astype(jnp.uint32)


def main():
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    n = 1 << 22
    x = jax.device_put(
        rng.integers(1, 10000, n, endpoint=True).astype(np.int32), dev
    )

    def run(label, fn, *args, check_vs=None):
        try:
            t = time_amortized(fn, *args, k=8)
            line = f"{label:42s}: {t * 1e3:.4f} ms = {n / t / 1e9:6.2f} G/s"
            if check_vs is not None:
                eq = bool(np.asarray(jnp.all(fn(*args) == check_vs(*args))))
                line += f"  exact={eq}"
            print(line, flush=True)
            return t
        except Exception as e:  # noqa: BLE001
            print(f"{label:42s}: FAILED {type(e).__name__}: {e}", flush=True)
            return None

    run("hist16k bf16cmp W=2048",
        jax.jit(partial(hist16k_bf16cmp, w=2048)), x,
        check_vs=histogram_16k_pallas)
    run("hist16k bf16cmp W=4096",
        jax.jit(partial(hist16k_bf16cmp, w=4096)), x,
        check_vs=histogram_16k_pallas)

    for G in (64, 4096):
        k = jax.device_put(rng.integers(0, G, n).astype(np.uint32), dev)
        v = jax.device_put(
            rng.integers(1, 10000, n, endpoint=True).astype(np.uint32), dev
        )
        chk = jax.jit(partial(groupby_sum_matmul_bf16, num_groups=G))
        run(f"groupby G={G} v2 (W=8192, bf16cmp, 1dot)",
            jax.jit(partial(groupby_small_v2, num_groups=G, w=8192,
                            bf16cmp=True)), k, v, check_vs=chk)
        if G == 64:
            run(f"groupby G={G} v2 (W=8192, i32cmp, 1dot)",
                jax.jit(partial(groupby_small_v2, num_groups=G, w=8192,
                                bf16cmp=False)), k, v, check_vs=chk)


if __name__ == "__main__":
    main()
