"""Round-2 TPU experiments: one-hot construction cost levers.

Both the 16K-bin histogram (radix + dense-join build) and the small-G
group-by are VPU-bound on one-hot CONSTRUCTION (broadcast compares on
(bins, W) tiles), not on the MXU (docs/performance.md micro-facts). Two
hypotheses measured here on the real chip:

  H1: int8 one-hot construction — if Mosaic vectorizes int8 compares at
      4 lanes/vreg-slot, the (128, W) compare tiles cost 4x less than the
      int32 ones the shipped histogram_16k_pallas builds.
  H2: balanced digit split for small G (ops/groupby_pallas) — G=64 as
      (8, 8) digits costs 16 compares/element instead of 64.

Prints one line per measurement; device-side correctness cross-checks only
(no large readbacks over the tunnel).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dwarf_bench_tpu.ops.groupby import groupby_sum_matmul_bf16
from dwarf_bench_tpu.ops.groupby_pallas import groupby_small_pallas
from dwarf_bench_tpu.ops.hist_pallas import histogram_16k_pallas
from dwarf_bench_tpu.utils.timing import time_amortized

_ROWS = 8
_W = 2048


@partial(jax.jit, static_argnames=("interpret",))
def histogram_16k_i8cmp(k: jnp.ndarray, interpret: bool = False):
    """histogram_16k_pallas with the one-hot compares done on int8 data
    (H1): hi/lo digits are narrowed to int8 on the (1, W) row BEFORE the
    (128, W) broadcast compare, so the big compare tiles are int8 vs int8.
    Sentinel for invalid/padding rows is -1 (outside the iota range)."""
    n = k.shape[0]
    block = _ROWS * _W
    pad = (-n) % block
    kp = jnp.pad(k.astype(jnp.int32), (0, pad))
    k2 = kp.reshape(-1, _W)
    nblocks = (n + pad) // block
    n_arr = jnp.full((1,), n, jnp.int32)

    def kernel(n_ref, k_ref, out_ref, acc_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_ref[...] = jnp.zeros((128, 128), jnp.int32)

        base = i * block
        nn = n_ref[0]
        iota8 = jax.lax.broadcasted_iota(jnp.int32, (128, _W), 0).astype(
            jnp.int8
        )
        for r in range(_ROWS):
            row = k_ref[r, :].reshape(1, _W)
            idx = base + r * _W + jax.lax.broadcasted_iota(
                jnp.int32, (1, _W), 1
            )
            bad = (idx >= nn) | (row < 0) | (row >= (1 << 14))
            hi8 = jnp.where(bad, -1, row >> 7).astype(jnp.int8)
            lo8 = (row & 127).astype(jnp.int8)
            oh_hi = (jnp.broadcast_to(hi8, (128, _W)) == iota8).astype(
                jnp.int8
            )
            oh_lo = (jnp.broadcast_to(lo8, (128, _W)) == iota8).astype(
                jnp.int8
            )
            acc_ref[...] += jax.lax.dot_general(
                oh_hi, oh_lo,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )

        @pl.when(i == nblocks - 1)
        def _():
            out_ref[...] = acc_ref[...]

    out = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_ROWS, _W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((128, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((128, 128), jnp.int32)],
        interpret=interpret,
    )(n_arr, k2)
    return out.reshape(-1)


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
            line = f"{label:38s}: {t * 1e3:.4f} ms = {n / t / 1e9:6.2f} G/s"
            if check_vs is not None:
                eq = bool(np.asarray(jnp.all(fn(*args) == check_vs(*args))))
                line += f"  exact={eq}"
            print(line, flush=True)
            return t
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f"{label:38s}: FAILED {type(e).__name__}: {e}",
                  flush=True)
            return None

    run("hist16k baseline (int32 cmp, i8 dot)", histogram_16k_pallas, x)
    run("hist16k H1 (int8 cmp)", histogram_16k_i8cmp, x,
        check_vs=histogram_16k_pallas)

    for G in (64, 1024, 4096):
        k = jax.device_put(rng.integers(0, G, n).astype(np.uint32), dev)
        v = jax.device_put(
            rng.integers(1, 10000, n, endpoint=True).astype(np.uint32), dev
        )
        if G == 64:
            run(f"groupby G={G} baseline (bf16 matmul)",
                jax.jit(lambda kk, vv: groupby_sum_matmul_bf16(kk, vv, 64)),
                k, v)
        run(f"groupby G={G} H2 (balanced digits)",
            jax.jit(partial(groupby_small_pallas, num_groups=G)), k, v,
            check_vs=jax.jit(partial(groupby_sum_matmul_bf16,
                                     num_groups=G)))


if __name__ == "__main__":
    main()
