"""Round-2 TPU experiments, part F: block-ROWS sweep for the one-hot
engines (e3 showed R=32 beats R=8 by 16% on the G=64 group-by — fewer
grid steps amortize per-step overhead; find the knee, and check whether
the 16K histogram gains the same way)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dwarf_bench_tpu.ops.groupby import groupby_sum_matmul_bf16
from dwarf_bench_tpu.ops.hist_pallas import histogram_16k_pallas
from dwarf_bench_tpu.utils.timing import time_amortized

from measure_r3b import groupby_small_v5


@partial(jax.jit, static_argnames=("hi_bins", "rows", "interpret"))
def hist_rows(k, hi_bins: int = 128, rows: int = 8, interpret: bool = False):
    """Sentinel-padded histogram with parametric block ROWS."""
    w = 2048
    n = k.shape[0]
    block = rows * w
    pad = (-n) % block
    sentinel = np.int32(hi_bins << 7)
    kp = jnp.pad(k.astype(jnp.int32), (0, pad), constant_values=sentinel)
    k2 = kp.reshape(-1, w)
    nblocks = (n + pad) // block

    def kernel(k_ref, out_ref, acc_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_ref[...] = jnp.zeros((hi_bins, 128), jnp.int32)

        iota_hi = jax.lax.broadcasted_iota(jnp.int32, (hi_bins, w), 0)
        iota_lo = jax.lax.broadcasted_iota(jnp.int32, (128, w), 0)
        for r in range(rows):
            row = k_ref[r, :].reshape(1, w)
            bad = row.astype(jnp.uint32) >= jnp.uint32(int(sentinel))
            hi = jnp.where(bad, np.int32(hi_bins), row >> 7)
            lo = row & 127
            oh_hi = (jnp.broadcast_to(hi, (hi_bins, w)) == iota_hi).astype(
                jnp.int8
            )
            oh_lo = (jnp.broadcast_to(lo, (128, w)) == iota_lo).astype(
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
        in_specs=[pl.BlockSpec((rows, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hi_bins, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((hi_bins, 128), jnp.int32)],
        interpret=interpret,
    )(k2)
    return out.reshape(-1)


def main():
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print("device:", dev, flush=True)

    def run(label, n, fn, *args, check_vs=None, k=8):
        try:
            t = time_amortized(fn, *args, k=k)
            line = f"{label:46s}: {t * 1e3:.4f} ms = {n / t / 1e9:6.2f} G/s"
            if check_vs is not None:
                a = fn(*args)
                b = check_vs(*args)
                eq = bool(np.asarray(jnp.all(a == b)))
                line += f"  exact={eq}"
            print(line, flush=True)
            return t
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")[0][:160]
            print(f"{label:46s}: FAILED {type(e).__name__}: {msg}",
                  flush=True)
            return None

    n = 1 << 22
    G = 64
    k = jax.device_put(rng.integers(0, G, n).astype(np.uint32), dev)
    v = jax.device_put(
        rng.integers(1, 10000, n, endpoint=True).astype(np.uint32), dev
    )
    chk = jax.jit(partial(groupby_sum_matmul_bf16, num_groups=G))
    for rows in (64, 128):
        run(f"f1 groupby G=64 v5 R={rows} W=2048", n,
            jax.jit(partial(groupby_small_v5, num_groups=G, rows=rows,
                            w=2048)), k, v, check_vs=chk)
    run("f1 groupby G=64 v5 R=32 W=4096", n,
        jax.jit(partial(groupby_small_v5, num_groups=G, rows=32, w=4096)),
        k, v, check_vs=chk)

    xk = jax.device_put(
        (rng.integers(1, 10000, n, endpoint=True) - 1).astype(np.int32), dev
    )
    base_hist = jax.jit(histogram_16k_pallas)
    chk80 = jax.jit(lambda a: histogram_16k_pallas(a)[: 80 * 128])
    for rows in (16, 32):
        run(f"f2 hist hi80 R={rows}", n,
            jax.jit(partial(hist_rows, hi_bins=80, rows=rows)), xk,
            check_vs=chk80)
    run("f2 hist 128 R=32", n,
        jax.jit(partial(hist_rows, hi_bins=128, rows=32)), xk,
        check_vs=base_hist)


if __name__ == "__main__":
    main()
