"""Round-2 TPU experiments, part E: end-to-end effects of the part-D
winners plus the remaining block-shape levers.

  e1: filter_sparse end to end at 2^24 with the Pallas stats kernel vs the
      XLA stats (stats won standalone 0.22 vs 0.50 ms; inside the filter
      XLA may fuse the stats with consumers, so the e2e check decides).
  e2: hi_bins=80 histogram (fixed equality check — d5's compared shapes
      mismatched) and the sentinel-padded 128-bin variant: does dropping
      the per-element index masking pay?
  e3: group-by G=64 bf16 2-plane block shapes: sentinel padding (no index
      masking), W=4096, ROWS=32 — the per-grid-step overhead levers.
  e4: landed join paths: build_dense at 2^17 (1-col packed sort) vs the
      2-col sort form, and the honest full join (build + probe +
      id_buffer) at 2^20 with the current engines.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dwarf_bench_tpu.ops import csr_join
from dwarf_bench_tpu.ops.groupby import groupby_sum_matmul_bf16
from dwarf_bench_tpu.ops.groupby_pallas import _digit_split
from dwarf_bench_tpu.ops.primitives import sort_by_key
from dwarf_bench_tpu.ops.scan import filter_sparse
from dwarf_bench_tpu.utils.timing import time_amortized

from measure_r3 import hist_variant  # noqa: E402 — shared variant kernel


@partial(jax.jit,
         static_argnames=("num_groups", "rows", "w", "interpret"))
def groupby_small_v5(
    k, v, num_groups: int, rows: int = 8, w: int = 2048,
    interpret: bool = False,
):
    """bf16 2-plane balanced-digit group-by with sentinel padding (no
    per-element index masking) and parametric (rows, w) block shape."""
    ga, gb = _digit_split(num_groups)
    shift = int(np.log2(gb))
    sentinel = np.uint32(ga << shift)
    n = k.shape[0]
    block = rows * w
    pad = (-n) % block
    kp = jnp.pad(k.astype(jnp.uint32), (0, pad), constant_values=sentinel)
    vp = jnp.pad(v.astype(jnp.int32), (0, pad))
    k2 = kp.astype(jnp.int32).reshape(-1, w)
    v2 = vp.reshape(-1, w)
    nblocks = (n + pad) // block

    def kernel(k_ref, v_ref, out_ref, acc_int):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_int[...] = jnp.zeros((ga, gb), jnp.int32)

        blk_lo = jnp.zeros((ga, gb), jnp.float32)
        blk_hi = jnp.zeros((ga, gb), jnp.float32)
        iota_a = jax.lax.broadcasted_iota(jnp.int32, (ga, w), 0)
        iota_b = jax.lax.broadcasted_iota(jnp.int32, (gb, w), 0)
        dims = (((1,), (1,)), ((), ()))
        for r in range(rows):
            row = k_ref[r, :].reshape(1, w)
            val = v_ref[r, :].reshape(1, w)
            bad = row.astype(jnp.uint32) >= jnp.uint32(int(sentinel))
            hi = jnp.where(bad, np.int32(ga), row >> shift)
            lo = row & (gb - 1)
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
            blk_lo = blk_lo + jax.lax.dot_general(
                oh_a * vlo, oh_b, dimension_numbers=dims,
                preferred_element_type=jnp.float32,
            )
            blk_hi = blk_hi + jax.lax.dot_general(
                oh_a * vhi, oh_b, dimension_numbers=dims,
                preferred_element_type=jnp.float32,
            )

        acc_int[...] += blk_lo.astype(jnp.int32) + (
            blk_hi.astype(jnp.int32) << 7
        )

        @pl.when(i == nblocks - 1)
        def _():
            out_ref[...] = acc_int[...]

    out = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((rows, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ga, gb), jnp.int32),
        scratch_shapes=[pltpu.VMEM((ga, gb), jnp.int32)],
        interpret=interpret,
    )(k2, v2)
    return out.reshape(-1)[:num_groups].astype(jnp.uint32)


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
                if isinstance(a, tuple):
                    eq = all(
                        bool(np.asarray(jnp.all(x == y)))
                        for x, y in zip(a, b)
                    )
                else:
                    eq = bool(np.asarray(jnp.all(a == b)))
                line += f"  exact={eq}"
            print(line, flush=True)
            return t
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")[0][:160]
            print(f"{label:46s}: FAILED {type(e).__name__}: {msg}",
                  flush=True)
            return None

    # ---- e1: filter_sparse e2e -------------------------------------------
    n = 1 << 24
    x = jax.device_put(
        rng.integers(1, 10000, n, endpoint=True).astype(np.int32), dev
    )
    f_xla = jax.jit(lambda a: filter_sparse(a, stats_pallas=False))
    f_pal = jax.jit(lambda a: filter_sparse(a, stats_pallas=True))
    run("e1 filter_sparse 2^24 XLA stats", n, f_xla, x)
    # outputs past count are garbage by contract: compare count + the
    # valid prefix only
    t_p = run("e1 filter_sparse 2^24 Pallas stats", n, f_pal, x)
    if t_p is not None:
        o1, c1 = f_xla(x)
        o2, c2 = f_pal(x)
        c = int(c1)
        eq = (int(c2) == c) and bool(
            np.asarray(jnp.all(o1[:c] == o2[:c]))
        )
        print(f"e1 exact={eq} count={c}", flush=True)

    # ---- e2: histogram variants -------------------------------------------
    n = 1 << 22
    xk = jax.device_put(
        (rng.integers(1, 10000, n, endpoint=True) - 1).astype(np.int32), dev
    )
    from dwarf_bench_tpu.ops.hist_pallas import histogram_16k_pallas

    base_hist = jax.jit(histogram_16k_pallas)
    chk80 = jax.jit(lambda a: histogram_16k_pallas(a)[: 80 * 128])
    run("e2 hist hi80 (sentinel)", n,
        jax.jit(partial(hist_variant, hi_bins=80)), xk, check_vs=chk80)
    run("e2 hist 128 sentinel (no idx mask)", n,
        jax.jit(partial(hist_variant, hi_bins=128)), xk,
        check_vs=base_hist)

    # ---- e3: group-by block shapes ----------------------------------------
    n = 1 << 22
    G = 64
    k = jax.device_put(rng.integers(0, G, n).astype(np.uint32), dev)
    v = jax.device_put(
        rng.integers(1, 10000, n, endpoint=True).astype(np.uint32), dev
    )
    chk = jax.jit(partial(groupby_sum_matmul_bf16, num_groups=G))
    for rows, w in ((8, 2048), (8, 4096), (32, 2048)):
        run(f"e3 groupby G=64 v5 sentinel R={rows} W={w}", n,
            jax.jit(partial(groupby_small_v5, num_groups=G, rows=rows,
                            w=w)), k, v, check_vs=chk)

    # ---- e4: join builds + honest join -------------------------------------
    n17 = 1 << 17
    A17 = rng.integers(1, 10000, n17, endpoint=True).astype(np.uint32)
    da17 = jax.device_put(A17, dev)
    bd = jax.jit(lambda a: csr_join.build_dense(a).id_buffer)
    run("e4 build_dense 2^17 (1-col packed sort)", n17, bd, da17)

    @jax.jit
    def build_2col(a):
        ak = a.astype(jnp.uint32)
        minv = jnp.min(ak)
        k16 = (ak - minv).astype(jnp.uint16)
        ids = jnp.arange(n17, dtype=jnp.uint32)
        _, sid = sort_by_key(k16, ids, stable=False)
        return sid

    run("e4 build sort 2^17 (2-col form)", n17, build_2col, da17)

    n = 1 << 20
    A = rng.integers(1, 10000, n, endpoint=True).astype(np.uint32)
    B = rng.integers(1, 10000, n, endpoint=True).astype(np.uint32)
    da = jax.device_put(A, dev)
    db = jax.device_put(B, dev)

    @jax.jit
    def join_fn(a, b):
        t = csr_join.build_dense(a)
        r = csr_join.probe_dense(t, b)
        return r.pos, r.counts, t.id_buffer

    run("e4 honest join 2^20 (current engines)", n, join_fn, da, db)


if __name__ == "__main__":
    main()
