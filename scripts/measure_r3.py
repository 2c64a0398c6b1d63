"""Round-2 TPU experiments, part D: the landed-kernel candidates.

Parts A-C established: int8/bf16/packed vector compares don't lower;
`jnp.where` with bf16/int8 operands hits Mosaic i1-relayout failures (the
f32 select shares the int32 compare's native layout and is the workaround);
dynamic scalar-indexed VMEM stores don't compile. This batch measures the
candidates built on those findings, each device-checked against the shipped
engine:

  d1: chunk_stats_pallas (2 MB blocks + MXU segment-reduction dots) vs
      chunk_stats_xla at 2^24 — the scan phase-A bound.
  d2: groupby_small_pallas_f32 (single f32 plane, HIGHEST) vs the bf16
      two-plane Pallas kernel vs the XLA engine, G=64 / G=4096 at 2^22.
  d3: probe_dense_rel_pallas (fused probe) vs the XLA gather_16k_rel
      probe at 2^20 — and the honest full join with it.
  d4: does an int16 broadcast compare lower (and run faster) in the 16K
      histogram? i16 packs 2x/vreg; if Mosaic vectorizes the compare, the
      one-hot construction (the VPU floor of every one-hot engine) halves.
  d5: hi_bins=80 asymmetric histogram (spans <= 10240, e.g. the
      benchmark's [1, 10000]) — 208 compares/elem instead of 256.
  d6: weighted histogram (G=2^16) with int8 dots, value masked on the
      128-row lo side via the hist-proven astype+multiply form (no where).
  d7: lax.sort shape micro for the join build: 1-col u32 vs the shipped
      2-col (u16, u32) at 2^20, and a batched (4, 2^18) 1-col variant.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dwarf_bench_tpu.ops import csr_join
from dwarf_bench_tpu.ops.chunk_stats import chunk_stats_xla
from dwarf_bench_tpu.ops.chunk_stats_pallas import chunk_stats_pallas
from dwarf_bench_tpu.ops.groupby import groupby_sum_matmul_bf16
from dwarf_bench_tpu.ops.groupby_pallas import (
    groupby_small_pallas,
    groupby_small_pallas_f32,
)
from dwarf_bench_tpu.ops.hist_pallas import (
    histogram_16k_pallas,
    weighted_histogram_pallas,
)
from dwarf_bench_tpu.ops.probe_pallas import probe_dense_rel_pallas
from dwarf_bench_tpu.utils.timing import time_amortized

_ROWS = 8
_W = 2048


# --- d4/d5: histogram one-hot-construction variants ----------------------


@partial(jax.jit, static_argnames=("hi_bins", "i16", "interpret"))
def hist_variant(k, hi_bins: int = 128, i16: bool = False,
                 interpret: bool = False):
    """histogram with hi_bins x 128 bins; optional int16 compares."""
    n = k.shape[0]
    block = _ROWS * _W
    pad = (-n) % block
    sentinel = np.int32(hi_bins << 7)
    kp = jnp.pad(k.astype(jnp.int32), (0, pad), constant_values=sentinel)
    k2 = kp.reshape(-1, _W)
    nblocks = (n + pad) // block
    cdt = jnp.int16 if i16 else jnp.int32

    def kernel(k_ref, out_ref, acc_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_ref[...] = jnp.zeros((hi_bins, 128), jnp.int32)

        iota_hi = jax.lax.broadcasted_iota(
            jnp.int32, (hi_bins, _W), 0).astype(cdt)
        iota_lo = jax.lax.broadcasted_iota(
            jnp.int32, (128, _W), 0).astype(cdt)
        for r in range(_ROWS):
            row = k_ref[r, :].reshape(1, _W)
            bad = row.astype(jnp.uint32) >= jnp.uint32(int(sentinel))
            hi = jnp.where(bad, np.int32(hi_bins), row >> 7).astype(cdt)
            lo = (row & 127).astype(cdt)
            oh_hi = (jnp.broadcast_to(hi, (hi_bins, _W)) == iota_hi).astype(
                jnp.int8
            )
            oh_lo = (jnp.broadcast_to(lo, (128, _W)) == iota_lo).astype(
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
        in_specs=[pl.BlockSpec((_ROWS, _W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hi_bins, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((hi_bins, 128), jnp.int32)],
        interpret=interpret,
    )(k2)
    return out.reshape(-1)


# --- d6: int8-dot weighted histogram (value on the lo side) --------------


@partial(jax.jit, static_argnames=("hi_bins", "interpret"))
def whist_i8(k, v, hi_bins: int = 512, interpret: bool = False):
    """weighted_histogram semantics with int8 dots: the hi one-hot is a
    pure int8 one-hot; the two 7-bit value planes mask the 128-row lo side
    (4x fewer masked rows than the hi side) via astype+multiply — the
    i1-relayout-free form. int32 accumulation is exact (products <= 127,
    |acc| wraps mod 2^32 like the reference's uint32)."""
    n = k.shape[0]
    block = _ROWS * _W
    pad = (-n) % block
    sentinel = np.int32(hi_bins << 7)
    kp = jnp.pad(k.astype(jnp.int32), (0, pad), constant_values=sentinel)
    vp = jnp.pad(v.astype(jnp.int32), (0, pad))
    k2 = kp.reshape(-1, _W)
    v2 = vp.reshape(-1, _W)
    nblocks = (n + pad) // block

    def kernel(k_ref, v_ref, out_ref, acc_lo, acc_hi):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_lo[...] = jnp.zeros((hi_bins, 128), jnp.int32)
            acc_hi[...] = jnp.zeros((hi_bins, 128), jnp.int32)

        iota_hi = jax.lax.broadcasted_iota(jnp.int32, (hi_bins, _W), 0)
        iota_lo = jax.lax.broadcasted_iota(jnp.int32, (128, _W), 0)
        dims = (((1,), (1,)), ((), ()))
        for r in range(_ROWS):
            row = k_ref[r, :].reshape(1, _W)
            val = v_ref[r, :].reshape(1, _W)
            bad = row.astype(jnp.uint32) >= jnp.uint32(int(sentinel))
            hi = jnp.where(bad, np.int32(hi_bins), row >> 7)
            lo = row & 127
            oh_hi = (jnp.broadcast_to(hi, (hi_bins, _W)) == iota_hi).astype(
                jnp.int8
            )
            oh_lo32 = (
                jnp.broadcast_to(lo, (128, _W)) == iota_lo
            ).astype(jnp.int32)
            blo = (oh_lo32 * jnp.broadcast_to(val & 0x7F, (128, _W))).astype(
                jnp.int8
            )
            bhi = (
                oh_lo32 * jnp.broadcast_to((val >> 7) & 0x7F, (128, _W))
            ).astype(jnp.int8)
            acc_lo[...] += jax.lax.dot_general(
                oh_hi, blo, dimension_numbers=dims,
                preferred_element_type=jnp.int32,
            )
            acc_hi[...] += jax.lax.dot_general(
                oh_hi, bhi, dimension_numbers=dims,
                preferred_element_type=jnp.int32,
            )

        @pl.when(i == nblocks - 1)
        def _():
            out_ref[...] = acc_lo[...] + (acc_hi[...] << 7)

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
        scratch_shapes=[
            pltpu.VMEM((hi_bins, 128), jnp.int32),
            pltpu.VMEM((hi_bins, 128), jnp.int32),
        ],
        interpret=interpret,
    )(k2, v2)
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

    # ---- d1: chunk stats ------------------------------------------------
    n = 1 << 24
    x = jax.device_put(
        rng.integers(1, 10000, n, endpoint=True).astype(np.int32), dev
    )
    x2 = x.reshape(-1, 128)
    xla_fn = jax.jit(lambda a: chunk_stats_xla(a, 5))
    pal_fn = jax.jit(lambda a: chunk_stats_pallas(a, 5))
    run("d1 chunk_stats XLA 2^24", n, xla_fn, x2)
    run("d1 chunk_stats Pallas 2^24", n, pal_fn, x2, check_vs=xla_fn)

    # ---- d2: small-G group-by -------------------------------------------
    n = 1 << 22
    for G in (64, 4096):
        k = jax.device_put(rng.integers(0, G, n).astype(np.uint32), dev)
        v = jax.device_put(
            rng.integers(1, 10000, n, endpoint=True).astype(np.uint32), dev
        )
        chk = jax.jit(partial(groupby_sum_matmul_bf16, num_groups=G))
        if G == 64:
            run(f"d2 groupby G={G} XLA bf16", n, chk, k, v)
            run(f"d2 groupby G={G} Pallas bf16 2-plane", n,
                jax.jit(partial(groupby_small_pallas, num_groups=G)), k, v,
                check_vs=chk)
        run(f"d2 groupby G={G} Pallas f32 1-plane", n,
            jax.jit(partial(groupby_small_pallas_f32, num_groups=G)), k, v,
            check_vs=chk)

    # ---- d3: join probe --------------------------------------------------
    n = 1 << 20
    A = rng.integers(1, 10000, n, endpoint=True).astype(np.uint32)
    B = rng.integers(1, 10000, n, endpoint=True).astype(np.uint32)
    da = jax.device_put(A, dev)
    db = jax.device_put(B, dev)
    t = jax.jit(csr_join.build_dense)(da)
    ki = (db.astype(jnp.uint32) - t.minv).astype(jnp.int32)

    probe_xla = jax.jit(lambda tt, b: csr_join.probe_dense(tt, b))
    run("d3 probe XLA (rel path)", n, probe_xla, t, db)
    pf = jax.jit(lambda p3, b128, kk: probe_dense_rel_pallas(p3, b128, kk))
    run("d3 probe Pallas fused", n, pf, t.packed3, t.base128, ki,
        check_vs=None)
    # device-side equality vs the XLA probe
    try:
        pos_p, cnt_p = pf(t.packed3, t.base128, ki)
        r0 = probe_xla(t, db)
        eq = bool(np.asarray(
            jnp.all(pos_p == r0.pos) & jnp.all(cnt_p == r0.counts)
            & jnp.all((cnt_p > 0) == r0.found)
        ))
        print(f"d3 probe fused exact={eq}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"d3 probe check FAILED: {type(e).__name__}", flush=True)

    # ---- d4/d5: histogram variants ---------------------------------------
    n = 1 << 22
    xk = jax.device_put(
        (rng.integers(1, 10000, n, endpoint=True) - 1).astype(np.int32), dev
    )
    base_hist = jax.jit(histogram_16k_pallas)
    run("d4 hist 16k int32-cmp (shipped)", n, base_hist, xk)
    run("d4 hist 16k int16-cmp", n,
        jax.jit(partial(hist_variant, hi_bins=128, i16=True)), xk,
        check_vs=base_hist)
    run("d5 hist hi80 int32-cmp", n,
        jax.jit(lambda a: hist_variant(a, hi_bins=80)[: 1 << 14]), xk,
        check_vs=base_hist)
    run("d5 hist hi80 int16-cmp", n,
        jax.jit(lambda a: hist_variant(a, hi_bins=80, i16=True)[: 1 << 14]),
        xk, check_vs=base_hist)

    # ---- d6: G=2^16 group-by ---------------------------------------------
    n16, G16 = 1 << 20, 1 << 16
    k = jax.device_put(rng.integers(0, G16, n16).astype(np.uint32), dev)
    v = jax.device_put(
        rng.integers(1, 10000, n16, endpoint=True).astype(np.uint32), dev
    )
    base16 = jax.jit(
        lambda kk, vv: weighted_histogram_pallas(
            kk.astype(jnp.int32), vv.astype(jnp.int32), hi_bins=512
        )
    )
    run("d6 whist G=2^16 bf16 (shipped)", n16, base16, k, v)
    run("d6 whist G=2^16 int8 dots", n16,
        jax.jit(lambda kk, vv: whist_i8(
            kk.astype(jnp.int32), vv.astype(jnp.int32), hi_bins=512)),
        k, v, check_vs=base16)

    # ---- d7: sort shapes for the join build -------------------------------
    n = 1 << 20
    keys = rng.integers(0, 10000, n).astype(np.uint16)
    ids = np.arange(n, dtype=np.uint32)
    dk = jax.device_put(jnp.asarray(keys), dev)
    di = jax.device_put(jnp.asarray(ids), dev)
    packed = (keys.astype(np.uint32) << 18) | (ids & 0x3FFFF)
    dp = jax.device_put(jnp.asarray(packed), dev)
    dp4 = jax.device_put(jnp.asarray(packed).reshape(4, -1), dev)

    run("d7 sort 2-col (u16,u32) unstable", n,
        jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=1,
                                          is_stable=False)), dk, di)
    run("d7 sort 1-col u32 unstable", n,
        jax.jit(lambda a: jax.lax.sort((a,), num_keys=1,
                                       is_stable=False)), dp)
    run("d7 sort (4,2^18) u32 batched axis1", n,
        jax.jit(lambda a: jax.lax.sort(a, dimension=1)), dp4)


if __name__ == "__main__":
    main()
