"""Round-2 TPU experiments, part G: where does filter_sparse's time go?

e1 showed the full sparse filter at 0.38 ms (2^24) with XLA stats, while
STANDALONE XLA stats measured 0.50 ms — standalone jits distort (forced
materialization of stat/base vs. in-place fusion), so this decomposes the
real pipeline by cutting it after each stage, every variant measured as
its own jit e2e:

  g1: stats + classification only (returns the three scalars + sval sum)
  g2: g1 + the singles compaction
  g3: g2 + multi compaction + row gather + melems compaction
  g4: the full filter (order sort + emit) — should match e1
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dwarf_bench_tpu.ops.chunk_stats import chunk_stats_xla
from dwarf_bench_tpu.ops.compact_pallas import compact_mask_pallas
from dwarf_bench_tpu.ops.scan import _BIG, filter_sparse
from dwarf_bench_tpu.utils.timing import time_amortized

_N = 1 << 24
_CAP_S = max(16384, _N >> 10)
_CAP_MC = max(512, _N >> 15)
_CAP_ME = max(4096, _N >> 12)


def _stats(x):
    thr = jnp.int32(5)
    nch = x.shape[0] // 128
    stat, base = chunk_stats_xla(x.reshape(nch, 128), thr)
    cnt = stat >> 9
    vsw = stat & 511
    total = (base[-1] + cnt[-1]).astype(jnp.int32)
    single = (cnt == 1) & (vsw >= 1) & (vsw <= 255)
    multi = (cnt >= 1) & ~single
    return base, thr - vsw, single, multi, total


@jax.jit
def g1(x):
    base, sval, single, multi, total = _stats(x)
    return (jnp.sum(single.astype(jnp.int32)),
            jnp.sum(multi.astype(jnp.int32)), total)


@jax.jit
def g2(x):
    base, sval, single, multi, total = _stats(x)
    n_single = jnp.sum(single.astype(jnp.int32))
    (spos, sv), _ = compact_mask_pallas(single, (base, sval), capacity=_CAP_S)
    iota_s = jnp.arange(_CAP_S, dtype=jnp.int32)
    spos = jnp.where(iota_s < n_single, spos, _BIG)
    return spos, sv, total


@jax.jit
def g3(x):
    base, sval, single, multi, total = _stats(x)
    nch = x.shape[0] // 128
    n_single = jnp.sum(single.astype(jnp.int32))
    n_multi = jnp.sum(multi.astype(jnp.int32))
    (spos, sv), _ = compact_mask_pallas(single, (base, sval), capacity=_CAP_S)
    iota_s = jnp.arange(_CAP_S, dtype=jnp.int32)
    spos = jnp.where(iota_s < n_single, spos, _BIG)
    (mids,), _ = compact_mask_pallas(
        multi, (jnp.arange(nch, dtype=jnp.int32),), capacity=_CAP_MC
    )
    iota_m = jnp.arange(_CAP_MC, dtype=jnp.int32)
    valid_m = iota_m < n_multi
    midsafe = jnp.where(valid_m, mids, 0)
    rows = x.reshape(nch, 128)[midsafe]
    gm = (rows < 5) & valid_m[:, None]
    grank = jnp.cumsum(gm.astype(jnp.int32), axis=1) - gm
    gpos = jnp.where(gm, base[midsafe][:, None] + grank, _BIG)
    (mpos, mval), _ = compact_mask_pallas(
        gm.reshape(-1), (gpos.reshape(-1), rows.reshape(-1)),
        capacity=_CAP_ME,
    )
    return spos, sv, mpos, mval, total


def main():
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    x = jax.device_put(
        rng.integers(1, 10000, _N, endpoint=True).astype(np.int32), dev
    )

    def run(label, fn, *args):
        try:
            t = time_amortized(fn, *args, k=8)
            print(f"{label:34s}: {t * 1e3:.4f} ms = "
                  f"{_N / t / 1e9:6.2f} G/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{label:34s}: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:140]}", flush=True)

    run("g1 stats+classify scalars", g1, x)
    run("g2 + singles compaction", g2, x)
    run("g3 + multi/gather/melems", g3, x)
    run("g4 full filter_sparse", jax.jit(lambda a: filter_sparse(a)), x)


if __name__ == "__main__":
    main()
