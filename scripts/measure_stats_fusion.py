"""One-off: does packing cnt+vsum into ONE row reduction speed up phase A?

Measures on the default device (TPU): old two-reduction chunk stats vs the
new packed single-reduction (ops/chunk_stats.py), plus full filter_sparse
at 2^24 benchmark data. Prints one line per measurement.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dwarf_bench_tpu.ops.chunk_stats import chunk_stats_xla
from dwarf_bench_tpu.ops.scan import filter_sparse
from dwarf_bench_tpu.utils.timing import time_amortized

N = 1 << 24


def stats_old(x2, threshold):
    thr = jnp.asarray(threshold, jnp.int32)
    m = x2 < thr
    cnt = jnp.sum(m.astype(jnp.int32), axis=1)
    d = thr - jnp.maximum(x2, thr - 512)
    vclip = jnp.clip(d, 0, 256)
    vs = jnp.minimum(jnp.sum(vclip, axis=1), 511)
    stat = cnt * 512 + vs
    base = jnp.cumsum(cnt) - cnt
    return stat, base


def main():
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print("device:", dev)
    x = jax.device_put(
        rng.integers(1, 10000, N, endpoint=True).astype(np.int32), dev
    )
    x2 = x.reshape(-1, 128)
    thr = jnp.int32(5)

    f_old = jax.jit(stats_old)
    f_new = jax.jit(chunk_stats_xla)
    t_old = time_amortized(f_old, x2, thr, k=16)
    print(f"stats_old  (2 reductions): {t_old * 1e3:.4f} ms")
    t_new = time_amortized(f_new, x2, thr, k=16)
    print(f"stats_new  (packed 1-red): {t_new * 1e3:.4f} ms")

    # exactness cross-check on device (tiny readback)
    so, bo = f_old(x2, thr)
    sn, bn = f_new(x2, thr)
    eq = bool(jnp.all(so == sn) & jnp.all(bo == bn))
    print("exact match:", eq)

    t_f = time_amortized(jax.jit(filter_sparse), x, k=16)
    print(
        f"filter_sparse 2^24: {t_f * 1e3:.4f} ms = {N / t_f / 1e9:.1f} Grows/s"
    )


if __name__ == "__main__":
    main()
