"""One-off: does packing cnt+vsum into ONE row reduction speed up phase A?

Measures on the default device (TPU): the shipped two-reduction chunk stats
(ops/chunk_stats.chunk_stats_xla — the baseline arm) vs the packed
single-reduction variant (inlined below as ``stats_packed``; it lost the
measurement and was reverted from the library, so it lives only here), plus
full filter_sparse at 2^24 benchmark data. Prints one line per measurement.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dwarf_bench_tpu.ops.chunk_stats import chunk_stats_xla
from dwarf_bench_tpu.ops.scan import filter_sparse
from dwarf_bench_tpu.utils.timing import time_amortized

N = 1 << 24


def stats_packed(x2, threshold):
    """Packed single-reduction arm: per element (m << 16) + vclip, ONE row
    sum, then unpack cnt/vsum from the halves. Measured 7x slower than the
    two-reduction baseline on v5e (the wide-constant add defeats XLA's
    cheap mask-sum lowering) — kept here as the reproducible evidence the
    ops/chunk_stats.py docstring cites."""
    thr = jnp.asarray(threshold, jnp.int32)
    m = (x2 < thr).astype(jnp.int32)
    d = thr - jnp.maximum(x2, thr - 512)
    vclip = jnp.clip(d, 0, 256)
    s = jnp.sum((m << 16) + vclip, axis=1)
    cnt = s >> 16
    vs = jnp.minimum(s & 0xFFFF, 511)
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

    f_base = jax.jit(chunk_stats_xla)
    f_packed = jax.jit(stats_packed)
    t_base = time_amortized(f_base, x2, thr, k=16)
    print(f"stats baseline (2 reductions): {t_base * 1e3:.4f} ms")
    t_packed = time_amortized(f_packed, x2, thr, k=16)
    print(f"stats packed   (1 reduction) : {t_packed * 1e3:.4f} ms")

    # exactness cross-check on device (tiny readback)
    so, bo = f_base(x2, thr)
    sn, bn = f_packed(x2, thr)
    eq = bool(jnp.all(so == sn) & jnp.all(bo == bn))
    print("exact match:", eq)

    t_f = time_amortized(jax.jit(filter_sparse), x, k=16)
    print(
        f"filter_sparse 2^24: {t_f * 1e3:.4f} ms = {N / t_f / 1e9:.1f} Grows/s"
    )


if __name__ == "__main__":
    main()
