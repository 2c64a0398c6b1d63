"""One-off TPU measurement: dense CSR join vs the general sort-merge path.

Usage: python scripts/measure_join.py [log2_n]
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from dwarf_bench_tpu.ops import csr_join
    from dwarf_bench_tpu.ops.mxu_gather import gather_16k  # noqa: F401
    from dwarf_bench_tpu.ops.primitives import sort_by_key
    from dwarf_bench_tpu.utils.timing import time_amortized

    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n = 1 << logn
    rng = np.random.default_rng(0)
    A = rng.integers(1, 10000, n, endpoint=True).astype(np.uint32)
    B = rng.integers(1, 10000, n, endpoint=True).astype(np.uint32)
    d = int(len(np.unique(A)))
    da, db = jax.device_put(A), jax.device_put(B)
    print(f"n = 2^{logn}, distinct = {d}, on {jax.devices()[0]}", flush=True)

    @jax.jit
    def join_dense(a, b):
        t = csr_join.build_dense(a)
        r = csr_join.probe_dense(t, b)
        return r.pos, r.counts

    @jax.jit
    def join_general(a, b):
        t = csr_join.build(a, d, 2 * d)
        r = csr_join.probe_merge(t, b)
        return r.pos, r.counts

    @jax.jit
    def pair_sort(a):
        return sort_by_key(a, jnp.arange(a.shape[0], dtype=jnp.uint32))

    tbl = jax.device_put(np.arange(16384).astype(np.int32))
    ki = jax.device_put((A.astype(np.int32) - 1))

    pieces = [
        ("gather_16k(3p)", lambda t_, k_: gather_16k(t_, k_, planes=3),
         (tbl, ki)),
        ("pair_sort", pair_sort, (da,)),
        ("join_dense", join_dense, (da, db)),
        ("join_general", join_general, (da, db)),
    ]
    for name, fn, args in pieces:
        t0 = time.time()
        try:
            dt = time_amortized(fn, *args, k=8)
        except Exception as e:  # noqa: BLE001
            print(f"{name:>14}: FAILED {type(e).__name__}: {e}", flush=True)
            continue
        print(
            f"{name:>14}: {dt * 1e3:8.3f} ms  {n / dt / 1e9:7.2f} Grows/s"
            f"   (compile+measure {time.time() - t0:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
