"""One-off TPU measurement: counting sort vs XLA sort at benchmark scale.

Usage: python scripts/measure_sort.py [log2_n]
Prints rows/s for sort_xla, sort_counting, sort_auto and the sub-pieces
(histogram_16k, long cumsum) so the hot piece is identifiable.
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from dwarf_bench_tpu.ops import sort
    from dwarf_bench_tpu.utils.timing import time_amortized

    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    n = 1 << logn
    rng = np.random.default_rng(0)
    x = jax.device_put(
        rng.integers(1, 10000, n, endpoint=True).astype(np.int32)
    )
    print(f"n = 2^{logn} on {jax.devices()[0]}", flush=True)

    pieces = [
        ("histogram_16k", sort.histogram_16k, (x,)),
        ("cumsum_n", jax.jit(lambda v: jnp.cumsum(v, dtype=jnp.int32)), (x,)),
        ("sort_counting", sort.sort_counting, (x,)),
        ("sort_auto", sort.sort_auto, (x,)),
        ("sort_xla", sort.sort_xla, (x,)),
    ]
    for name, fn, args in pieces:
        t0 = time.time()
        try:
            dt = time_amortized(fn, *args, k=8)
        except Exception as e:  # noqa: BLE001
            print(f"{name:>16}: FAILED {type(e).__name__}: {e}", flush=True)
            continue
        print(
            f"{name:>16}: {dt * 1e3:8.3f} ms  {n / dt / 1e9:7.2f} Grows/s"
            f"   (compile+measure {time.time() - t0:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
