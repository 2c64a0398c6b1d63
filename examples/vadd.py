"""Minimal device kernel demo — the equivalent of vadd.cl / simple.cpp:
elementwise vector add, once as plain jnp (XLA-fused) and once as an
explicit Pallas VMEM kernel."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def vadd_xla(a, b):
    return a + b


def vadd_pallas(a, b):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = a_ref[:] + b_ref[:]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, b)


def main() -> None:
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((8, 128), dtype=np.float32))
    b = jnp.asarray(rng.standard_normal((8, 128), dtype=np.float32))
    out = vadd_xla(a, b)
    print("xla vadd ok:", bool(jnp.allclose(out, a + b)))
    try:
        out_p = vadd_pallas(a, b)
        print("pallas vadd ok:", bool(jnp.allclose(out_p, a + b)))
    except Exception as e:  # Pallas needs a TPU (or interpret mode)
        print(f"pallas vadd skipped: {type(e).__name__}")


if __name__ == "__main__":
    main()
