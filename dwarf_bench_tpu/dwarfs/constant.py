"""Kernel-launch overhead baselines: ConstantExample family.

Reference: constant/constant.cpp + constant.cl (``out[0] = 42`` single-task
kernel, via C++ and the raw C API) and constant/constant_dpcpp.cpp (16-wide
parallel_for writing 42). None of them record meter results — they print the
output for a visual check. The TPU analog dispatches a minimal jitted store.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..common.options import DeviceType
from .base import TpuDwarf, block


@jax.jit
def _constant_kernel():
    return jnp.full((1,), 42, jnp.int32)


@jax.jit
def _constant_kernel_wide():
    # 16-wide store like constant_dpcpp.cpp:25-29
    return jnp.full((16,), 42, jnp.int32)


class _ConstantBase(TpuDwarf):
    kernel = staticmethod(_constant_kernel)

    def _run(self, buf_size: int, meter) -> None:
        opts = meter.opts
        device = self.device(opts)
        for _ in range(opts.iterations):
            out = block(
                jax.device_put(self.kernel(), device)
            )
            print(f"42 = {int(jnp.ravel(out)[0])}")
            # no meter.add_result — matches the reference (constant.cpp)


class ConstantExample(_ConstantBase):
    def __init__(self):
        super().__init__("ConstantExample")


class ConstantExampleCAPI(_ConstantBase):
    def __init__(self):
        super().__init__("ConstantExampleCAPI")


class ConstantExampleDPCPP(_ConstantBase):
    kernel = staticmethod(_constant_kernel_wide)

    def __init__(self, name: str = "ConstantExampleDPCPP"):
        super().__init__(name)


class ConstantExampleDPCPPCuda(ConstantExampleDPCPP):
    def __init__(self):
        super().__init__("ConstantExampleDPCPPCuda")

    def device(self, opts):
        from ..common.device import resolve_device

        return resolve_device(DeviceType.TPU)
