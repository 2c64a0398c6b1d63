"""Device selection: map DeviceType → a concrete jax.Device.

TPU-native replacement for the reference's SYCL device selector + env
steering (common/dpcpp/dpcpp_common.hpp:5-8, common/common.cpp:43-56 which
sets SYCL_DEVICE_FILTER). In JAX the platform is chosen per-array: dwarfs
``jax.device_put`` their inputs onto the resolved device and jit dispatch
follows data placement — no process-global env mutation needed.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax

from .options import DeviceType


@functools.lru_cache(maxsize=None)
def _devices_by_platform(platform: str):
    try:
        return tuple(jax.devices(platform))
    except RuntimeError:
        return ()


def accelerator_platform() -> Optional[str]:
    """The accelerator platform, if this process has one.

    Only the DEFAULT backend is consulted — probing named platforms (e.g.
    ``jax.devices("tpu")``) can try to initialize a backend that is not the
    configured one and block indefinitely on plugin/tunnel setups."""
    default = jax.devices()[0].platform
    return default if default != "cpu" else None


def resolve_device(device_ty: DeviceType) -> jax.Device:
    """DeviceType → jax.Device. CPU → host backend; TPU/Default → the
    accelerator when present, else CPU (mirrors the reference's default
    selector falling back, dpcpp_common.hpp:5-8)."""
    if device_ty == DeviceType.CPU:
        cpus = _devices_by_platform("cpu")
        if cpus:
            return cpus[0]
        return jax.devices()[0]
    platform = accelerator_platform()
    if platform is not None:
        return _devices_by_platform(platform)[0]
    return jax.devices()[0]


def device_available(device_ty: DeviceType) -> bool:
    if device_ty == DeviceType.CPU:
        return bool(_devices_by_platform("cpu"))
    return accelerator_platform() is not None
