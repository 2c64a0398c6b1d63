"""Device selection: map DeviceType → a concrete jax.Device.

TPU-native replacement for the reference's SYCL device selector + env
steering (common/dpcpp/dpcpp_common.hpp:5-8, common/common.cpp:43-56 which
sets SYCL_DEVICE_FILTER). In JAX the platform is chosen per-array: dwarfs
``jax.device_put`` their inputs onto the resolved device and jit dispatch
follows data placement — no process-global env mutation needed.
"""

from __future__ import annotations

import functools
import os
import pathlib
from typing import Optional

import jax

from .options import DeviceType


def enable_persistent_compile_cache() -> Optional[str]:
    """Turn on JAX's persistent compilation cache for this process.

    Remote compiles on the tunneled TPU cost 10 s – 10 min per shape; the
    axon PJRT plugin supports executable serialization (verified: cache
    entries round-trip), so a persistent cache turns every repeat shape —
    across processes — into a ~second deserialize. Default location is
    ``<repo>/.jax_cache`` (so benchmark sweeps, the CLI, and bench.py share
    entries); override with ``JAX_COMPILATION_CACHE_DIR``. No-op if the
    directory cannot be created.

    Accelerator backends only: XLA:CPU caches AOT machine code keyed on
    host CPU features (plus pseudo-features like prefer-no-scatter that
    differ between plugin configurations), so cross-process CPU cache loads
    warn about feature mismatches and risk SIGILL on a different host —
    and local CPU compiles are fast enough not to need caching.

    The gate below checks the DEFAULT backend, and the cache config is
    process-global: in a process whose default backend is an accelerator
    but which also compiles for the host (device placement is per-array in
    this framework), XLA:CPU executables land in the cache too. Callers on
    known-CPU-only paths therefore skip this call entirely (cli.py gates on
    the requested --device before touching the backend)."""
    if jax.default_backend() == "cpu":
        return None
    path = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if not path:
        path = str(pathlib.Path(__file__).resolve().parents[2] / ".jax_cache")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # remote compiles dwarf the entry-write cost at any compile time
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:  # noqa: BLE001 — cache is an optimization only
        return None
    return path


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
