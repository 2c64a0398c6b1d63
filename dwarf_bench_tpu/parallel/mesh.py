"""Device mesh helpers.

The reference is strictly single-device (SURVEY.md §2.4 item 8 — no
collectives anywhere); the multi-chip layer exists to scale the same
operators across a TPU pod slice per BASELINE.json. Everything here is
standard jax.sharding: a 1-D mesh over all addressable devices ("x" axis is
the row/data axis), with shard_map kernels in the sibling modules.

Virtual testing: with ``XLA_FLAGS=--xla_force_host_platform_device_count=N``
and the CPU platform, ``make_mesh(N)`` fakes an N-chip mesh (the test-double
convention of tests/conftest.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ROW_AXIS = "x"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (ROW_AXIS,))


def row_sharding(mesh: Mesh) -> NamedSharding:
    """Rows (elements) split across the mesh's x axis."""
    return NamedSharding(mesh, P(ROW_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_rows(mesh: Mesh, *arrays):
    """Device_put host arrays row-sharded over the mesh."""
    sh = row_sharding(mesh)
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) != 1 else out[0]
