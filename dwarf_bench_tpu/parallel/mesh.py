"""Device mesh helpers (single-process, multi-process, and 2-D DCN x ICI).

The reference is strictly single-device (SURVEY.md §2.4 item 8 — no
collectives anywhere); the multi-chip layer exists to scale the same
operators across a TPU pod slice per BASELINE.json. Everything here is
standard jax.sharding: a 1-D mesh over all addressable devices ("x" axis is
the row/data axis) for single-host runs, and a 2-D (dcn, ici) mesh for
multi-host runs — outer axis across hosts (slow DCN links), inner axis
across the chips of a host (fast ICI) — so shard_map kernels can route
collectives hierarchically (shuffle.partition_for_shuffle_2d).

Multi-host runtime (SURVEY.md §5.8: "jax.distributed multi-host runtime;
mesh over pod slice"): ``init_multihost`` wraps ``jax.distributed
.initialize``; after it, ``jax.devices()`` is the GLOBAL device list in
process-major order, which is exactly the (host, chip) order
``make_mesh_2d`` expects. Virtual testing without hardware: processes x
``--xla_force_host_platform_device_count`` CPU devices fake a pod slice
(tests/test_multihost.py), the same test-double convention as the 1-D
virtual mesh in tests/conftest.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ROW_AXIS = "x"
DCN_AXIS = "dcn"  # across hosts
ICI_AXIS = "ici"  # within a host


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> None:
    """Bring up the jax.distributed multi-host runtime. On TPU pods the
    arguments are auto-detected from the environment (pass nothing); for
    CPU/virtual multi-process runs pass coordinator/num_processes/
    process_id explicitly. Safe to call once per process, before any
    computation. No-op in an already-initialized process."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
    except RuntimeError as e:  # already initialized
        if "already initialized" not in str(e):
            raise


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (ROW_AXIS,))


def make_mesh_2d(
    n_hosts: Optional[int] = None,
    chips_per_host: Optional[int] = None,
    devices=None,
) -> Mesh:
    """(dcn, ici) mesh. Defaults: n_hosts = jax.process_count() and all
    devices — the real multi-host shape, since jax.devices() is
    process-major after init_multihost. Pass explicit factors to fake a
    multi-host topology on a single process's virtual devices."""
    if devices is None:
        devices = jax.devices()
    if n_hosts is None:
        n_hosts = max(jax.process_count(), 1)
    if chips_per_host is None:
        chips_per_host = len(devices) // n_hosts
    grid = np.asarray(devices[: n_hosts * chips_per_host]).reshape(
        n_hosts, chips_per_host
    )
    return Mesh(grid, (DCN_AXIS, ICI_AXIS))


def row_sharding(mesh: Mesh) -> NamedSharding:
    """Rows (elements) split across all the mesh's axes, major-to-minor."""
    return NamedSharding(mesh, P(tuple(mesh.axis_names)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_rows(mesh: Mesh, *arrays):
    """Device_put host arrays row-sharded over the mesh."""
    sh = row_sharding(mesh)
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) != 1 else out[0]
