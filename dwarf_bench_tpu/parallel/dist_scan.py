"""Distributed filter/scan over a device mesh.

Each chip compacts its row shard locally (the two-pass structure runs
per-chip); global offsets come from an exclusive scan over per-chip counts
computed with collectives — no data movement beyond the counts, matching
how columnar engines keep filtered partitions chip-resident.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.scan import filter_sparse
from .mesh import ROW_AXIS


def dist_filter(mesh: Mesh, threshold: int, capacity_per_chip: int):
    """Returns jitted fn(x_rowsharded) → (per-chip compacted buffers
    [row-sharded], per-chip counts, global exclusive offsets, total).

    The per-chip compaction is the sparsity-adaptive engine
    (ops/scan.filter_sparse — near read-bound at benchmark selectivity,
    butterfly fallback otherwise), so the distributed filter scales the
    single-chip hot path rather than a slower formulation."""
    n_chips = mesh.shape[ROW_AXIS]

    def local(x):
        out, cnt = filter_sparse(x, threshold, capacity=capacity_per_chip)
        # exclusive prefix of counts across chips: psum of masked counts
        idx = jax.lax.axis_index(ROW_AXIS)
        all_counts = jax.lax.all_gather(cnt, ROW_AXIS)  # (n_chips,)
        offsets = jnp.cumsum(all_counts) - all_counts
        total = jax.lax.psum(cnt, ROW_AXIS)  # provably replicated
        return out[None], cnt[None], offsets[idx][None], total

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(P(ROW_AXIS),),
            out_specs=(P(ROW_AXIS), P(ROW_AXIS), P(ROW_AXIS), P()),
        )
    )
