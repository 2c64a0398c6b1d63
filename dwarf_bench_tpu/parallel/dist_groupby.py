"""Distributed group-by aggregation over a device mesh.

Two shapes, both generalizations of the reference's GroupByLocal
partition+merge design (groupby/groupby_local.cpp:58-112) from work-items to
chips:

  * ``dist_groupby_dense`` — every chip aggregates its row shard into a
    private dense partial (the per-executor LinearHashtable analog), then a
    single ``psum`` over ICI merges partials (the serial-merge analog).
    Right shape when groups_count is small enough to replicate.
  * ``dist_groupby_shuffle`` — rows are hash-partitioned by key across chips
    (all-to-all), each chip aggregates only the keys it owns, and the output
    stays sharded by key range. Right shape for large key spaces.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.groupby import groupby_sum_matmul, groupby_sum_sorted
from ..ops.hashtable import EMPTY
from .mesh import ROW_AXIS
from .shuffle import partition_for_shuffle


def dist_groupby_dense(mesh: Mesh, num_groups: int):
    """Returns a jitted fn(keys, vals) with keys/vals row-sharded over the
    mesh and a replicated dense output."""

    def local(keys, vals):
        if num_groups <= 4096:
            partial_sums = groupby_sum_matmul(keys, vals, num_groups)
        else:
            partial_sums = groupby_sum_sorted(keys, vals, num_groups)
        return jax.lax.psum(partial_sums.astype(jnp.uint32), ROW_AXIS)

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(P(ROW_AXIS), P(ROW_AXIS)),
            out_specs=P(),
        )
    )


def dist_groupby_shuffle(mesh: Mesh, num_groups: int, capacity: int):
    """Shuffle-based group-by: output sharded by key ownership.

    Key k is owned by chip ``hash(k) % n``; each chip returns a dense
    (num_groups,) partial containing sums ONLY for keys it owns (zeros
    elsewhere), so summing the sharded outputs reproduces the dense result
    — callers usually keep them sharded.
    """
    n_chips = mesh.shape[ROW_AXIS]

    def local(keys, vals):
        rk, rv, rcnt, overflow = partition_for_shuffle(
            keys, vals, n_chips, capacity, ROW_AXIS
        )
        flat_k = rk.reshape(-1)
        flat_v = rv.reshape(-1)
        valid = flat_k != EMPTY
        # masked rows aggregate into a sacrificial group slot
        k_dense = jnp.where(valid, flat_k, jnp.uint32(num_groups)).astype(
            jnp.int32
        )
        v_masked = jnp.where(valid, flat_v, 0)
        out = jnp.zeros((num_groups + 1,), jnp.int32)
        out = out.at[k_dense].add(v_masked.astype(jnp.int32))
        return out[None, :num_groups].astype(jnp.uint32), overflow.reshape(1)

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(P(ROW_AXIS), P(ROW_AXIS)),
            out_specs=(P(ROW_AXIS), P(ROW_AXIS)),
        )
    )
