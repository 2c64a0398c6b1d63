"""Distributed one-to-many hash join over a device mesh.

Not in the reference (single-device); built per BASELINE.json: both tables
hash-partitioned by key across chips via the fixed-capacity all-to-all
shuffle (shuffle.py), then each chip runs the single-chip CSR join
(ops/csr_join.py) over the keys it owns. Row ids are carried through the
shuffle as payload so the join output references GLOBAL row ids.

Returned per chip: per-received-B-row (found, count) plus the global match
total (psum) — the aggregate the scaling benchmark measures.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import csr_join
from ..ops.hashtable import EMPTY
from .mesh import ROW_AXIS
from .shuffle import partition_for_shuffle


def dist_csr_join(mesh: Mesh, rows_per_chip: int, distinct_cap: int,
                  ht_size: int, shuffle_capacity: int):
    """Returns a jitted fn(a_keys, b_keys) over row-sharded inputs.

    Outputs (all row-sharded by chip): local match counts per received B
    row, per-chip match totals, global total (replicated), and shuffle
    overflow counters (must be 0 for a correct run).
    """
    n_chips = mesh.shape[ROW_AXIS]

    def local(a_keys, b_keys):
        my = jax.lax.axis_index(ROW_AXIS).astype(jnp.uint32)
        base = my * jnp.uint32(rows_per_chip)
        a_ids = base + jnp.arange(a_keys.shape[0], dtype=jnp.uint32)
        b_ids = base + jnp.arange(b_keys.shape[0], dtype=jnp.uint32)

        rak, rai, _, ov_a = partition_for_shuffle(
            a_keys, a_ids, n_chips, shuffle_capacity, ROW_AXIS
        )
        rbk, rbi, _, ov_b = partition_for_shuffle(
            b_keys, b_ids, n_chips, shuffle_capacity, ROW_AXIS
        )
        flat_ak = rak.reshape(-1)
        flat_ai = rai.reshape(-1)
        flat_bk = rbk.reshape(-1)

        table = csr_join.build(
            flat_ak, distinct_cap, ht_size, row_ids=flat_ai
        )
        res = csr_join.probe_merge(table, flat_bk)
        local_matches = jnp.sum(
            jnp.where(res.found, res.counts, 0).astype(jnp.int32)
        )
        total = jax.lax.psum(local_matches, ROW_AXIS)
        counts_out = jnp.where(res.found, res.counts, 0)
        return (
            counts_out[None],
            local_matches[None],
            total,
            (ov_a + ov_b).reshape(1),
        )

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(P(ROW_AXIS), P(ROW_AXIS)),
            out_specs=(P(ROW_AXIS), P(ROW_AXIS), P(), P(ROW_AXIS)),
        )
    )
