"""Distributed sample sort over a device mesh.

The single-chip Radix dwarf delegates to the device sort (sort/radix.cpp:34
delegates to oneDPL); across chips the idiomatic TPU scale-out is a sample
sort: local sort → gather splitter samples → partition rows into chip
ranges → fixed-capacity all-to-all → local sort of received rows. Output is
globally sorted across the chip order with per-chip counts (fixed-capacity
+ count pattern; capacity slack absorbs partition imbalance — uniform data
concentrates near rows_per_chip, skew needs larger slack).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.hashtable import EMPTY
from .mesh import ROW_AXIS

_SAMPLES_PER_CHIP = 64


def dist_sort(mesh: Mesh, capacity_per_chip: int):
    """Returns jitted fn(x_rowsharded) → (sorted buffers (chips, capacity)
    with EMPTY padding [row-sharded], per-chip valid counts, overflow)."""
    n_chips = mesh.shape[ROW_AXIS]

    def local(x):
        n = x.shape[0]
        xs = jax.lax.sort(x.astype(jnp.uint32))
        # evenly spaced local samples → global splitters
        step = max(n // _SAMPLES_PER_CHIP, 1)
        samples = xs[:: step][:_SAMPLES_PER_CHIP]
        all_samples = jax.lax.all_gather(samples, ROW_AXIS).reshape(-1)
        all_samples = jax.lax.sort(all_samples)
        m = all_samples.shape[0]
        # n_chips-1 splitters at even quantiles
        idx = (jnp.arange(1, n_chips) * m) // n_chips
        splitters = all_samples[idx]  # ascending
        # destination chip per row = number of splitters ≤ value
        dest = jnp.searchsorted(splitters, xs, side="right").astype(jnp.int32)
        # xs sorted ⇒ dest non-decreasing ⇒ per-dest ranges are contiguous
        counts = jnp.zeros((n_chips,), jnp.int32).at[dest].add(1)
        starts = jnp.cumsum(counts) - counts
        rank = jnp.arange(n, dtype=jnp.int32) - starts[dest]
        in_cap = rank < capacity_per_chip
        flat = dest * capacity_per_chip + rank
        send = jnp.full((n_chips * capacity_per_chip,), EMPTY, jnp.uint32)
        send = send.at[jnp.where(in_cap, flat, send.shape[0])].set(
            xs, mode="drop"
        )
        overflow = jnp.sum(counts - jnp.minimum(counts, capacity_per_chip))
        recv = jax.lax.all_to_all(
            send.reshape(n_chips, capacity_per_chip), ROW_AXIS,
            split_axis=0, concat_axis=0, tiled=False,
        ).reshape(-1)
        # local sort of received rows; EMPTY padding sorts to the end
        out = jax.lax.sort(recv)
        valid = jnp.sum((out != EMPTY).astype(jnp.int32))
        return out[None], valid[None], overflow[None]

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(P(ROW_AXIS),),
            out_specs=(P(ROW_AXIS), P(ROW_AXIS), P(ROW_AXIS)),
        )
    )
