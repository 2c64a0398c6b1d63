"""Filter / two-pass scan (stream compaction).

TPU-native re-derivation of the reference's scan dwarfs:
  - TwoPassScan (scan/scan.cl:3-42): pass 1 counts matches per thread chunk,
    serial exclusive prefix over per-thread counts, pass 2 scatters matches.
  - DPLScan (scan/dplscan.cpp:43-44): oneDPL copy_if.

Both filter ``x < 5`` over int columns. The two-pass structure is already the
idiomatic TPU answer to a dynamic-size output; here the "threads" are VMEM
tiles and the prefix over tile counts is a cumsum. Two implementations:

  * ``filter_xla`` — mask → cumsum → scatter-to-rank, fully fused by XLA.
  * ``filter_two_pass`` — explicit tiled two-pass using per-tile counts +
    exclusive tile offsets (mirrors the reference kernel structure but
    vectorized; still XLA ops, Pallas variant lives in scan_pallas.py).

Outputs follow the fixed-capacity + count pattern: ``(out[capacity], count)``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .primitives import compact, exclusive_cumsum

DEFAULT_THRESHOLD = 5  # reference predicate: x < 5 (scan/scan.cl:14)


@partial(jax.jit, static_argnames=("capacity",))
def filter_xla(x: jnp.ndarray, threshold=DEFAULT_THRESHOLD, capacity=None):
    """copy_if(x, x < threshold) → (out, count)."""
    return compact(x, x < threshold, capacity=capacity)


@partial(jax.jit, static_argnames=("capacity", "tile"))
def filter_two_pass(
    x: jnp.ndarray,
    threshold=DEFAULT_THRESHOLD,
    capacity: int | None = None,
    tile: int = 8192,
):
    """Two-pass tiled filter mirroring scan/scan.cl's structure.

    Pass 1: per-tile match counts. Prefix: exclusive cumsum over tile counts
    (the reference's thread-0 serial loop, scan.cl:23-31). Pass 2: each tile
    scatters its matches at ``tile_offset + rank_within_tile``.
    """
    n = x.shape[0]
    if capacity is None:
        capacity = n
    pad = (-n) % tile
    xp = jnp.pad(x, (0, pad), constant_values=jnp.asarray(threshold, x.dtype))
    tiles = xp.reshape(-1, tile)
    mask = (tiles < threshold).astype(jnp.int32)
    tile_counts = jnp.sum(mask, axis=1)  # pass 1
    tile_offsets = exclusive_cumsum(tile_counts)  # prefix
    count = tile_offsets[-1] + tile_counts[-1]
    # pass 2: global rank = tile offset + exclusive rank within the tile
    rank_in_tile = jnp.cumsum(mask, axis=1) - mask
    rank = tile_offsets[:, None] + rank_in_tile
    idx = jnp.where((mask > 0) & (rank < capacity), rank, capacity)
    out = jnp.zeros((capacity,), dtype=x.dtype)
    out = out.at[idx.reshape(-1)].set(xp, mode="drop")
    return out, count.astype(jnp.int32)


def filter_oracle(x, threshold=DEFAULT_THRESHOLD):
    """Host oracle: std::copy_if equivalent (scan/scan.cpp:12-17)."""
    import numpy as np

    x = np.asarray(x)
    return x[x < threshold]
