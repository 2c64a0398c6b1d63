"""Hash-partition shuffle: the distributed exchange for join/groupby keys.

Not present in the reference (single-device); designed per BASELINE.json's
north star: tables hash-partitioned across chips, ragged all-to-all exchange
for join/groupby keys over ICI.

TPU/XLA has no ragged all-to-all, so the exchange is the fixed-capacity +
count pattern across chips: each chip buckets its local rows by destination
chip (``hash(key) % n_chips``), compacts each destination's rows into a
fixed-capacity slot of a (n_chips, capacity) send buffer, and a single
``all_to_all`` over the row axis swaps slots. Receivers get a
(n_chips, capacity) buffer plus per-source counts; padding rows carry an
EMPTY sentinel key so downstream kernels mask them without data-dependent
shapes.

Capacity policy: ``capacity = ceil(rows_per_chip / n_chips * slack)``;
overflowing rows would be dropped, so callers pick slack for their key
distribution (uniform hashing concentrates around the mean; skewed keys
need the skew-aware pre-pass in dist_join.py). Overflow is *detected* and
reported in the returned counts so correctness is checkable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.hashing import murmur3_32
from ..ops.hashtable import EMPTY

SHUFFLE_SEED = np.uint32(0x9747B28C)


def partition_for_shuffle(
    keys: jnp.ndarray,
    vals: jnp.ndarray,
    n_chips: int,
    capacity: int,
    axis_name: str,
    drop: jnp.ndarray | None = None,
):
    """Inside shard_map: bucket local rows by destination chip and exchange.

    Returns ``(recv_keys, recv_vals, recv_counts, send_overflow)`` where
    recv_* have shape (n_chips, capacity) — slot i holds rows sent by chip i
    — and recv_counts[i] is the valid-row count in slot i. Padding keys are
    EMPTY.
    """
    n = keys.shape[0]
    k = keys.astype(jnp.uint32)
    dest = (murmur3_32(k, SHUFFLE_SEED) % jnp.uint32(n_chips)).astype(jnp.int32)
    if drop is not None:
        # dropped rows route to a virtual destination past the last chip and
        # never enter any send slot (the skew-aware join excludes heavy keys
        # from the hash shuffle this way)
        dest = jnp.where(drop, n_chips, dest)

    # Stable sort rows by destination, then slice per-destination ranges
    # into the fixed-capacity send buffer via rank-within-destination.
    sd, sk, sv = jax.lax.sort(
        (dest, k, vals.astype(jnp.uint32)), num_keys=1, is_stable=True
    )
    ones = jnp.ones_like(sd)
    # rank within destination = position − first index of that destination
    counts = jnp.zeros((n_chips,), jnp.int32).at[sd].add(ones)
    starts = jnp.cumsum(counts) - counts
    rank = jnp.arange(n, dtype=jnp.int32) - starts[sd]
    in_cap = rank < capacity
    flat = sd * capacity + rank
    send_keys = jnp.full((n_chips * capacity,), EMPTY, jnp.uint32)
    send_vals = jnp.zeros((n_chips * capacity,), jnp.uint32)
    safe = jnp.where(in_cap, flat, n_chips * capacity)
    send_keys = send_keys.at[safe].set(sk, mode="drop")
    send_vals = send_vals.at[safe].set(sv, mode="drop")
    send_counts = jnp.minimum(counts, capacity)
    overflow = jnp.sum(counts - send_counts)

    send_keys = send_keys.reshape(n_chips, capacity)
    send_vals = send_vals.reshape(n_chips, capacity)
    # Exchange: slot j of chip i → slot i of chip j.
    recv_keys = jax.lax.all_to_all(
        send_keys, axis_name, split_axis=0, concat_axis=0, tiled=False
    )
    recv_vals = jax.lax.all_to_all(
        send_vals, axis_name, split_axis=0, concat_axis=0, tiled=False
    )
    recv_counts = jax.lax.all_to_all(
        send_counts.reshape(n_chips, 1), axis_name,
        split_axis=0, concat_axis=0, tiled=False,
    ).reshape(n_chips)
    return recv_keys, recv_vals, recv_counts, overflow
