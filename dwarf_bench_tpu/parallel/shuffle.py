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
shapes. Payloads are a TUPLE of uint32 columns — any number, so wider rows
(values + global ids, 64-bit quantities as two columns) ride the same
exchange.

Capacity policy: ``capacity = ceil(rows_per_chip / n_chips * slack)``;
overflowing rows would be dropped, so callers pick slack for their key
distribution (uniform hashing concentrates around the mean; skewed keys
need the skew-aware pre-pass in dist_join.py). Overflow is *detected* and
reported in the returned counts so correctness is checkable.

``partition_for_shuffle_2d`` is the hierarchical variant for a 2-D
(DCN x ICI) mesh (SURVEY.md §5.8: mesh over pod slice, collectives laid out
so they ride ICI, not DCN): the classic two-hop all-to-all decomposition.
Rows route first over ICI to the chip whose ici-index matches the
destination's, then over DCN between same-ici-index chips — every row
crosses the slow DCN fabric exactly once and each DCN message aggregates
a whole host's worth of rows for its destination.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.hashing import murmur3_32
from ..ops.hashtable import EMPTY

SHUFFLE_SEED = np.uint32(0x9747B28C)


def _bucket_exchange(keys, payloads, dest, n_buckets, capacity, axis_name):
    """Core exchange: compact local rows into fixed-capacity per-destination
    slots and swap slot j of chip i with slot i of chip j over ``axis_name``.

    ``dest`` values outside [0, n_buckets) mark dropped rows (padding,
    caller-excluded keys): they enter no slot and count toward no overflow.

    Returns (recv_keys (n_buckets, capacity), recv_payloads tuple of same
    shape, recv_counts (n_buckets,), send_overflow scalar).
    """
    n = keys.shape[0]
    k = keys.astype(jnp.uint32)
    cols = tuple(p.astype(jnp.uint32) for p in payloads)

    # Stable sort rows by destination, then slice per-destination ranges
    # into the fixed-capacity send buffer via rank-within-destination.
    sorted_ops = jax.lax.sort((dest, k) + cols, num_keys=1, is_stable=True)
    sd, sk, sps = sorted_ops[0], sorted_ops[1], sorted_ops[2:]
    ones = jnp.ones_like(sd)
    dropped = sd >= n_buckets
    sd_safe = jnp.where(dropped, 0, sd)
    counts = jnp.zeros((n_buckets,), jnp.int32).at[sd_safe].add(
        jnp.where(dropped, 0, ones)
    )
    starts = jnp.cumsum(counts) - counts
    # rank within destination = position − first index of that destination
    rank = jnp.arange(n, dtype=jnp.int32) - starts[sd_safe]
    in_cap = (rank < capacity) & ~dropped
    flat = jnp.where(in_cap, sd_safe * capacity + rank, n_buckets * capacity)

    def scatter(col, fill):
        buf = jnp.full((n_buckets * capacity,), fill, jnp.uint32)
        return buf.at[flat].set(col, mode="drop").reshape(
            n_buckets, capacity
        )

    send_keys = scatter(sk, EMPTY)
    send_cols = tuple(scatter(c, np.uint32(0)) for c in sps)
    send_counts = jnp.minimum(counts, capacity)
    overflow = jnp.sum(counts - send_counts)

    # Exchange: slot j of chip i → slot i of chip j.
    def a2a(x):
        return jax.lax.all_to_all(
            x, axis_name, split_axis=0, concat_axis=0, tiled=False
        )

    recv_keys = a2a(send_keys)
    recv_cols = tuple(a2a(c) for c in send_cols)
    recv_counts = a2a(send_counts.reshape(n_buckets, 1)).reshape(n_buckets)
    return recv_keys, recv_cols, recv_counts, overflow


def shuffle_dest(keys, n_chips):
    """Destination chip of each key: murmur3(key) % n_chips."""
    return (
        murmur3_32(keys.astype(jnp.uint32), SHUFFLE_SEED)
        % jnp.uint32(n_chips)
    ).astype(jnp.int32)


def partition_for_shuffle(
    keys: jnp.ndarray,
    payloads,
    n_chips: int,
    capacity: int,
    axis_name: str,
    drop: jnp.ndarray | None = None,
):
    """Inside shard_map: bucket local rows by destination chip and exchange.

    ``payloads``: tuple of uint32-castable columns riding with the keys
    (values, global row ids, …; a single bare array is accepted and treated
    as a 1-tuple).

    Returns ``(recv_keys, recv_payloads, recv_counts, send_overflow)`` where
    recv_keys / each recv_payloads column has shape (n_chips, capacity) —
    slot i holds rows sent by chip i — and recv_counts[i] is the valid-row
    count in slot i. Padding keys are EMPTY. ``recv_payloads`` is a tuple
    matching ``payloads``; when a bare array was passed, a bare array is
    returned.
    """
    bare = not isinstance(payloads, (tuple, list))
    cols = (payloads,) if bare else tuple(payloads)
    dest = shuffle_dest(keys, n_chips)
    if drop is not None:
        # dropped rows route to a virtual destination past the last chip and
        # never enter any send slot (the skew-aware join excludes heavy keys
        # from the hash shuffle this way)
        dest = jnp.where(drop, n_chips, dest)
    rk, rcols, rcnt, ov = _bucket_exchange(
        keys, cols, dest, n_chips, capacity, axis_name
    )
    return rk, (rcols[0] if bare else rcols), rcnt, ov


def partition_for_shuffle_2d(
    keys: jnp.ndarray,
    payloads,
    n_dcn: int,
    n_ici: int,
    cap_ici: int,
    cap_dcn: int,
    dcn_axis: str,
    ici_axis: str,
    drop: jnp.ndarray | None = None,
):
    """Two-hop hierarchical exchange on a (dcn, ici) mesh.

    Destination chip of key k is ``d* x n_ici + i*`` with
    ``dest = hash(k) % (n_dcn * n_ici)``. Hop 1 buckets by ``i*`` and
    exchanges over the fast ICI axis; hop 2 re-derives ``d*`` from the
    received keys (keys travel, so no routing column is carried), buckets
    by it, and exchanges over the DCN axis between same-ici-index chips.
    Each row crosses DCN exactly once.

    Returns ``(recv_keys (n_dcn, cap_dcn), recv_payloads, recv_counts,
    overflow)`` — overflow sums both hops.
    """
    bare = not isinstance(payloads, (tuple, list))
    cols = (payloads,) if bare else tuple(payloads)
    n_total = n_dcn * n_ici

    dest = (
        murmur3_32(keys.astype(jnp.uint32), SHUFFLE_SEED)
        % jnp.uint32(n_total)
    ).astype(jnp.int32)
    i_star = dest % n_ici
    if drop is not None:
        i_star = jnp.where(drop, n_ici, i_star)
    rk1, rcols1, _, ov1 = _bucket_exchange(
        keys, cols, i_star, n_ici, cap_ici, ici_axis
    )

    k1 = rk1.reshape(-1)
    cols1 = tuple(c.reshape(-1) for c in rcols1)
    dest2 = (
        murmur3_32(k1, SHUFFLE_SEED) % jnp.uint32(n_total)
    ).astype(jnp.int32)
    # hop-1 padding rows (EMPTY keys) route to a virtual DCN bucket
    d_star = jnp.where(k1 == EMPTY, n_dcn, dest2 // n_ici)
    rk2, rcols2, rcnt2, ov2 = _bucket_exchange(
        k1, cols1, d_star, n_dcn, cap_dcn, dcn_axis
    )
    return rk2, (rcols2[0] if bare else rcols2), rcnt2, ov1 + ov2
