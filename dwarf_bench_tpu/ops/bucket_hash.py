"""Bucketized hash table — the TPU-native slab hash.

The reference's SlabHash (common/dpcpp/slab_hash.hpp) chains 32-element slabs
per bucket, probed cooperatively by 8-lane sub-groups, with a device bump
allocator and per-bucket spin-locks (slab_hash.hpp:84-262). The TPU analog
keeps the bucketized layout but replaces linked slabs + locks with a dense
``(num_buckets, capacity)`` tile array built by sort: hash keys to buckets,
sort rows by bucket, rank within bucket, and scatter to ``bucket * capacity +
rank``. Rows overflowing a bucket's capacity spill to a sorted overflow
column probed by binary search — the analog of walking overflow slabs.

Find gathers a whole bucket row (a VMEM-friendly contiguous tile — the lane
analog of the reference's cooperative 32-slot slab scan) and compares
vectorized across the capacity axis.

Bucket count heuristic mirrors ``calculate_buckets_count``
(slab_hash.hpp:30-58): pick buckets so expected occupancy ≈ mem_util% of one
slab (32 slots).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .hashing import affine_hash, SLAB_HASH_PRIME
from .hashtable import EMPTY
from .primitives import compact_multi, rank_in_segment, sort_by_key

SLAB_SIZE = 32  # reference slab capacity (slab_hash.hpp:21)


def calculate_buckets_count(input_size: int, mem_util_percent: int = 60) -> int:
    """Buckets so that average occupancy ≈ mem_util% of one 32-slot slab
    (reference heuristic, slab_hash.hpp:30-58)."""
    target_per_bucket = max(1, SLAB_SIZE * mem_util_percent // 100)
    return max(1, -(-input_size // target_per_bucket))


class BucketTable(NamedTuple):
    keys: jnp.ndarray  # (num_buckets, capacity) uint32, EMPTY = free
    vals: jnp.ndarray  # (num_buckets, capacity)
    overflow_keys: jnp.ndarray  # (overflow_cap,) uint32 sorted ascending
    overflow_vals: jnp.ndarray
    overflow_count: jnp.ndarray  # int32 scalar
    hash_a: jnp.ndarray  # uint32 scalars: affine hash parameters
    hash_b: jnp.ndarray
    sorted_keys: jnp.ndarray  # (n,) key-sorted copy for the bulk merge
    sorted_vals: jnp.ndarray  # probe (ops/merge_lookup; EMPTY pad last)

    @property
    def num_buckets(self) -> int:
        return self.keys.shape[0]

    @property
    def capacity(self) -> int:
        return self.keys.shape[1]


@partial(jax.jit, static_argnames=("num_buckets", "capacity", "overflow_cap"))
def build(
    keys: jnp.ndarray,
    vals: jnp.ndarray,
    num_buckets: int,
    capacity: int = SLAB_SIZE,
    overflow_cap: int | None = None,
    hash_a=1,
    hash_b=0,
) -> BucketTable:
    n = keys.shape[0]
    if overflow_cap is None:
        overflow_cap = n
    keys = keys.astype(jnp.uint32)
    b = affine_hash(keys, hash_a, hash_b, SLAB_HASH_PRIME, num_buckets)
    sb, sk, sv = sort_by_key(b.astype(jnp.int32), keys, vals)
    rank = rank_in_segment(sb)
    in_main = rank < capacity
    flat_idx = sb * capacity + rank
    tk = jnp.full((num_buckets * capacity,), EMPTY, dtype=jnp.uint32)
    tv = jnp.zeros((num_buckets * capacity,), dtype=vals.dtype)
    safe = jnp.where(in_main, flat_idx, num_buckets * capacity)
    tk = tk.at[safe].set(sk, mode="drop")
    tv = tv.at[safe].set(sv, mode="drop")
    # Spill: sort overflow rows by key for binary-search probing.
    (ok, ov), ocount = compact_multi((sk, sv), ~in_main, capacity=overflow_cap)
    ok, ov = sort_by_key(
        jnp.where(jnp.arange(overflow_cap) < ocount, ok, EMPTY), ov
    )
    # key-sorted copy for the gather-free bulk probe (merge_lookup):
    # reuses the bucket sort's columns, one extra key sort
    gk, gv = jax.lax.sort((sk, sv.astype(jnp.uint32)), num_keys=1,
                          is_stable=False)
    return BucketTable(
        tk.reshape(num_buckets, capacity),
        tv.reshape(num_buckets, capacity),
        ok,
        ov,
        ocount,
        jnp.uint32(hash_a),
        jnp.uint32(hash_b),
        gk,
        gv,
    )


@partial(jax.jit, static_argnames=("engine", "val_bits"))
def find(
    table: BucketTable,
    queries: jnp.ndarray,
    engine: str | None = None,
    val_bits: int = 32,
):
    """Vectorized bucket lookup. Returns (found, value).

    ``engine`` makes the trace-time dispatch explicit (round-4 advisor):

      * ``"tile"`` — bucket-tile row gather + compare across the capacity
        axis + overflow binary search (the lane analog of the reference's
        cooperative 32-slot slab scan, slab_hash.hpp:264-294). Preserves
        the table's value dtype; with DUPLICATE table keys it SUMS a
        bucket's matching values.
      * ``"merge"`` — the gather-free bitonic sort-merge probe
        (ops/merge_lookup.merge_lookup_bitonic — one query pair sort +
        a log2(N)-stage bitonic merge against the build-time-sorted
        keys): returns uint32 values; with duplicate keys it returns ONE
        duplicate's value. Key 0xFFFFFFFF (EMPTY) is reserved (see
        ops/merge_lookup docstring). ``val_bits=16`` (caller guarantees
        every table value < 2^16, e.g. the benchmark's [1, 10000]
        columns) drops the third merge column.
      * ``"merge_legacy"`` — the round-4 full-concat-sort merge probe
        (ops/merge_lookup.merge_lookup), kept for A/B measurement.
      * ``None`` (default) — auto: merge for bulk batches (>= 2^16 on
        accelerators — the (nq, capacity) tile gather serializes on TPU:
        3.3 Mrows/s at the config-#4 2^24 scale vs ~0.1 Grows/s for the
        merge), tile otherwise. The engines agree exactly for distinct
        table keys (the dwarf data contract, slab_probe.cpp:16); callers
        with duplicate keys or dtype-sensitive consumers should pass the
        engine explicitly or aggregate duplicates at build time."""
    if engine is None:
        engine = (
            "merge"
            if queries.shape[0] >= (1 << 16)
            and jax.default_backend() != "cpu"
            else "tile"
        )
    if engine == "merge":
        from .merge_lookup import merge_lookup_bitonic

        return merge_lookup_bitonic(
            table.sorted_keys, table.sorted_vals, queries,
            val_bits=val_bits,
        )
    if engine == "merge_legacy":
        from .merge_lookup import merge_lookup

        return merge_lookup(table.sorted_keys, table.sorted_vals, queries)
    q = queries.astype(jnp.uint32)
    b = affine_hash(
        q, table.hash_a, table.hash_b, SLAB_HASH_PRIME, table.num_buckets
    ).astype(jnp.int32)
    bucket_keys = table.keys[b]  # (nq, capacity) gather of whole tiles
    bucket_vals = table.vals[b]
    hit = bucket_keys == q[:, None]
    found = jnp.any(hit, axis=1)
    val = jnp.sum(jnp.where(hit, bucket_vals, 0), axis=1)
    # Overflow: binary search in the sorted spill column.
    pos = jnp.searchsorted(table.overflow_keys, q)
    safe = jnp.minimum(pos, table.overflow_keys.shape[0] - 1)
    o_hit = (pos < table.overflow_count) & (table.overflow_keys[safe] == q)
    val = jnp.where(o_hit & ~found, table.overflow_vals[safe], val)
    return found | o_hit, val
