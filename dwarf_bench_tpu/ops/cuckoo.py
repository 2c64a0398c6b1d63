"""Cuckoo hash table via bulk-synchronous insertion rounds.

The reference's cuckoo table (common/dpcpp/cuckoo_hashtable.hpp) inserts with
per-slot spin-locks and bounded eviction chains (swap loops up to
``min(input_size, 1e5)`` iterations, cuckoo_hashtable.hpp:43-63); on failure
the calling dwarf re-randomizes both hashers and rebuilds
(hash/cuckoo_hash_build.cpp:43-93).

TPU re-derivation (no locks): batched rounds, the classic GPU-style parallel
cuckoo. Every unplaced key claims its candidate slot for one of its two hash
functions; one winner per slot is chosen by a scatter-max of key indices;
winners write their key, which implicitly evicts any previous resident. At
the top of each round every key re-checks residency by a gather — keys that
lost their slot flip to their other hash function and retry. The loop runs
until all keys are resident or ``max_iters`` rounds elapse; non-convergence
is reported to the host, which rebuilds with fresh hash offsets (mirroring
the reference's retry loop).

Lookup keeps cuckoo's 2-probe guarantee: gather at h1 and h2, compare
(cuckoo_hashtable.hpp:29-41).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .hashing import murmur3_32
from .hashtable import EMPTY


class CuckooTable(NamedTuple):
    keys: jnp.ndarray  # (size,) uint32, EMPTY marks free slot
    payload: Tuple[jnp.ndarray, ...]
    seed1: jnp.ndarray  # murmur seeds (uint32 scalars; cuckoo_hash_build.cpp:43-49)
    seed2: jnp.ndarray
    success: jnp.ndarray  # bool scalar: did the build converge
    rounds: jnp.ndarray  # int32 scalar: rounds taken
    keys_sorted: jnp.ndarray  # (n,) sorted inserted keys for bulk ``has``

    @property
    def size(self) -> int:
        return self.keys.shape[0]


@partial(jax.jit, static_argnames=("size", "max_iters"))
def build(
    keys: jnp.ndarray,
    size: int,
    seed1,
    seed2,
    max_iters: int,
    values: jnp.ndarray | None = None,
) -> CuckooTable:
    """One build attempt (keys distinct). The host-side rebuild-on-failure
    loop lives in the dwarf, like the reference (cuckoo_hash_build.cpp:43-93).
    """
    n = keys.shape[0]
    keys = keys.astype(jnp.uint32)
    seed1 = jnp.uint32(seed1)
    seed2 = jnp.uint32(seed2)
    h1 = murmur3_32(keys, seed1, size).astype(jnp.int32)
    h2 = murmur3_32(keys, seed2, size).astype(jnp.int32)
    idx = jnp.arange(n, dtype=jnp.int32)

    table0 = jnp.full((size,), EMPTY, dtype=jnp.uint32)
    slot0 = jnp.full((n,), -1, jnp.int32)
    side0 = jnp.zeros((n,), jnp.int32)

    def resident(table, slot):
        safe = jnp.maximum(slot, 0)
        return (slot >= 0) & (table[safe] == keys)

    def cond(state):
        table, slot, side, it = state
        return jnp.logical_and(it < max_iters, ~jnp.all(resident(table, slot)))

    def body(state):
        table, slot, side, it = state
        res = resident(table, slot)
        evicted = (slot >= 0) & ~res
        side = jnp.where(evicted, 1 - side, side)
        slot = jnp.where(evicted, -1, slot)
        active = ~res
        cand = jnp.where(side == 0, h1, h2)
        claims = jnp.full((size,), -1, jnp.int32)
        claims = claims.at[jnp.where(active, cand, size)].max(idx, mode="drop")
        winner = active & (claims[cand] == idx)
        table = table.at[jnp.where(winner, cand, size)].set(keys, mode="drop")
        slot = jnp.where(winner, cand, slot)
        return table, slot, side, it + 1

    table, slot, side, rounds = jax.lax.while_loop(
        cond, body, (table0, slot0, side0, jnp.int32(0))
    )
    success = jnp.all(resident(table, slot))

    payload: Tuple[jnp.ndarray, ...] = ()
    if values is not None:
        buf = jnp.zeros((size,), dtype=values.dtype)
        safe = jnp.where(slot >= 0, slot, size)
        payload = (buf.at[safe].set(values, mode="drop"),)
    # sorted copy of the INSERTED keys (n, not size): the bulk ``has``
    # merge probe needs it; one n-element sort is noise next to the
    # scatter/gather rounds above
    (keys_sorted,) = jax.lax.sort((keys,), num_keys=1, is_stable=False)
    return CuckooTable(table, payload, seed1, seed2, success, rounds,
                       keys_sorted)


@jax.jit
def has(table: CuckooTable, queries: jnp.ndarray) -> jnp.ndarray:
    """Membership. Small batches: the 2-probe lookup
    (cuckoo_hashtable.hpp:29-41) — two random gathers per query. Bulk
    batches on accelerators: the gather-free sort-merge probe against
    the sorted inserted keys (TPU random gathers serialize at
    ~0.1 Gelem/s; observable semantics identical)."""
    q = queries.astype(jnp.uint32)
    if (
        queries.shape[0] >= (1 << 16)
        and jax.default_backend() != "cpu"
    ):
        from .merge_lookup import merge_lookup

        found, _ = merge_lookup(
            table.keys_sorted, jnp.zeros_like(table.keys_sorted), q
        )
        return found
    size = table.size
    h1 = murmur3_32(q, table.seed1, size).astype(jnp.int32)
    h2 = murmur3_32(q, table.seed2, size).astype(jnp.int32)
    return (table.keys[h1] == q) | (table.keys[h2] == q)


@jax.jit
def at(table: CuckooTable, queries: jnp.ndarray):
    """2-probe value lookup: returns (found, value)."""
    q = queries.astype(jnp.uint32)
    size = table.size
    h1 = murmur3_32(q, table.seed1, size).astype(jnp.int32)
    h2 = murmur3_32(q, table.seed2, size).astype(jnp.int32)
    hit1 = table.keys[h1] == q
    hit2 = table.keys[h2] == q
    vals = table.payload[0]
    v = jnp.where(hit1, vals[h1], jnp.where(hit2, vals[h2], 0))
    return hit1 | hit2, v
