"""Open-addressing hash tables without atomics.

The reference's hash tables (common/dpcpp/hashtable.hpp:5-252) are built with
device-wide atomics: ``fetch_or`` on a bitmask word to claim a slot
(hashtable.hpp:70-92) or CAS linear probing (hashtable.hpp:136-172). TPU/XLA
has no global atomics, so construction is re-derived as a sort + scan:

  **Parking construction.** Sort keys by home bucket ``h``. For keys sorted by
  ``h``, first-come-first-served linear probing places key ``i`` at slot
  ``s_i = max(h_i, s_{i-1}+1)`` — a max-plus recurrence whose closed form is
  ``s_i = i + cummax(h_i - i)``: one sort and one associative scan replace the
  whole CAS loop. Wraparound (circular table) is handled with the classic
  doubling trick: run the scan over two concatenated copies (second copy's
  buckets shifted by ``size``); by the second copy the cascade has absorbed
  exactly the wrap-around pressure, so ``(s - size) % size`` of the second
  copy gives the circular parking positions.

  The *occupied-slot set* of FCFS linear probing is insertion-order
  independent, so this construction is observably equivalent to the
  reference's racy atomic build: ``probe`` finds every inserted key and
  rejects absent keys at the first empty slot, exactly like
  hashtable.hpp:23-58.

  **Probe.** A vectorized chain walk: all queries gather their current slot,
  compare, and advance; a ``lax.while_loop`` iterates until every lane found
  its key or hit EMPTY. Iteration count = longest probe chain, not table
  size.

Tables are plain arrays: ``keys[size]`` (EMPTY sentinel) plus optional
parallel payload arrays — the TPU analog of the reference's non-owning
key/val/bitmask buffer triple.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .primitives import cummax, sort_by_key

EMPTY = np.uint32(0xFFFFFFFF)  # reference EMPTY_ELEMENT (hashtable.hpp:96)
_NEG_INF = np.int32(-(2**30))


class HashTable(NamedTuple):
    """Open-addressing table: slot-indexed columns. ``keys[i] == EMPTY``
    marks a free slot; ``payload`` columns are aligned with ``keys``."""

    keys: jnp.ndarray  # (size,) uint32
    payload: Tuple[jnp.ndarray, ...]  # each (size,) aligned with keys
    max_probe: jnp.ndarray  # scalar int32: longest probe chain + 1

    @property
    def size(self) -> int:
        return self.keys.shape[0]


def parking_positions(h_sorted: jnp.ndarray, size: int) -> jnp.ndarray:
    """Circular FCFS linear-probe slots for keys already sorted by home
    bucket ``h_sorted`` (invalid entries must carry h == size and sort last;
    they are excluded from the scan). The recurrence
    ``s_i = max(h_i, s_{i-1}+1)`` runs over the rank among VALID rows only —
    padding rows must not advance the cascade."""
    n = h_sorted.shape[0]
    valid = h_sorted < size
    v = valid.astype(jnp.int32)
    rank = jnp.cumsum(v) - v  # exclusive rank among valid rows
    nvalid = jnp.sum(v)
    h = h_sorted.astype(jnp.int32)
    # Doubled scan: first copy seeds the cascade, second copy (+size) yields
    # the steady-state circular placements.
    d1 = jnp.where(valid, h - rank, _NEG_INF)
    d2 = jnp.where(valid, h + size - (rank + nvalid), _NEG_INF)
    m = cummax(jnp.concatenate([d1, d2]))
    s2 = (rank + nvalid) + m[n:]
    slots = (s2 - size) % size
    return jnp.where(valid, slots, size)  # out-of-range → dropped on scatter


def build(
    keys: jnp.ndarray,
    home: jnp.ndarray,
    size: int,
    payload: Tuple[jnp.ndarray, ...] = (),
    valid: Optional[jnp.ndarray] = None,
) -> HashTable:
    """Build an open-addressing table of static ``size`` from ``keys`` with
    home buckets ``home`` (already reduced mod size). ``valid`` masks out
    padding rows (fixed-capacity inputs). Keys are assumed distinct — the
    reference's build dwarfs insert unique keys (hash/hash_build.cpp:17-23).
    """
    n = keys.shape[0]
    keys = keys.astype(jnp.uint32)
    h = home.astype(jnp.uint32)
    if valid is not None:
        h = jnp.where(valid, h, jnp.uint32(size))
    sorted_cols = sort_by_key(h, keys, *payload)
    h_sorted, keys_sorted = sorted_cols[0], sorted_cols[1]
    payload_sorted = sorted_cols[2:]
    slots = parking_positions(h_sorted, size)
    table_keys = jnp.full((size,), EMPTY, dtype=jnp.uint32)
    table_keys = table_keys.at[slots].set(keys_sorted, mode="drop")
    table_payload = []
    for col in payload_sorted:
        buf = jnp.zeros((size,), dtype=col.dtype)
        table_payload.append(buf.at[slots].set(col, mode="drop"))
    is_valid = h_sorted < size
    displacement = jnp.where(
        is_valid, (slots - h_sorted.astype(jnp.int32)) % size, 0
    )
    max_probe = jnp.max(displacement, initial=0) + 1
    return HashTable(table_keys, tuple(table_payload), max_probe.astype(jnp.int32))


def _probe_loop(table_keys, queries, home, max_steps):
    """Shared vectorized chain walk. Returns (found, slot)."""
    size = table_keys.shape[0]
    n = queries.shape[0]
    q = queries.astype(jnp.uint32)
    pos0 = home.astype(jnp.int32)

    def cond(state):
        step, active, _, _ = state
        return jnp.logical_and(step < max_steps, jnp.any(active))

    def body(state):
        step, active, found, slot = state
        pos = (pos0 + step) % size
        cur = table_keys[pos]
        hit = active & (cur == q)
        miss = active & (cur == EMPTY)
        found = found | hit
        slot = jnp.where(hit, pos, slot)
        active = active & ~hit & ~miss
        return step + 1, active, found, slot

    # Derive the carry init from the (possibly sharded) inputs so its
    # varying-axes type matches the loop outputs under shard_map.
    init = (
        jnp.int32(0),
        pos0 == pos0,  # all-true, data-derived
        pos0 != pos0,  # all-false
        jnp.where(pos0 != pos0, pos0, -1),
    )
    _, _, found, slot = jax.lax.while_loop(cond, body, init)
    return found, slot


def probe(
    table: HashTable,
    queries: jnp.ndarray,
    home: jnp.ndarray,
    max_steps: Optional[jnp.ndarray] = None,
):
    """``has``-style probe (reference: hashtable.hpp:23-58): walk the chain
    from the home bucket; stop on key match or EMPTY. Returns
    ``(found, slot)`` with slot == -1 for misses."""
    if max_steps is None:
        max_steps = table.max_probe
    return _probe_loop(table.keys, queries, home, max_steps)


def lookup(
    table: HashTable,
    queries: jnp.ndarray,
    home: jnp.ndarray,
    payload_index: int = 0,
    default=0,
    max_steps: Optional[jnp.ndarray] = None,
):
    """Probe and gather one payload column: ``(found, value)``
    (reference ``at``: hashtable.hpp:44-58)."""
    found, slot = probe(table, queries, home, max_steps)
    col = table.payload[payload_index]
    val = jnp.where(found, col[jnp.where(found, slot, 0)],
                    jnp.asarray(default, col.dtype))
    return found, val
