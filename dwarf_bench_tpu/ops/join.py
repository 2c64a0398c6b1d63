"""Hash join (1:1) and nested-loop join.

Reference:
  * ``Join`` (join/join.cpp): build a SimpleNonOwningHashTable from table A's
    unique keys+values (join.cpp:60-77), probe table B writing matched
    (key, a_val, b_val) at probe-side slots (join.cpp:80-104), host-side
    compaction of hits (join.cpp:119-129), build/probe times split.
  * ``NestedLoopJoin`` (join/nested_join.cpp): one work-item per A row loops
    all B rows into dense n² buffers (nested_join.cpp:60-70).

TPU re-derivations: the build is the parking construction
(ops/hashtable.py) with A values as payload; the probe is the vectorized
chain walk + payload gather; compaction happens on-device with the
fixed-capacity + count pattern instead of on the host. The nested-loop join
is a tiled dense mask — an O(n²) VPU compare, matching the reference's
semantics for its oracle role.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import hashtable
from .hashing import murmur3_32
from .primitives import compact_multi


class JoinResult(NamedTuple):
    keys: jnp.ndarray
    a_vals: jnp.ndarray
    b_vals: jnp.ndarray
    count: jnp.ndarray


@partial(jax.jit, static_argnames=("ht_size",))
def hash_join_build(a_keys: jnp.ndarray, a_vals: jnp.ndarray, ht_size: int,
                    hash_seed) -> hashtable.HashTable:
    home = murmur3_32(a_keys, hash_seed, ht_size)
    return hashtable.build(
        a_keys, home, ht_size, payload=(a_vals.astype(jnp.uint32),)
    )


@jax.jit
def hash_join_probe(
    table: hashtable.HashTable,
    b_keys: jnp.ndarray,
    b_vals: jnp.ndarray,
    hash_seed,
) -> JoinResult:
    home = murmur3_32(b_keys, hash_seed, table.size)
    found, a_val = hashtable.lookup(table, b_keys, home)
    (k, av, bv), count = compact_multi(
        (b_keys.astype(jnp.uint32), a_val, b_vals.astype(jnp.uint32)), found
    )
    return JoinResult(k, av, bv, count)


@jax.jit
def nested_loop_join(
    a_keys: jnp.ndarray,
    a_vals: jnp.ndarray,
    b_keys: jnp.ndarray,
    b_vals: jnp.ndarray,
) -> JoinResult:
    """Dense O(n²) compare (nested_join.cpp:60-70). Output order is
    A-major like the reference's per-A-row emission; capacity = |B| matches
    the unique-key 1:1 data shape."""
    hit = a_keys[:, None] == b_keys[None, :]  # (na, nb)
    na, nb = hit.shape
    b_idx = jnp.argmax(hit, axis=1)
    found = jnp.any(hit, axis=1)
    (k, av, bv), count = compact_multi(
        (
            a_keys.astype(jnp.uint32),
            a_vals.astype(jnp.uint32),
            b_vals.astype(jnp.uint32)[b_idx],
        ),
        found,
    )
    return JoinResult(k, av, bv, count)


def seq_join_oracle(a_keys, a_vals, b_keys, b_vals):
    """Host oracle equivalent of join_helpers::seq_join
    (join/join_helpers/join_helpers.hpp:86-125): all (key, a_val, b_val)
    matches, returned as a sorted ndarray for order-insensitive compare."""
    a_keys = np.asarray(a_keys)
    b_keys = np.asarray(b_keys)
    a_vals = np.asarray(a_vals)
    b_vals = np.asarray(b_vals)
    rows = []
    b_index = {}
    for j, k in enumerate(b_keys):
        b_index.setdefault(int(k), []).append(j)
    for i, k in enumerate(a_keys):
        for j in b_index.get(int(k), ()):
            rows.append((int(k), int(a_vals[i]), int(b_vals[j])))
    out = np.array(sorted(rows), dtype=np.uint64).reshape(-1, 3)
    return out


def join_rows_sorted(res: JoinResult) -> np.ndarray:
    """Materialize a JoinResult into the oracle's sorted-triple format."""
    c = int(res.count)
    rows = np.stack(
        [
            np.asarray(res.keys[:c], np.uint64),
            np.asarray(res.a_vals[:c], np.uint64),
            np.asarray(res.b_vals[:c], np.uint64),
        ],
        axis=1,
    )
    return rows[np.lexsort(rows.T[::-1])] if c else rows


def columns_to_rows(keys, *value_cols):
    """Column-store → row-store (join_helpers.hpp to_row_store analog):
    list of (key, v1, v2, …) tuples."""
    cols = [np.asarray(keys)] + [np.asarray(c) for c in value_cols]
    return list(zip(*[c.tolist() for c in cols]))


def rows_to_columns(rows, n_cols: int):
    """Row-store → column-store (join_helpers.hpp to_col_store analog)."""
    if not rows:
        return tuple(np.empty(0, np.uint32) for _ in range(n_cols))
    arr = np.asarray(rows, dtype=np.uint64)
    return tuple(arr[:, c].astype(np.uint32) for c in range(n_cols))
