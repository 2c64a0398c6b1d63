"""Gather-free bulk hash-table lookup (sort-merge + segmented fill).

TPU 1-D random gathers serialize (~0.1 Gelem/s measured): the reference's
O(1) probes (2-probe cuckoo lookup, cuckoo_hashtable.hpp:29-41; slab
bucket scan, slab_hash.hpp:264-294) degrade to seconds at the BASELINE
config-#4 scale (2^24 probes — the round-4 bench extra measured the
(2^24, 32) bucket-tile gather at 3.3 Mrows/s). The TPU-native bulk probe
is a MERGE: one sort of [table keys ‖ queries] (table rows first among
equal keys), a segmented forward-fill to carry each table row's value to
the queries in its run, and one unsort — three streaming passes, zero
per-element gathers.

The forward-fill of ARBITRARY values (the csr_join.probe_merge cummax
trick only carries monotone columns) is a ``lax.associative_scan`` with
the "last source value" operator — associative, vectorized, exact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

EMPTY = np.uint32(0xFFFFFFFF)


def merge_lookup(sorted_keys, sorted_vals, queries):
    """(found, val) per query. ``sorted_keys`` ascending uint32 with
    EMPTY padding last; duplicate table keys must be pre-aggregated by
    the caller (otherwise the LAST duplicate's value wins). Queries equal
    to EMPTY return (False, 0).

    Cost: two (nt + nq)-element sorts + one associative scan — all
    streaming; no per-element gathers anywhere."""
    nt = sorted_keys.shape[0]
    nq = queries.shape[0]
    q = queries.astype(jnp.uint32)
    keys_all = jnp.concatenate([sorted_keys.astype(jnp.uint32), q])
    vals_all = jnp.concatenate(
        [sorted_vals.astype(jnp.uint32), jnp.zeros((nq,), jnp.uint32)]
    )
    # class column: 0 = table row, 1 = query — table rows sort FIRST
    # among equal keys, so the scan fills queries from their key's row
    cls = jnp.concatenate(
        [jnp.zeros((nt,), jnp.int32), jnp.ones((nq,), jnp.int32)]
    )
    idx = jnp.concatenate(
        [jnp.full((nt,), -1, jnp.int32),
         jnp.arange(nq, dtype=jnp.int32)]
    )
    sk, sc, sv, si = jax.lax.sort(
        (keys_all, cls, vals_all, idx), num_keys=2, is_stable=False
    )
    is_src = sc == 0

    def comb(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(fb == 1, vb, va)

    ff, fv = jax.lax.associative_scan(
        comb, (is_src.astype(jnp.int32), sv)
    )
    carry_key = jax.lax.cummax(jnp.where(is_src, sk, jnp.uint32(0)))
    found = (
        (~is_src) & (ff == 1) & (carry_key == sk) & (sk != EMPTY)
    )
    val = jnp.where(found, fv, jnp.uint32(0))
    # restore query order (queries carry si >= 0; table rows sort first)
    _, f2, v2 = jax.lax.sort(
        (si, found.astype(jnp.int32), val), num_keys=1, is_stable=False
    )
    return f2[nt:] == 1, v2[nt:]


def sort_table(keys, vals=None):
    """Key-sorted copy for ``merge_lookup``: returns (sorted_keys,
    sorted_vals) with EMPTY keys (padding/free slots) last."""
    k = keys.astype(jnp.uint32)
    if vals is None:
        (sk,) = jax.lax.sort((k,), num_keys=1, is_stable=False)
        return sk, jnp.zeros_like(sk)
    sk, sv = jax.lax.sort(
        (k, vals.astype(jnp.uint32)), num_keys=1, is_stable=False
    )
    return sk, sv
