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
trick only carries monotone columns) is a DELTA-CUMSUM: each table row
carries the mod-2^32 delta to its predecessor's value, so a plain
``cumsum`` over the merged order telescopes to "last preceding table
row's value" exactly. (The textbook segmented-fill
``lax.associative_scan`` with a "last source value" operator unrolls
~25 slice levels at 2^25 and OOM-kills the remote compile server —
measured round 4; cumsum lowers compactly.)

RESERVED KEY: 0xFFFFFFFF (EMPTY) is the table padding / free-slot
sentinel throughout the hash family — a real table key equal to EMPTY
is unfindable via this engine (the ``sk != EMPTY`` guard treats it as
padding). The dwarf generators never produce it (make_random spans
[1, 10000]; make_unique_random spans [1, 10n] with n < 2^28), and
bucket_hash.build / cuckoo.build document it as reserved.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

EMPTY = np.uint32(0xFFFFFFFF)
_TAG = np.uint32(0x80000000)  # aux bit 31: query row (table rows clear it)


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
    tv = sorted_vals.astype(jnp.uint32)
    tk = sorted_keys.astype(jnp.uint32)
    # DELTA encoding makes the forward-fill a plain cumsum: table rows
    # keep their relative (pre-sorted) order under the stable merge
    # sort, so attaching dv_i = val_i - val_{i-1} (mod 2^32; dv_0 =
    # val_0) to each table row and 0 to queries telescopes —
    # cumsum(deltas) at any row = the last preceding table row's value,
    # exactly, under uint32 wrap. (The general segmented-fill
    # ``associative_scan`` unrolls ~25 slice levels at 2^25 and OOM-kills
    # the remote compile server; cumsum/cummax lower compactly.)
    if nt > 0:
        dv = (tv - jnp.roll(tv, 1)).at[0].set(tv[0])
    else:
        dv = tv
    keys_all = jnp.concatenate([tk, q])
    vals_all = jnp.concatenate([dv, jnp.zeros((nq,), jnp.uint32)])
    # idx doubles as the class marker (-1 = table row); the STABLE sort
    # keeps table rows (first in the concat) first among equal keys
    idx = jnp.concatenate(
        [jnp.full((nt,), -1, jnp.int32),
         jnp.arange(nq, dtype=jnp.int32)]
    )
    sk, sv, si = jax.lax.sort(
        (keys_all, vals_all, idx), num_keys=1, is_stable=True
    )
    is_src = si < 0
    fv = jnp.cumsum(sv, dtype=jnp.uint32)  # wraps mod 2^32: telescopes
    nsrc = jnp.cumsum(is_src.astype(jnp.int32))
    carry_key = jax.lax.cummax(jnp.where(is_src, sk, jnp.uint32(0)))
    found = (
        (~is_src) & (nsrc > 0) & (carry_key == sk) & (sk != EMPTY)
    )
    val = jnp.where(found, fv, jnp.uint32(0))
    # restore query order (queries carry si >= 0; table rows sort first)
    _, f2, v2 = jax.lax.sort(
        (si, found.astype(jnp.int32), val), num_keys=1, is_stable=False
    )
    return f2[nt:] == 1, v2[nt:]


@partial(
    jax.jit,
    static_argnames=("val_bits", "membership", "compact_first"),
)
def merge_lookup_bitonic(
    sorted_keys,
    sorted_vals,
    queries,
    val_bits: int = 32,
    membership: bool = False,
    compact_first: bool | None = None,
):
    """``merge_lookup`` semantics at ~1/4 the sort traffic (round 5).

    The original pays two full O(n log^2 n) comparison sorts over the
    2^25-element concat — 219-296 ms at the config-#4 scale, the entire
    probe cost. But the table side is PRE-SORTED at build time, so the
    expensive stable concat sort decomposes into (a) ONE pair sort of the
    queries alone and (b) a Batcher bitonic MERGE (ops/bitonic) — log2(N)
    oblivious stages instead of ~log^2(N)/2. Pipeline:

      1. sortQ: ``lax.sort((q, idx), num_keys=2)`` — the only full sort
         of the input side (deterministic composite order, which the
         merge's bitonicity requires — see ops/bitonic).
      2. bitonic merge of [table asc ‖ EMPTY-pad peak ‖ flip(queries)]
         under the (key, aux) order. aux packs the row class: table rows
         carry their value-DELTA (val_bits=16: mod-2^16 delta in aux's
         low bits — 2 columns total; val_bits=32: a third delta column;
         membership=True: no delta at all) and bit 31 = 0; query rows
         carry TAG | original index. Table-before-query tie order falls
         out of aux ordering (table aux < 2^31 <= query aux).
      3. delta-cumsum fill + carry-key cummax, exactly as the original.
      4. unsort: pack (idx << 1 | found) into one distinct-key column —
         one unstable 2-operand sort delivers drop-the-table-rows AND
         query-order restoration at once (``compact_first=True`` runs the
         streaming compaction before it so the sort is nq- not N-sized).

    Contract matches ``merge_lookup``: duplicate table keys must be
    pre-aggregated; EMPTY is reserved; queries equal to EMPTY return
    (False, 0). ``val_bits=16`` is exact iff every table value < 2^16
    (caller-guaranteed, like the join's packed layouts). Requires
    nq < 2^30."""
    from .bitonic import merge_bitonic

    nt = sorted_keys.shape[0]
    nq = queries.shape[0]
    if nq == 0:
        return jnp.zeros((0,), bool), jnp.zeros((0,), jnp.uint32)
    assert nq < (1 << 30), "query index must fit 30 bits"
    q = queries.astype(jnp.uint32)
    tk = sorted_keys.astype(jnp.uint32)
    tv = sorted_vals.astype(jnp.uint32)
    qi = jnp.arange(nq, dtype=jnp.uint32)
    qs, qidx = jax.lax.sort((q, qi), num_keys=2, is_stable=False)

    total = nt + nq
    n_pow2 = 1 << max(total - 1, 0).bit_length()
    npad = n_pow2 - total
    if nt > 0:
        dv = (tv - jnp.roll(tv, 1)).at[0].set(tv[0])
    else:
        dv = tv
    if membership:
        aux_t = jnp.zeros((nt,), jnp.uint32)
        extra = ()
    elif val_bits == 16:
        aux_t = dv & jnp.uint32(0xFFFF)
        extra = ()
    else:
        aux_t = jnp.zeros((nt,), jnp.uint32)
        extra = (
            jnp.concatenate([dv, jnp.zeros((npad + nq,), jnp.uint32)]),
        )
    keys_all = jnp.concatenate(
        [tk, jnp.full((npad,), EMPTY, jnp.uint32), jnp.flip(qs)]
    )
    aux_all = jnp.concatenate(
        [aux_t, jnp.full((npad,), 0xFFFFFFFF, jnp.uint32),
         jnp.flip(_TAG | qidx)]
    )
    if jax.default_backend() != "cpu":
        # two-pass streaming kernel: the XLA stage-by-stage network
        # measured 101/159 ms (2/3-col) at 2^25 — 15x its bandwidth
        # model — because the stages materialize (measure_r6 d1)
        from .bitonic_pallas import merge_bitonic_pallas

        merged = merge_bitonic_pallas(
            (keys_all, aux_all) + extra, num_cmp=2
        )
    else:
        merged = merge_bitonic((keys_all, aux_all) + extra, num_cmp=2)
    sk, sa = merged[0], merged[1]

    if (
        jax.default_backend() != "cpu"
        and n_pow2 % (8 * 4096) == 0
    ):
        # fused fill: all scans + glue in ONE streaming pass (the XLA
        # form costs ~38 ms at 2^25 — cummax alone 24; measure_r6 d1)
        from .merge_fill_pallas import merge_fill_pallas

        dest, val = merge_fill_pallas(
            sk, sa,
            None if (membership or val_bits == 16) else merged[2],
            nq, val16=(val_bits == 16 and not membership),
            membership=membership,
        )
        is_real_q = dest != jnp.uint32(0xFFFFFFFF)
    else:
        is_src = (sa & _TAG) == 0
        nsrc = jnp.cumsum(is_src.astype(jnp.int32))
        carry_key = jax.lax.cummax(jnp.where(is_src, sk, jnp.uint32(0)))
        found = (
            (~is_src) & (nsrc > 0) & (carry_key == sk) & (sk != EMPTY)
        )
        if membership:
            val = jnp.zeros_like(sk)
        elif val_bits == 16:
            sv = jnp.where(is_src, sa & jnp.uint32(0xFFFF), jnp.uint32(0))
            val = jnp.cumsum(sv, dtype=jnp.uint32) & jnp.uint32(0xFFFF)
        else:
            sv = jnp.where(is_src, merged[2], jnp.uint32(0))
            val = jnp.cumsum(sv, dtype=jnp.uint32)
        qp = sa & jnp.uint32(0x7FFFFFFF)
        is_real_q = (~is_src) & (qp < jnp.uint32(nq))
        dest = jnp.where(
            is_real_q, (qp << 1) | found.astype(jnp.uint32),
            jnp.uint32(0xFFFFFFFF),
        )
        val = jnp.where(found, val, jnp.uint32(0))

    if compact_first is None:
        compact_first = jax.default_backend() != "cpu"
    # val_bits=16: carry the value column at u16 through the unsort —
    # lax.sort cost tracks operand bytes (2-op u32+u16 27.9 ms vs
    # u32+u32 32.0 at 2^24, cast included; measure_r7 w1/w3). The cast
    # happens AFTER the Pallas compaction (sub-32-bit VMEM loads
    # relayout ~3x slower than i32, so the compaction stays i32).
    val16_carry = (not membership) and val_bits == 16
    cols_u = (dest,) if membership else (dest, val)
    if compact_first:
        # every real query appears exactly once, so capacity == count;
        # membership drops the value column entirely (1-col compaction
        # + 1-operand unsort: 18 vs 32 ms at 2^24 — measure_r6 d2)
        if jax.default_backend() != "cpu":
            from .compact_pallas import compact_mask_pallas

            cols_c, _ = compact_mask_pallas(
                is_real_q, cols_u, capacity=nq
            )
        else:
            from .primitives import compact_multi

            cols_c, _ = compact_multi(cols_u, is_real_q, capacity=nq)
        # compact_mask_pallas returns int32 columns; restore the uint32
        # contract (bit patterns unchanged — compacted dests are < 2^25)
        cols_u = tuple(c.astype(jnp.uint32) for c in cols_c)
    if membership:
        (sd,) = jax.lax.sort(cols_u, num_keys=1, is_stable=False)
        sd = sd[:nq]
        found_out = (sd & jnp.uint32(1)) == 1
        return found_out, jnp.zeros((nq,), jnp.uint32)
    if val16_carry:
        cols_u = (cols_u[0], cols_u[1].astype(jnp.uint16))
    sd, sval = jax.lax.sort(cols_u, num_keys=1, is_stable=False)
    sd, sval = sd[:nq], sval[:nq].astype(jnp.uint32)
    found_out = (sd & jnp.uint32(1)) == 1
    return found_out, jnp.where(found_out, sval, jnp.uint32(0))


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
