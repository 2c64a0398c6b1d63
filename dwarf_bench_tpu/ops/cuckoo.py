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
import numpy as np

from .hashing import murmur3_32
from .hashtable import EMPTY

# Bijective key premix for the SECOND hash function (round 4). Seeding
# the same murmur with two seeds does NOT give independent functions:
# the seed enters as the initial state of a bijective pipeline, so
# h_s(k) = G(s ^ m(k)) with G a 32-bit bijection — for ANY pair of keys
# with m(x) ^ m(y) == s1 ^ s2, h1(x) == h2(y) AND h2(x) == h1(y) hold
# AUTOMATICALLY (the xor condition is symmetric), i.e. an exact mirror
# 2-cycle. Expected mirror pairs = C(n,2)/2^32 ≈ 1024 at n = 2^22, and
# overlapping mirror pairs form unplaceable components (4 keys on 3
# slots — observed) with probability ~1, so EVERY reseed attempt
# failed at 2^22+ (the reference has the same structure,
# cuckoo_hash_build.cpp:43-49, but is only ever exercised to 4096).
# Multiplying the key by an odd constant before the h2 murmur makes the
# two mirror conditions independent (2^-64 per pair): documented
# deviation, observable probe semantics unchanged.
_H2_PREMIX = np.uint32(0x9E3779B9)  # odd -> bijective on uint32


def _hash2(v, seed, size):
    return murmur3_32(
        jnp.asarray(v).astype(jnp.uint32) * _H2_PREMIX, seed, size
    )


class CuckooTable(NamedTuple):
    keys: jnp.ndarray  # (size,) uint32, EMPTY marks free slot
    payload: Tuple[jnp.ndarray, ...]
    seed1: jnp.ndarray  # murmur seeds (uint32 scalars; cuckoo_hash_build.cpp:43-49)
    seed2: jnp.ndarray
    success: jnp.ndarray  # bool scalar: did the build converge
    rounds: jnp.ndarray  # int32 scalar: rounds taken
    keys_sorted: jnp.ndarray  # (n,) sorted inserted keys for bulk ``has``
    vals_sorted: jnp.ndarray  # (n,) values in keys_sorted order (zeros
    # when built without values) — the bulk ``at`` merge probe's payload

    @property
    def size(self) -> int:
        return self.keys.shape[0]


def _rot_priority(idx: jnp.ndarray, it) -> jnp.ndarray:
    """Per-round ROTATED claim priority: a fixed priority (round 1-3
    used max-idx) makes the synchronized eviction dynamics
    deterministic, and any eviction CYCLE then repeats identically
    every round — a livelock whose probability grows with n (at
    2^22, 4 of 4 random seed pairs spun past 256 rounds while
    lucky pairs converged in 18). Rotating idx+1 by the round
    number is bijective (still exactly one winner per slot) but
    reshuffles the priority order every round, breaking cycles."""
    r = it & 31
    pr = jnp.uint32(1) + idx.astype(jnp.uint32)
    # (32 - r) & 31 avoids the undefined shift-by-32 at r == 0
    return jnp.where(
        r == 0, pr, (pr << r) | (pr >> ((32 - r) & 31))
    ).astype(jnp.uint32)  # the int32 shift count promotes the rotate


@partial(jax.jit, static_argnames=("size", "max_iters", "compact_cap"))
def build(
    keys: jnp.ndarray,
    size: int,
    seed1,
    seed2,
    max_iters: int,
    values: jnp.ndarray | None = None,
    compact_cap: int | None = None,
) -> CuckooTable:
    """One build attempt (keys distinct). The host-side rebuild-on-failure
    loop lives in the dwarf, like the reference (cuckoo_hash_build.cpp:43-93).

    Round-5 structure (verdict item 8): every full-set bulk round costs
    O(n) serialized gathers/scatters (~2.3 s at 2^24), and the round-4
    build spent 17 of them even though <1% of keys remained unplaced
    after the first few. The build now switches phases:

      1. FULL bulk rounds only while the unplaced count exceeds
         ``compact_cap`` — default n/8, chosen so phase 1 is ONE round:
         round 1 (every key on h1 at 4x slots) places the bucket
         winners, leaving ~1 − 4(1 − e^(−1/4)) ≈ 11.5% < 12.5%
         unplaced; the late-round-5 cap sweep (measure_r7 c2) measured
         warm builds at 2^24 of 6.98 / 6.09 / 4.38 s for caps
         n/128 / n/16 / n/8, all converging with 0 unplaced-by-value;
      2. the unplaced (key, side) set is COMPACTED to a (compact_cap,)
         active array, and the same claim/evict rounds continue on it —
         displaced residents re-enter the active array in the winner's
         slot (by value, with their other-side hash), so eviction
         tracking no longer needs full-set residency scans; per-round
         cost drops from O(n) to O(cap) gathers + one O(size) claims
         pass;
      3. the sequential eviction-chain walk (the reference's own
         insertion semantics, cuckoo_hashtable.hpp:43-63) finishes the
         last stragglers, now driven off the active array instead of
         O(n) ``unplaced`` rescans per straggler.
    """
    n = keys.shape[0]
    keys = keys.astype(jnp.uint32)
    seed1 = jnp.uint32(seed1)
    seed2 = jnp.uint32(seed2)
    h1 = murmur3_32(keys, seed1, size).astype(jnp.int32)
    h2 = _hash2(keys, seed2, size).astype(jnp.int32)
    idx = jnp.arange(n, dtype=jnp.int32)
    if compact_cap is None:
        compact_cap = max(1024, n >> 3)
    cap = min(compact_cap, n)

    table0 = jnp.full((size,), EMPTY, dtype=jnp.uint32)

    def resident(table, slot):
        safe = jnp.maximum(slot, 0)
        return (slot >= 0) & (table[safe] == keys)

    # --- phase 1, round 1 UNROLLED (late round 5) ---------------------
    # Every key attempts h1 from an empty table, so the round needs no
    # residency bookkeeping at all, and because the claims pass yields a
    # UNIQUE winner per bucket, table[h1] == key holds for exactly the
    # winners: res comes out of the round by construction — zero of the
    # four ~245 ms full-set gathers the general round pays (measure_r7
    # c4: scatter-max 201 / random gather 245 / table scatter 115 ms at
    # 2^24 into 4n).
    pr0 = _rot_priority(idx, jnp.int32(0))
    claims0 = jnp.zeros((size,), jnp.uint32).at[h1].max(pr0)
    win1 = claims0[h1] == pr0
    table = table0.at[jnp.where(win1, h1, size)].set(keys, mode="drop")
    slot = jnp.where(win1, h1, -1)
    side = jnp.zeros((n,), jnp.int32)
    res0 = win1

    # fallback full-set rounds — entered only if round 1 left more than
    # ``cap`` keys unplaced (at the default n/8 cap the expected
    # leftover is ~11.5% of n, so this loop is a no-op; ``res`` rides
    # the carry so the compaction below reuses it without a recompute)
    def cond(state):
        table, slot, side, res, it = state
        return jnp.logical_and(
            it < max_iters,
            jnp.sum((~res).astype(jnp.int32)) > cap,
        )

    def body(state):
        table, slot, side, res, it = state
        evicted = (slot >= 0) & ~res
        side = jnp.where(evicted, 1 - side, side)
        slot = jnp.where(evicted, -1, slot)
        active = ~res
        cand = jnp.where(side == 0, h1, h2)
        pr = _rot_priority(idx, it)
        claims = jnp.zeros((size,), jnp.uint32)
        claims = claims.at[jnp.where(active, cand, size)].max(
            pr, mode="drop"
        )
        winner = active & (claims[cand] == pr)
        table = table.at[jnp.where(winner, cand, size)].set(keys, mode="drop")
        slot = jnp.where(winner, cand, slot)
        return table, slot, side, resident(table, slot), it + 1

    table, slot, side, res, rounds = jax.lax.while_loop(
        cond, body, (table, slot, side, res0, jnp.int32(1))
    )

    # --- phase 2: compacted active-set rounds (round 5) ---------------
    # Late round 5: a CASCADE of active-set caps. At the n/8 entry cap
    # the valid count collapses within a few rounds, but every round
    # still pays O(cap) gathers/scatters; once the count drops under
    # the n/128 tail cap the working set is re-compacted and the same
    # rounds continue at ~1/16 the per-round cost (measure_r7 c3).

    def _compact_active(mask, k, s, capacity):
        if jax.default_backend() != "cpu":
            from .compact_pallas import compact_mask_pallas

            (ck, cs), _ = compact_mask_pallas(
                mask, (k, s.astype(jnp.uint32)), capacity=capacity
            )
        else:
            from .primitives import compact_multi

            (ck, cs), _ = compact_multi(
                (k, s.astype(jnp.uint32)), mask, capacity=capacity
            )
        # compact_mask_pallas returns int32 columns — restore uint32
        # (the while_loop carries and the table scatter are uint32)
        count = jnp.sum(mask.astype(jnp.int32))
        cidx = jnp.arange(capacity, dtype=jnp.int32)
        valid = cidx < jnp.minimum(count, capacity)
        ck = jnp.where(valid, ck.astype(jnp.uint32), EMPTY)
        return ck, cs.astype(jnp.uint32), valid

    def _active_rounds(table, ak0, aside0, avalid0, it0, stop_count):
        aidx = jnp.arange(ak0.shape[0], dtype=jnp.int32)

        def cond2(state):
            table, ak, aside, avalid, it = state
            go = jnp.logical_and(it < it0 + max_iters, jnp.any(avalid))
            if stop_count is not None:
                # hand off to the tail stage once the set fits its cap
                go = jnp.logical_and(
                    go,
                    jnp.sum(avalid.astype(jnp.int32))
                    > jnp.int32(stop_count),
                )
            return go

        def body2(state):
            table, ak, aside, avalid, it = state
            h1a = murmur3_32(ak, seed1, size).astype(jnp.int32)
            h2a = _hash2(ak, seed2, size).astype(jnp.int32)
            cand = jnp.where(aside == 0, h1a, h2a)
            pr = _rot_priority(aidx, it)
            claims = jnp.zeros((size,), jnp.uint32)
            claims = claims.at[jnp.where(avalid, cand, size)].max(
                pr, mode="drop"
            )
            winner = avalid & (claims[cand] == pr)
            old = table[cand]  # resident BEFORE this round's writes
            table = table.at[jnp.where(winner, cand, size)].set(
                ak, mode="drop"
            )
            displaced = jnp.where(winner, old, EMPTY)
            # the displaced occupant re-enters the winner's active
            # slot, set to try its OTHER hash next (the eviction-chain
            # step by value)
            ns = jnp.where(
                murmur3_32(displaced, seed1, size).astype(jnp.int32)
                == cand,
                jnp.uint32(1), jnp.uint32(0),
            )
            ak = jnp.where(winner, displaced, ak)
            aside = jnp.where(winner, ns, aside)
            avalid = jnp.where(winner, displaced != EMPTY, avalid)
            return table, ak, aside, avalid, it + 1

        return jax.lax.while_loop(
            cond2, body2, (table, ak0, aside0, avalid0, it0)
        )

    # ``res`` rides the phase-1 carry (round-1 unroll / loop body) — no
    # post-loop residency recompute
    n_unpl = jnp.sum((~res).astype(jnp.int32))
    overflow = n_unpl > cap  # only if max_iters ran out above
    tail_cap = max(1024, n >> 7)
    ak0, aside0, avalid0 = _compact_active(~res, keys, side, cap)
    table, ak, aside, avalid, rounds2 = _active_rounds(
        table, ak0, aside0, avalid0, rounds,
        stop_count=tail_cap if tail_cap < cap else None,
    )
    if tail_cap < cap:
        # a cap-exhausted stage with > tail_cap survivors would DROP
        # entries at this re-compaction: fold that into ``overflow`` so
        # the flag-based success path below cannot report a false
        # convergence (the values path additionally re-checks residency
        # by value)
        n_surv = jnp.sum(avalid.astype(jnp.int32))
        overflow = overflow | (n_surv > tail_cap)
        ak, aside, avalid = _compact_active(avalid, ak, aside, tail_cap)
        table, ak, aside, avalid, rounds2 = _active_rounds(
            table, ak, aside, avalid, rounds2, stop_count=None
        )

    # --- phase 3: sequential straggler cleanup (round 4, re-driven) --
    # The synchronized rounds livelock on rare hash resonances (e.g.
    # mirrored pairs sharing both slots chase each other in lockstep —
    # at 2^22 EVERY seed pair left 1-2 stragglers for 256+ rounds, and
    # randomized priorities/flips did not break it; measure_r5 +
    # /tmp/npsim* record the hunt). The few leftovers take the
    # REFERENCE's own insertion semantics instead: a sequential
    # eviction-chain walk (cuckoo_hashtable.hpp:43-63), carried by key
    # VALUE (both hashes recompute from the value, so no index
    # bookkeeping): place the hot key, pick up the displaced occupant,
    # flip it to its other slot, repeat until a free slot (or the chain
    # cap — genuinely unplaceable sets then fail and the host re-seeds).
    # Round 5: the driver walks the phase-2 ACTIVE array instead of
    # rescanning all n keys per straggler (each rescan was 2x O(n)
    # serialized gathers); entries already chained into residency by an
    # earlier chain's displacements start with v == EMPTY (no-op).
    chain_cap = jnp.int32(2048)

    def chain(tbl, v, s0):
        def c_cond(cs):
            v, s, t, st = cs
            return (v != EMPTY) & (st < chain_cap)

        def c_body(cs):
            v, s, t, st = cs
            cand = jnp.where(
                s == 0,
                murmur3_32(v, seed1, size),
                _hash2(v, seed2, size),
            ).astype(jnp.int32)
            old = t[cand]
            t = t.at[cand].set(v)
            # displaced occupant retries its OTHER slot next
            ns = jnp.where(
                murmur3_32(old, seed1, size).astype(jnp.int32) == cand,
                jnp.int32(1), jnp.int32(0),
            )
            return old, ns, t, st + 1

        _, _, tbl, steps = jax.lax.while_loop(
            c_cond, c_body, (v, s0, tbl, jnp.int32(0))
        )
        return tbl, steps

    def s_cond(st):
        tbl, av, total, stuck = st
        return jnp.any(av) & (total < chain_cap) & ~stuck

    def s_body(st):
        tbl, av, total, stuck = st
        j = jnp.argmax(av)
        v = ak[j]
        # skip entries a previous chain already placed (by value)
        v1 = murmur3_32(v, seed1, size).astype(jnp.int32)
        v2 = _hash2(v, seed2, size).astype(jnp.int32)
        placed = (tbl[v1] == v) | (tbl[v2] == v)
        v = jnp.where(placed, EMPTY, v)
        tbl, steps = chain(tbl, v, aside[j].astype(jnp.int32))
        av = av.at[j].set(False)
        # a chain that hit the cap made no progress guarantee: stop
        return tbl, av, total + steps, steps >= chain_cap

    table, av_final, _, stuck = jax.lax.while_loop(
        s_cond, s_body, (table, avalid, jnp.int32(0), jnp.bool_(False))
    )

    payload: Tuple[jnp.ndarray, ...] = ()
    # sorted copy of the INSERTED keys (n, not size): the bulk ``has``/
    # ``at`` merge probes need it; one n-element (pair) sort is noise
    # next to the scatter/gather rounds above
    if values is not None:
        # residency BY VALUE (chain moves bypass per-key bookkeeping) —
        # the payload scatter needs each key's final slot anyway, so
        # the two full-table gathers double as the success check
        at1 = table[h1] == keys
        at2 = table[h2] == keys
        slot = jnp.where(at1, h1, jnp.where(at2, h2, -1))
        success = jnp.all(slot >= 0) & ~overflow
        buf = jnp.zeros((size,), dtype=values.dtype)
        safe = jnp.where(slot >= 0, slot, size)
        payload = (buf.at[safe].set(values, mode="drop"),)
        keys_sorted, vals_sorted = jax.lax.sort(
            (keys, values.astype(jnp.uint32)), num_keys=1,
            is_stable=False,
        )
    else:
        # keys-only build: success from CONSERVATION instead of the two
        # ~245 ms full-set gathers (measure_r7 c4). Every phase moves
        # keys by value — a placed key leaves exactly when its occupant
        # is picked up — and every point that can DROP a key raises a
        # flag: phase-1 exhaustion (``overflow``), a stage-2
        # re-compaction past its cap (folded into ``overflow`` above),
        # and a chain-cap bail (``stuck``). An empty active set under
        # clean flags therefore means every key is resident.
        success = ~jnp.any(av_final) & ~stuck & ~overflow
        (keys_sorted,) = jax.lax.sort((keys,), num_keys=1,
                                      is_stable=False)
        vals_sorted = jnp.zeros_like(keys_sorted)
    return CuckooTable(table, payload, seed1, seed2, success, rounds2,
                       keys_sorted, vals_sorted)


@jax.jit
def has(table: CuckooTable, queries: jnp.ndarray) -> jnp.ndarray:
    """Membership. Small batches: the 2-probe lookup
    (cuckoo_hashtable.hpp:29-41) — two random gathers per query. Bulk
    batches on accelerators: the gather-free sort-merge probe against
    the sorted inserted keys (TPU random gathers serialize at
    ~0.1 Gelem/s; observable semantics identical).

    CONTRACT (round-4 advisor): ``has`` is only meaningful when
    ``table.success`` is True — the reference's callers likewise discard
    a failed build and re-seed (cuckoo_hash_build.cpp:43-93). On a
    success=False table the engines diverge by design: the merge path
    answers from the full inserted key set while the 2-probe path only
    sees placed keys."""
    q = queries.astype(jnp.uint32)
    if (
        queries.shape[0] >= (1 << 16)
        and jax.default_backend() != "cpu"
    ):
        from .merge_lookup import merge_lookup_bitonic

        found, _ = merge_lookup_bitonic(
            table.keys_sorted, jnp.zeros_like(table.keys_sorted), q,
            membership=True,
        )
        return found
    size = table.size
    h1 = murmur3_32(q, table.seed1, size).astype(jnp.int32)
    h2 = _hash2(q, table.seed2, size).astype(jnp.int32)
    return (table.keys[h1] == q) | (table.keys[h2] == q)


@jax.jit
def at(table: CuckooTable, queries: jnp.ndarray):
    """Value lookup: returns (found, value). Small batches: the 2-probe
    gather pair (cuckoo_hashtable.hpp:29-41). Bulk batches on
    accelerators: the bitonic sort-merge probe against the build-sorted
    (key, value) pairs — same engine family as ``has``; values return
    as uint32. The ``has`` success contract applies."""
    q = queries.astype(jnp.uint32)
    if (
        queries.shape[0] >= (1 << 16)
        and jax.default_backend() != "cpu"
    ):
        from .merge_lookup import merge_lookup_bitonic

        return merge_lookup_bitonic(
            table.keys_sorted, table.vals_sorted, q
        )
    size = table.size
    h1 = murmur3_32(q, table.seed1, size).astype(jnp.int32)
    h2 = _hash2(q, table.seed2, size).astype(jnp.int32)
    hit1 = table.keys[h1] == q
    hit2 = table.keys[h2] == q
    vals = table.payload[0]
    v = jnp.where(hit1, vals[h1], jnp.where(hit2, vals[h2], 0))
    return hit1 | hit2, v
