"""Distributed one-to-many hash join over a device mesh.

Not in the reference (single-device); built per BASELINE.json: both tables
hash-partitioned by key across chips via the fixed-capacity all-to-all
shuffle (shuffle.py), then each chip runs the single-chip CSR join
(ops/csr_join.py) over the keys it owns. Row ids are carried through the
shuffle as payload so the join output references GLOBAL row ids.

Returned per chip: per-received-B-row (found, count) plus the global match
total (psum) — the aggregate the scaling benchmark measures.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

import numpy as np

from ..ops import csr_join, hashtable
from ..ops.hashing import murmur3_32
from ..ops.hashtable import EMPTY
from ..ops.primitives import compact_multi
from .mesh import DCN_AXIS, ICI_AXIS, ROW_AXIS
from .shuffle import partition_for_shuffle, partition_for_shuffle_2d


def _local_join(keys, row_ids, queries, distinct_cap, ht_size, dense):
    """Per-chip CSR join engine: dense-by-key (MXU histogram build + MXU
    gather probe, ops/csr_join.build_dense) when the caller guarantees the
    GLOBAL key span fits one 2^14 window (csr_join.dense_applicable — the
    same host knowledge that sizes distinct_cap), general sort-merge
    otherwise."""
    if dense:
        t = csr_join.build_dense(keys, row_ids=row_ids)
        return csr_join.probe_dense(t, queries)
    t = csr_join.build(keys, distinct_cap, ht_size, row_ids=row_ids)
    return csr_join.probe_merge(t, queries)


def dist_csr_join(mesh: Mesh, rows_per_chip: int, distinct_cap: int,
                  ht_size: int, shuffle_capacity: int, dense: bool = False):
    """Returns a jitted fn(a_keys, b_keys) over row-sharded inputs.

    Outputs (all row-sharded by chip): local match counts per received B
    row, per-chip match totals, global total (replicated), and shuffle
    overflow counters (must be 0 for a correct run).
    """
    n_chips = mesh.shape[ROW_AXIS]

    def local(a_keys, b_keys):
        my = jax.lax.axis_index(ROW_AXIS).astype(jnp.uint32)
        base = my * jnp.uint32(rows_per_chip)
        a_ids = base + jnp.arange(a_keys.shape[0], dtype=jnp.uint32)
        b_ids = base + jnp.arange(b_keys.shape[0], dtype=jnp.uint32)

        rak, rai, _, ov_a = partition_for_shuffle(
            a_keys, a_ids, n_chips, shuffle_capacity, ROW_AXIS
        )
        rbk, rbi, _, ov_b = partition_for_shuffle(
            b_keys, b_ids, n_chips, shuffle_capacity, ROW_AXIS
        )
        flat_ak = rak.reshape(-1)
        flat_ai = rai.reshape(-1)
        flat_bk = rbk.reshape(-1)

        res = _local_join(
            flat_ak, flat_ai, flat_bk, distinct_cap, ht_size, dense
        )
        local_matches = jnp.sum(
            jnp.where(res.found, res.counts, 0).astype(jnp.int32)
        )
        total = jax.lax.psum(local_matches, ROW_AXIS)
        counts_out = jnp.where(res.found, res.counts, 0)
        return (
            counts_out[None],
            local_matches[None],
            total,
            (ov_a + ov_b).reshape(1),
        )

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(P(ROW_AXIS), P(ROW_AXIS)),
            out_specs=(P(ROW_AXIS), P(ROW_AXIS), P(), P(ROW_AXIS)),
        )
    )


def dist_csr_join_ring(
    mesh: Mesh,
    rows_per_chip: int,
    distinct_cap: int,
    ht_size: int,
    dense: bool = False,
):
    """Ring-pipelined distributed CSR join — the "overlap shuffle with
    probe compute" design (SURVEY.md §7 / BASELINE.json): no hash shuffle
    at all. Each chip builds a CSR table over ITS OWN A shard (global row
    ids); the B shards then rotate around the 1-D ring via
    ``lax.ppermute``, each chip probing the visiting chunk against its
    local table and accumulating per-row match counts into a carry that
    travels WITH the chunk. After n_chips rotations every B chunk is home
    with its global counts. XLA schedules the next hop's ppermute
    asynchronously against the current probe, overlapping ICI with
    compute; per-destination capacity/overflow and key skew are
    non-issues (any-skew robust, like a broadcast join but moving only B).

    Returns (per-B-row global match counts [row-sharded], per-chip match
    totals, global total)."""
    n_chips = mesh.shape[ROW_AXIS]
    perm = [(i, (i + 1) % n_chips) for i in range(n_chips)]

    def local(a_keys, b_keys):
        my = jax.lax.axis_index(ROW_AXIS).astype(jnp.uint32)
        a_ids = my * jnp.uint32(rows_per_chip) + jnp.arange(
            a_keys.shape[0], dtype=jnp.uint32
        )
        ak = a_keys.astype(jnp.uint32)
        if dense:
            table = csr_join.build_dense(ak, row_ids=a_ids)
        else:
            table = csr_join.build(
                ak, distinct_cap, ht_size, row_ids=a_ids
            )

        bk = b_keys.astype(jnp.uint32)
        acc = jnp.zeros(bk.shape, jnp.int32)
        # unrolled static ring: probe the resident chunk, then rotate the
        # (chunk, counts) pair one hop — after n_chips hops it is home
        for _ in range(n_chips):
            if dense:
                res = csr_join.probe_dense(table, bk)
            else:
                res = csr_join.probe_merge(table, bk)
            acc = acc + jnp.where(res.found, res.counts, 0)
            bk = jax.lax.ppermute(bk, ROW_AXIS, perm)
            acc = jax.lax.ppermute(acc, ROW_AXIS, perm)
        local_matches = jnp.sum(acc)
        total = jax.lax.psum(local_matches, ROW_AXIS)
        return acc[None], local_matches[None], total

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(P(ROW_AXIS), P(ROW_AXIS)),
            out_specs=(P(ROW_AXIS), P(ROW_AXIS), P()),
        )
    )


def dist_csr_join_skew(
    mesh: Mesh,
    rows_per_chip: int,
    distinct_cap: int,
    ht_size: int,
    shuffle_capacity: int,
    heavy_cap: int = 16,
    candidates_per_chip: int = 8,
    heavy_rows_cap: int | None = None,
):
    """Skew-aware distributed CSR join (BASELINE.json: hash-partition
    shuffle with skew-aware repartitioning).

    A hash shuffle sends every row of a key to one chip, so a heavy key
    overflows that chip's fixed-capacity slot. This variant splits the work:

      1. **Detect** heavy keys: each chip nominates its top local keys by
         count (sort + segment counts — no atomics), candidates are
         all-gathered, and exact global counts come from a psum; keys whose
         global count exceeds half the shuffle capacity are "heavy". Every
         chip derives the identical heavy list.
      2. **Broadcast** the heavy keys' A-side rows (all-gather of the
         compacted heavy rows with global ids) — every chip builds the same
         small CSR table over them; heavy B rows then probe LOCALLY, with
         no shuffle at all (the broadcast-join treatment of SharesSkew-style
         skew handling).
      3. **Shuffle** only the light tail through the fixed-capacity hash
         all-to-all and join as usual.

    Returns (light result counts, heavy result counts, global total,
    shuffle overflow) — overflow stays 0 under heavy skew that would break
    the plain hash shuffle.

    ``total`` is int32 and wraps mod 2^32: a single heavy key at p% of
    both sides yields ~(p·n)² pairs, which exceeds 2^31 well before any
    capacity trips (x64 is off in this deployment). Callers needing exact
    giant totals sum the returned per-row counts host-side in uint64
    (tests/test_distributed.py::TestDistJoinAtScale does exactly that).
    """
    n_chips = mesh.shape[ROW_AXIS]
    if heavy_rows_cap is None:
        heavy_rows_cap = rows_per_chip

    def _top_local_keys(keys):
        """Top ``candidates_per_chip`` local keys by count (sort-based)."""
        sk = jax.lax.sort(keys.astype(jnp.uint32))
        n = sk.shape[0]
        is_start = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])
        # segment sizes scatter-free: start offsets by partition sort,
        # counts = diff of consecutive starts (same pattern as csr build)
        row_idx = jnp.arange(n, dtype=jnp.int32)
        _, starts_c, keys_c = jax.lax.sort(
            ((~is_start).astype(jnp.int32), row_idx, sk),
            num_keys=1, is_stable=True,
        )
        nseg = jnp.sum(is_start.astype(jnp.int32))
        in_seg = jnp.arange(n) < nseg
        starts = jnp.where(in_seg, starts_c, n)
        counts = jnp.concatenate([starts[1:], jnp.array([n])]) - starts
        counts = jnp.where(in_seg, jnp.maximum(counts, 0), 0)
        # order segments by count descending
        _, top_keys = jax.lax.sort(
            (-counts, jnp.where(in_seg, keys_c, 0).astype(jnp.uint32)),
            num_keys=1,
        )
        return top_keys[:candidates_per_chip]

    def local(a_keys, b_keys):
        my = jax.lax.axis_index(ROW_AXIS).astype(jnp.uint32)
        base = my * jnp.uint32(rows_per_chip)
        a_ids = base + jnp.arange(a_keys.shape[0], dtype=jnp.uint32)
        ak = a_keys.astype(jnp.uint32)
        bk = b_keys.astype(jnp.uint32)

        # 1. heavy-key detection (identical on every chip)
        cands = jax.lax.all_gather(_top_local_keys(ak), ROW_AXIS).reshape(-1)
        # exact global counts per candidate (C is small → broadcast compare)
        local_counts = jnp.sum(
            (ak[None, :] == cands[:, None]).astype(jnp.int32), axis=1
        )
        global_counts = jax.lax.psum(local_counts, ROW_AXIS)
        threshold = jnp.int32(max(shuffle_capacity // 2, 1))
        is_heavy_cand = global_counts > threshold
        # dedupe + keep the heaviest ``heavy_cap`` (sort by count desc)
        srt_k, srt_c = jax.lax.sort(
            (cands, jnp.where(is_heavy_cand, global_counts, 0)), num_keys=1
        )
        first = jnp.concatenate(
            [jnp.ones((1,), bool), srt_k[1:] != srt_k[:-1]]
        )
        eff_c = jnp.where(first, srt_c, 0)
        _, heavy_sorted = jax.lax.sort((-eff_c, srt_k), num_keys=1)
        pad_fill = jnp.full((heavy_cap,), EMPTY, jnp.uint32)
        heavy_keys = jnp.where(
            jnp.sort(-eff_c)[:heavy_cap] < 0, heavy_sorted[:heavy_cap],
            pad_fill,
        )

        def is_heavy(keys):
            return jnp.any(keys[None, :] == heavy_keys[:, None], axis=0)

        heavy_a = is_heavy(ak)
        heavy_b = is_heavy(bk)

        # 2. broadcast-join the heavy keys
        from ..ops.primitives import compact_multi

        (hk, hid), _ = compact_multi(
            (ak, a_ids), heavy_a, capacity=heavy_rows_cap, fill=EMPTY
        )
        all_hk = jax.lax.all_gather(hk, ROW_AXIS).reshape(-1)
        all_hid = jax.lax.all_gather(hid, ROW_AXIS).reshape(-1)
        heavy_table = csr_join.build(
            all_hk, heavy_cap * 4, 2 * heavy_cap * 4 + 2, row_ids=all_hid
        )
        b_heavy_keys = jnp.where(heavy_b, bk, EMPTY)
        heavy_res = csr_join.probe_merge(heavy_table, b_heavy_keys)
        heavy_matches = jnp.sum(
            jnp.where(heavy_res.found, heavy_res.counts, 0).astype(jnp.int32)
        )

        # 3. hash-shuffle the light tail
        rak, rai, _, ov_a = partition_for_shuffle(
            ak, a_ids, n_chips, shuffle_capacity, ROW_AXIS, drop=heavy_a
        )
        b_ids = base + jnp.arange(bk.shape[0], dtype=jnp.uint32)
        rbk, rbi, _, ov_b = partition_for_shuffle(
            bk, b_ids, n_chips, shuffle_capacity, ROW_AXIS, drop=heavy_b
        )
        table = csr_join.build(
            rak.reshape(-1), distinct_cap, ht_size,
            row_ids=rai.reshape(-1),
        )
        light_res = csr_join.probe_merge(table, rbk.reshape(-1))
        light_matches = jnp.sum(
            jnp.where(light_res.found, light_res.counts, 0).astype(jnp.int32)
        )
        total = jax.lax.psum(light_matches + heavy_matches, ROW_AXIS)
        light_counts = jnp.where(light_res.found, light_res.counts, 0)
        heavy_counts = jnp.where(heavy_res.found, heavy_res.counts, 0)
        return (
            light_counts[None],
            heavy_counts[None],
            total,
            (ov_a + ov_b).reshape(1),
        )

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(P(ROW_AXIS), P(ROW_AXIS)),
            out_specs=(P(ROW_AXIS), P(ROW_AXIS), P(), P(ROW_AXIS)),
        )
    )


def dist_hash_join_rows(mesh: Mesh, shuffle_capacity: int, ht_size: int,
                        hash_seed=np.uint32(0x85EBCA6B)):
    """Distributed 1:1 hash join returning MATERIALIZED (key, a_val, b_val)
    rows — the reference Join dwarf's observable output (join/join.cpp:
    80-129), distributed: both tables hash-partition by key through the
    multi-column shuffle (values ride as payload), each chip builds the
    parking-construction hash table over the A rows it owns and probes its
    B rows, and matched rows are compacted on-device per chip
    (fixed-capacity + count). The union of per-chip row sets is the join —
    validated order-insensitively against the seq_join oracle
    (join/join_helpers.hpp:86-125), like the reference's compare.

    Returns per chip (row-sharded): keys, a_vals, b_vals (each
    (n_chips * shuffle_capacity,) with garbage past count), count, and
    shuffle overflow (must be 0)."""
    n_chips = mesh.shape[ROW_AXIS]

    def local(a_keys, a_vals, b_keys, b_vals):
        rak, (rav,), _, ov_a = partition_for_shuffle(
            a_keys, (a_vals,), n_chips, shuffle_capacity, ROW_AXIS
        )
        rbk, (rbv,), _, ov_b = partition_for_shuffle(
            b_keys, (b_vals,), n_chips, shuffle_capacity, ROW_AXIS
        )
        fak, fav = rak.reshape(-1), rav.reshape(-1)
        fbk, fbv = rbk.reshape(-1), rbv.reshape(-1)
        home = murmur3_32(fak, hash_seed, ht_size)
        table = hashtable.build(
            fak, home, ht_size, payload=(fav,), valid=fak != EMPTY
        )
        bhome = murmur3_32(fbk, hash_seed, ht_size)
        found, av = hashtable.lookup(table, fbk, bhome)
        found = found & (fbk != EMPTY)
        (k, a, b), count = compact_multi((fbk, av, fbv), found)
        return (
            k[None], a[None], b[None], count.reshape(1),
            (ov_a + ov_b).reshape(1),
        )

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(P(ROW_AXIS),) * 4,
            out_specs=(P(ROW_AXIS),) * 5,
        )
    )


def dist_csr_join_2d(mesh: Mesh, rows_per_chip: int, distinct_cap: int,
                     ht_size: int, cap_ici: int, cap_dcn: int,
                     dense: bool = False):
    """dist_csr_join on a 2-D (dcn, ici) mesh with the hierarchical two-hop
    shuffle (shuffle.partition_for_shuffle_2d): rows cross the slow DCN
    fabric exactly once, aggregated per host — the DCN-aware layout
    SURVEY.md §5.8 maps the north star to. Row ids are GLOBAL
    (chip linear index = dcn_idx * n_ici + ici_idx).

    Returns (per-received-B-row counts [row-sharded], per-chip totals,
    global total [replicated], shuffle overflow)."""
    n_dcn = mesh.shape[DCN_AXIS]
    n_ici = mesh.shape[ICI_AXIS]

    def local(a_keys, b_keys):
        d_idx = jax.lax.axis_index(DCN_AXIS).astype(jnp.uint32)
        i_idx = jax.lax.axis_index(ICI_AXIS).astype(jnp.uint32)
        linear = d_idx * jnp.uint32(n_ici) + i_idx
        base = linear * jnp.uint32(rows_per_chip)
        a_ids = base + jnp.arange(a_keys.shape[0], dtype=jnp.uint32)
        b_ids = base + jnp.arange(b_keys.shape[0], dtype=jnp.uint32)

        rak, (rai,), _, ov_a = partition_for_shuffle_2d(
            a_keys, (a_ids,), n_dcn, n_ici, cap_ici, cap_dcn,
            DCN_AXIS, ICI_AXIS,
        )
        rbk, (rbi,), _, ov_b = partition_for_shuffle_2d(
            b_keys, (b_ids,), n_dcn, n_ici, cap_ici, cap_dcn,
            DCN_AXIS, ICI_AXIS,
        )
        res = _local_join(
            rak.reshape(-1), rai.reshape(-1), rbk.reshape(-1),
            distinct_cap, ht_size, dense,
        )
        local_matches = jnp.sum(
            jnp.where(res.found, res.counts, 0).astype(jnp.int32)
        )
        total = jax.lax.psum(local_matches, (DCN_AXIS, ICI_AXIS))
        counts_out = jnp.where(res.found, res.counts, 0)
        return (
            counts_out[None, None],
            local_matches[None, None],
            total,
            (ov_a + ov_b).reshape(1, 1),
        )

    sharded = P(DCN_AXIS, ICI_AXIS)
    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(P((DCN_AXIS, ICI_AXIS)), P((DCN_AXIS, ICI_AXIS))),
            out_specs=(sharded, sharded, P(), sharded),
        )
    )


def dist_csr_join_ring_2d(mesh: Mesh, rows_per_chip: int, distinct_cap: int,
                          ht_size: int, dense: bool = False):
    """Ring join on a 2-D (dcn, ici) mesh: B chunks rotate through all
    chips of a host over ICI (n_ici hops), then take ONE DCN hop to the
    next host, repeating for every host — n_dcn DCN crossings per chunk
    total versus n_chips for a flat ring over the pod. Per-hop compute
    (local probe) overlaps the next hop's ppermute like the 1-D ring.

    Returns (per-B-row global counts [row-sharded], per-chip totals,
    global total)."""
    n_dcn = mesh.shape[DCN_AXIS]
    n_ici = mesh.shape[ICI_AXIS]
    perm_ici = [(i, (i + 1) % n_ici) for i in range(n_ici)]
    perm_dcn = [(i, (i + 1) % n_dcn) for i in range(n_dcn)]

    def local(a_keys, b_keys):
        d_idx = jax.lax.axis_index(DCN_AXIS).astype(jnp.uint32)
        i_idx = jax.lax.axis_index(ICI_AXIS).astype(jnp.uint32)
        linear = d_idx * jnp.uint32(n_ici) + i_idx
        a_ids = linear * jnp.uint32(rows_per_chip) + jnp.arange(
            a_keys.shape[0], dtype=jnp.uint32
        )
        ak = a_keys.astype(jnp.uint32)
        if dense:
            table = csr_join.build_dense(ak, row_ids=a_ids)
        else:
            table = csr_join.build(ak, distinct_cap, ht_size, row_ids=a_ids)

        bk = b_keys.astype(jnp.uint32)
        acc = jnp.zeros(bk.shape, jnp.int32)
        for _ in range(n_dcn):
            for _ in range(n_ici):
                if dense:
                    res = csr_join.probe_dense(table, bk)
                else:
                    res = csr_join.probe_merge(table, bk)
                acc = acc + jnp.where(res.found, res.counts, 0)
                bk = jax.lax.ppermute(bk, ICI_AXIS, perm_ici)
                acc = jax.lax.ppermute(acc, ICI_AXIS, perm_ici)
            bk = jax.lax.ppermute(bk, DCN_AXIS, perm_dcn)
            acc = jax.lax.ppermute(acc, DCN_AXIS, perm_dcn)
        local_matches = jnp.sum(acc)
        total = jax.lax.psum(local_matches, (DCN_AXIS, ICI_AXIS))
        return acc[None, None], local_matches[None, None], total

    sharded = P(DCN_AXIS, ICI_AXIS)
    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(P((DCN_AXIS, ICI_AXIS)), P((DCN_AXIS, ICI_AXIS))),
            out_specs=(sharded, sharded, P()),
        )
    )
