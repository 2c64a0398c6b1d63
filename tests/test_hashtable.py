"""Hash-table kernel tests — the equivalent of tests/hash_table_tests.cpp:
exact layout assertions for the parking construction (vs. a serial FCFS
linear-probing simulation) plus probe semantics, and the cuckoo/bucket
variants (tests/cuckoo_hashtable_tests.cpp, tests/slab_tests.cpp)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dwarf_bench_tpu.ops import bucket_hash, cuckoo, hashtable
from dwarf_bench_tpu.ops.hashing import murmur3_32


def serial_fcfs(keys, home, size):
    table = np.full(size, 0xFFFFFFFF, np.uint64)
    for k, h in zip(keys, home):
        p = int(h)
        while table[p] != 0xFFFFFFFF:
            p = (p + 1) % size
        table[p] = k
    return table


class TestParkingConstruction:
    @pytest.mark.parametrize("load", [0.3, 0.5, 0.9, 1.0])
    def test_occupancy_matches_serial_oracle(self, rng, load):
        n = 257
        size = max(n, int(np.ceil(n / load)))
        keys = rng.choice(
            np.arange(1, n * 10 + 1), size=n, replace=False
        ).astype(np.uint32)
        home = np.asarray(murmur3_32(keys, 42, size)).astype(np.int64)
        ref = serial_fcfs(keys, home, size)
        t = hashtable.build(jnp.asarray(keys), jnp.asarray(home), size)
        got = np.asarray(t.keys).astype(np.uint64)
        assert np.array_equal(got != 0xFFFFFFFF, ref != 0xFFFFFFFF)
        assert set(got[got != 0xFFFFFFFF].tolist()) == set(keys.tolist())

    def test_collision_chain_placement(self):
        """Exact slot contents for a hand-built collision chain, like
        hash_table_tests.cpp:50-54."""
        keys = jnp.asarray([10, 20, 30], jnp.uint32)
        home = jnp.asarray([3, 3, 3], jnp.uint32)  # all collide at 3
        t = hashtable.build(keys, home, 8)
        got = np.asarray(t.keys)
        assert set(got[[3, 4, 5]].tolist()) == {10, 20, 30}
        assert (got[[0, 1, 2, 6, 7]] == 0xFFFFFFFF).all()

    def test_wraparound(self):
        """Keys hashing to the last slot wrap to the front
        (hash_table_tests.cpp:175-180 wraparound semantics)."""
        keys = jnp.asarray([7, 8, 9], jnp.uint32)
        home = jnp.asarray([6, 6, 6], jnp.uint32)
        t = hashtable.build(keys, home, 8)
        got = np.asarray(t.keys)
        assert set(got[[6, 7, 0]].tolist()) == {7, 8, 9}
        found, _ = hashtable.probe(
            t, keys, home
        )
        assert bool(np.all(np.asarray(found)))

    def test_probe_rejects_absent(self, rng):
        n, size = 100, 256
        keys = rng.choice(np.arange(1, 1001), n, replace=False).astype(np.uint32)
        home = murmur3_32(jnp.asarray(keys), 1, size)
        t = hashtable.build(jnp.asarray(keys), home, size)
        absent = np.setdiff1d(
            np.arange(1001, 1200, dtype=np.uint32), keys
        )[:50]
        ah = murmur3_32(jnp.asarray(absent), 1, size)
        found, slot = hashtable.probe(t, jnp.asarray(absent), ah,
                                      max_steps=jnp.int32(size))
        assert not bool(np.any(np.asarray(found)))
        assert (np.asarray(slot) == -1).all()

    def test_payload_lookup(self, rng):
        n, size = 500, 1024
        keys = rng.choice(np.arange(1, 5001), n, replace=False).astype(np.uint32)
        vals = rng.integers(1, 10000, n).astype(np.uint32)
        home = murmur3_32(jnp.asarray(keys), 9, size)
        t = hashtable.build(jnp.asarray(keys), home, size,
                            payload=(jnp.asarray(vals),))
        found, got = hashtable.lookup(t, jnp.asarray(keys), home)
        assert bool(np.all(np.asarray(found)))
        assert np.array_equal(np.asarray(got), vals)

    def test_duplicate_keys_all_inserted(self):
        """The bitmask table inserts duplicates as separate entries
        (hashtable.hpp:70-92 claims a fresh slot per insert)."""
        keys = jnp.asarray([5, 5, 5, 7], jnp.uint32)
        home = jnp.asarray([1, 1, 1, 1], jnp.uint32)
        t = hashtable.build(keys, home, 8)
        got = np.asarray(t.keys)
        assert (got[[1, 2, 3, 4]] != 0xFFFFFFFF).all()

    def test_valid_mask_padding(self, rng):
        """Padding rows (fixed-capacity inputs) must not perturb placement."""
        n, size = 64, 256
        keys = rng.choice(np.arange(1, 641), n, replace=False).astype(np.uint32)
        home = np.asarray(murmur3_32(jnp.asarray(keys), 3, size))
        ref = serial_fcfs(keys, home, size)
        pad = np.full(32, 0xFFFFFFFF, np.uint32)
        keys_p = np.concatenate([keys, pad])
        home_p = np.concatenate([home, np.zeros(32, home.dtype)])
        valid = np.concatenate([np.ones(n, bool), np.zeros(32, bool)])
        t = hashtable.build(
            jnp.asarray(keys_p), jnp.asarray(home_p), size,
            valid=jnp.asarray(valid),
        )
        got = np.asarray(t.keys).astype(np.uint64)
        assert np.array_equal(got != 0xFFFFFFFF, ref != 0xFFFFFFFF)


class TestCuckoo:
    def test_insert_and_find(self, rng):
        n = 500
        keys = rng.choice(np.arange(1, 5001), n, replace=False).astype(np.uint32)
        t = cuckoo.build(jnp.asarray(keys), 4 * n, 11, 22,
                         max_iters=min(n, 100_000))
        assert bool(t.success)
        assert bool(np.all(np.asarray(cuckoo.has(t, jnp.asarray(keys)))))

    def test_unplaceable_set_reports_failure(self):
        # 3 keys sharing BOTH buckets can never cohabit 2 slots: the
        # build must terminate and report success=False (the keys-only
        # path derives success from the conservation flags — late
        # round 5 — so this pins the failure semantics, not a hang)
        size = 8
        s1, s2 = np.uint32(11), np.uint32(22)
        cand = np.arange(1, 20001, dtype=np.uint32)
        h1 = np.asarray(cuckoo.murmur3_32(jnp.asarray(cand), s1, size))
        h2 = np.asarray(cuckoo._hash2(jnp.asarray(cand), s2, size))
        trio = None
        for pair in range(size * size):
            if pair // size == pair % size:
                continue  # h1 == h2 keys have ONE slot: 2 already fail
            m = (h1 == pair // size) & (h2 == pair % size)
            if int(m.sum()) >= 3:
                trio = cand[m][:3]
                break
        assert trio is not None, "no 3-key bucket collision in 20k keys"
        t = cuckoo.build(jnp.asarray(trio), size, s1, s2, max_iters=64)
        assert not bool(t.success)
        # a 2-key subset of the same buckets is placeable
        t2 = cuckoo.build(jnp.asarray(trio[:2]), size, s1, s2,
                          max_iters=64)
        assert bool(t2.success)

    def test_rejects_absent(self, rng):
        n = 200
        keys = rng.choice(np.arange(1, 2001), n, replace=False).astype(np.uint32)
        t = cuckoo.build(jnp.asarray(keys), 4 * n, 5, 6, max_iters=n)
        absent = np.setdiff1d(np.arange(2001, 2300, dtype=np.uint32), keys)[:99]
        assert not bool(np.any(np.asarray(cuckoo.has(t, jnp.asarray(absent)))))

    def test_values(self, rng):
        n = 128
        keys = rng.choice(np.arange(1, 1281), n, replace=False).astype(np.uint32)
        vals = rng.integers(1, 1000, n).astype(np.uint32)
        t = cuckoo.build(jnp.asarray(keys), 4 * n, 1, 2, max_iters=n,
                         values=jnp.asarray(vals))
        found, got = cuckoo.at(t, jnp.asarray(keys))
        assert bool(np.all(np.asarray(found)))
        assert np.array_equal(np.asarray(got), vals)

    def test_bulk_at_payload_order(self, rng):
        """vals_sorted must ride keys_sorted's order: the bulk ``at``
        engine (merge_lookup_bitonic over the build-sorted pairs) must
        return every inserted key's value."""
        from dwarf_bench_tpu.ops.merge_lookup import merge_lookup_bitonic

        n = 1024
        keys = rng.choice(np.arange(1, 65536), n, replace=False).astype(
            np.uint32)
        vals = rng.integers(1, 10000, n).astype(np.uint32)
        t = cuckoo.build(jnp.asarray(keys), 4 * n, 9, 10, max_iters=256,
                         values=jnp.asarray(vals))
        assert bool(t.success)
        f, v = merge_lookup_bitonic(t.keys_sorted, t.vals_sorted,
                                    jnp.asarray(keys))
        assert bool(np.all(np.asarray(f)))
        assert np.array_equal(np.asarray(v), vals)

    def test_phase_split_small_compact_cap(self, rng):
        """Round-5 phase structure: force the full-round -> compacted
        active-set handoff with a tiny compact_cap, and verify the build
        still places every key with correct payloads."""
        n = 8192
        keys = (rng.permutation(2 * n)[:n].astype(np.uint32) + 1)
        vals = rng.integers(1, 10000, n).astype(np.uint32)
        t = cuckoo.build(jnp.asarray(keys), 4 * n, 3, 4, max_iters=256,
                         values=jnp.asarray(vals), compact_cap=256)
        assert bool(t.success)
        found, got = cuckoo.at(t, jnp.asarray(keys))
        assert bool(np.all(np.asarray(found)))
        assert np.array_equal(np.asarray(got), vals)
        # compact_cap >= n degenerates to pure phase-2 (zero full rounds)
        t2 = cuckoo.build(jnp.asarray(keys), 4 * n, 3, 4, max_iters=256,
                          compact_cap=n)
        assert bool(t2.success)
        assert bool(np.all(np.asarray(cuckoo.has(t2, jnp.asarray(keys)))))

    def test_each_key_at_one_of_two_slots(self, rng):
        """2-probe property: every resident key sits at h1 or h2
        (cuckoo_hashtable.hpp:29-41)."""
        n = 300
        keys = rng.choice(np.arange(1, 3001), n, replace=False).astype(np.uint32)
        size = 4 * n
        t = cuckoo.build(jnp.asarray(keys), size, 77, 88, max_iters=n)
        assert bool(t.success)
        h1 = np.asarray(murmur3_32(jnp.asarray(keys), t.seed1, size))
        # h2 carries the round-4 bijective key premix (ops/cuckoo._hash2:
        # plain two-seed murmur pairs are a correlated family with ~2^10
        # automatic mirror 2-cycles at 2^22)
        h2 = np.asarray(cuckoo._hash2(jnp.asarray(keys), t.seed2, size))
        table = np.asarray(t.keys)
        assert np.all((table[h1] == keys) | (table[h2] == keys))


class TestBucketHash:
    def test_build_find(self, rng):
        n = 1000
        keys = rng.choice(np.arange(1, 10001), n, replace=False).astype(np.uint32)
        vals = rng.integers(1, 10000, n).astype(np.uint32)
        nb = bucket_hash.calculate_buckets_count(n)
        t = bucket_hash.build(jnp.asarray(keys), jnp.asarray(vals), nb)
        found, got = bucket_hash.find(t, jnp.asarray(keys))
        assert bool(np.all(np.asarray(found)))
        assert np.array_equal(np.asarray(got), vals)

    def test_overflow_path(self, rng):
        """Tiny capacity forces spill; lookups must still succeed (the
        analog of walking chained slabs, slab_hash.hpp:264-294)."""
        n = 400
        keys = rng.choice(np.arange(1, 4001), n, replace=False).astype(np.uint32)
        vals = keys * 2
        t = bucket_hash.build(jnp.asarray(keys), jnp.asarray(vals),
                              num_buckets=4, capacity=8)
        assert int(t.overflow_count) > 0
        found, got = bucket_hash.find(t, jnp.asarray(keys))
        assert bool(np.all(np.asarray(found)))
        assert np.array_equal(np.asarray(got), vals)

    def test_absent(self, rng):
        n = 100
        keys = rng.choice(np.arange(1, 1001), n, replace=False).astype(np.uint32)
        t = bucket_hash.build(jnp.asarray(keys), jnp.asarray(keys), 8)
        absent = np.setdiff1d(np.arange(1001, 1101, dtype=np.uint32), keys)
        found, _ = bucket_hash.find(t, jnp.asarray(absent))
        assert not bool(np.any(np.asarray(found)))

    def test_buckets_heuristic(self):
        assert bucket_hash.calculate_buckets_count(1900, 60) == 100
        assert bucket_hash.calculate_buckets_count(1, 60) == 1
