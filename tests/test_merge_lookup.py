"""Gather-free sort-merge bulk probe (ops/merge_lookup) vs oracles and
vs the tile/2-probe engines it replaces at bulk sizes."""

import numpy as np
import jax.numpy as jnp
import pytest

from dwarf_bench_tpu.ops.merge_lookup import (
    merge_lookup,
    merge_lookup_bitonic,
    sort_table,
)


@pytest.mark.parametrize("nt,nq", [(100, 1000), (5000, 5000), (1, 7)])
def test_merge_lookup_matches_dict(rng, nt, nq):
    keys = rng.choice(1 << 20, nt, replace=False).astype(np.uint32)
    vals = rng.integers(1, 10000, nt).astype(np.uint32)
    # ~50% hits, plus edge keys 0 / max
    q = np.concatenate(
        [rng.permutation(keys)[: nq // 2],
         rng.integers(1 << 21, 1 << 22, nq - nq // 2).astype(np.uint32)]
    )
    rng.shuffle(q)
    sk, sv = sort_table(jnp.asarray(keys), jnp.asarray(vals))
    found, val = merge_lookup(sk, sv, jnp.asarray(q))
    d = dict(zip(keys.tolist(), vals.tolist()))
    exp_f = np.array([int(k) in d for k in q])
    exp_v = np.array([d.get(int(k), 0) for k in q], np.uint32)
    assert np.array_equal(np.asarray(found), exp_f)
    assert np.array_equal(np.asarray(val), exp_v)


def test_merge_lookup_key_zero_and_empty():
    keys = np.array([0, 5, 0xFFFFFFFE], np.uint32)
    vals = np.array([11, 22, 33], np.uint32)
    q = np.array([0, 5, 7, 0xFFFFFFFF, 0xFFFFFFFE, 0], np.uint32)
    sk, sv = sort_table(jnp.asarray(keys), jnp.asarray(vals))
    found, val = merge_lookup(sk, sv, jnp.asarray(q))
    assert list(np.asarray(found)) == [True, True, False, False, True,
                                       True]
    assert list(np.asarray(val)) == [11, 22, 0, 0, 33, 11]


def test_merge_lookup_empty_padded_table(rng):
    # EMPTY-padded sorted table (free slots) must never match
    keys = np.array([3, 9, 0xFFFFFFFF, 0xFFFFFFFF], np.uint32)
    vals = np.array([1, 2, 0, 0], np.uint32)
    q = np.array([3, 9, 0xFFFFFFFF, 4], np.uint32)
    found, val = merge_lookup(jnp.asarray(keys), jnp.asarray(vals),
                              jnp.asarray(q))
    assert list(np.asarray(found)) == [True, True, False, False]


@pytest.mark.parametrize("nt,nq", [(100, 1000), (5000, 5000), (1, 7),
                                   (4096, 4096), (1000, 24)])
@pytest.mark.parametrize("val_bits", [16, 32])
@pytest.mark.parametrize("compact_first", [False, True])
def test_bitonic_matches_dict(rng, nt, nq, val_bits, compact_first):
    keys = rng.choice(1 << 20, nt, replace=False).astype(np.uint32)
    vals = rng.integers(1, 10000, nt).astype(np.uint32)  # < 2^16: both
    q = np.concatenate(                                  # widths exact
        [rng.permutation(keys)[: nq // 2],
         rng.integers(1 << 21, 1 << 22, nq - nq // 2).astype(np.uint32)]
    )
    rng.shuffle(q)
    sk, sv = sort_table(jnp.asarray(keys), jnp.asarray(vals))
    found, val = merge_lookup_bitonic(
        sk, sv, jnp.asarray(q), val_bits=val_bits,
        compact_first=compact_first,
    )
    d = dict(zip(keys.tolist(), vals.tolist()))
    exp_f = np.array([int(k) in d for k in q])
    exp_v = np.array([d.get(int(k), 0) for k in q], np.uint32)
    assert np.array_equal(np.asarray(found), exp_f)
    assert np.array_equal(np.asarray(val), exp_v)


@pytest.mark.parametrize("compact_first", [False, True])
def test_bitonic_val16_boundary_values(rng, compact_first):
    # the unsort carries the value column at u16 when val_bits=16
    # (measure_r7): 0 and 65535 must round-trip the narrow carry exactly
    keys = np.array([2, 10, 99, 1000, 77], np.uint32)
    vals = np.array([0, 65535, 1, 65534, 32768], np.uint32)
    q = np.array([10, 2, 3, 77, 1000, 99, 10], np.uint32)
    sk, sv = sort_table(jnp.asarray(keys), jnp.asarray(vals))
    found, val = merge_lookup_bitonic(
        sk, sv, jnp.asarray(q), val_bits=16, compact_first=compact_first
    )
    assert list(np.asarray(found)) == [True, True, False, True, True,
                                       True, True]
    assert list(np.asarray(val)) == [65535, 0, 0, 32768, 65534, 1, 65535]


def test_bitonic_wide_vals_and_dup_queries(rng):
    # values past 2^16 require val_bits=32; duplicate queries must all
    # resolve identically
    nt, nq = 3000, 4000
    keys = rng.choice(1 << 24, nt, replace=False).astype(np.uint32)
    vals = rng.integers(0, 1 << 32, nt, dtype=np.uint64).astype(np.uint32)
    q = rng.choice(keys, nq).astype(np.uint32)  # with replacement
    q[::7] = 0xABCDEF12  # guaranteed misses sprinkled in
    sk, sv = sort_table(jnp.asarray(keys), jnp.asarray(vals))
    found, val = merge_lookup_bitonic(sk, sv, jnp.asarray(q))
    d = dict(zip(keys.tolist(), vals.tolist()))
    exp_f = np.array([int(k) in d for k in q])
    exp_v = np.array([d.get(int(k), 0) for k in q], np.uint32)
    assert np.array_equal(np.asarray(found), exp_f)
    assert np.array_equal(np.asarray(val), exp_v)


def test_bitonic_key_zero_empty_and_membership():
    keys = np.array([0, 5, 0xFFFFFFFE], np.uint32)
    vals = np.array([11, 22, 33], np.uint32)
    # q == 0 before any table row in the merge, q == EMPTY, misses
    q = np.array([0, 5, 7, 0xFFFFFFFF, 0xFFFFFFFE, 0], np.uint32)
    sk, sv = sort_table(jnp.asarray(keys), jnp.asarray(vals))
    for vb in (16, 32):
        found, val = merge_lookup_bitonic(sk, sv, jnp.asarray(q),
                                          val_bits=vb)
        assert list(np.asarray(found)) == [True, True, False, False,
                                           True, True]
        assert list(np.asarray(val)) == [11, 22, 0, 0, 33, 11]
    # query key 0 with NO table key 0: the nsrc guard must hold
    f2, v2 = merge_lookup_bitonic(
        jnp.asarray(np.array([7, 9], np.uint32)),
        jnp.asarray(np.array([1, 2], np.uint32)),
        jnp.asarray(np.array([0, 7], np.uint32)),
    )
    assert list(np.asarray(f2)) == [False, True]
    # membership: found identical, values all zero
    fm, vm = merge_lookup_bitonic(sk, sv, jnp.asarray(q), membership=True)
    assert list(np.asarray(fm)) == [True, True, False, False, True, True]
    assert not np.asarray(vm).any()


def test_bitonic_empty_padded_table():
    keys = np.array([3, 9, 0xFFFFFFFF, 0xFFFFFFFF], np.uint32)
    vals = np.array([1, 2, 0, 0], np.uint32)
    q = np.array([3, 9, 0xFFFFFFFF, 4], np.uint32)
    found, val = merge_lookup_bitonic(jnp.asarray(keys), jnp.asarray(vals),
                                      jnp.asarray(q))
    assert list(np.asarray(found)) == [True, True, False, False]
    assert list(np.asarray(val)) == [1, 2, 0, 0]


def test_bitonic_agrees_with_merge_lookup_fuzz(rng):
    for _ in range(5):
        nt = int(rng.integers(1, 3000))
        nq = int(rng.integers(1, 3000))
        keys = rng.choice(1 << 16, nt, replace=False).astype(np.uint32)
        vals = rng.integers(1, 10000, nt).astype(np.uint32)
        q = rng.integers(0, 1 << 16, nq).astype(np.uint32)
        sk, sv = sort_table(jnp.asarray(keys), jnp.asarray(vals))
        f0, v0 = merge_lookup(sk, sv, jnp.asarray(q))
        f1, v1 = merge_lookup_bitonic(sk, sv, jnp.asarray(q), val_bits=16)
        assert np.array_equal(np.asarray(f0), np.asarray(f1))
        assert np.array_equal(np.asarray(v0), np.asarray(v1))


def test_bucket_find_engines_agree(rng):
    """Tile-scan and merge engines give identical (found, val) on
    distinct keys (the CPU path uses tiles; force the merge engine by
    calling merge_lookup on the table's sorted copy)."""
    from dwarf_bench_tpu.ops import bucket_hash

    n = 4096
    keys = rng.choice(1 << 18, n, replace=False).astype(np.uint32)
    vals = rng.integers(1, 10000, n).astype(np.uint32)
    nb = bucket_hash.calculate_buckets_count(n)
    t = bucket_hash.build(jnp.asarray(keys), jnp.asarray(vals),
                          num_buckets=nb)
    q = np.concatenate(
        [keys[: n // 2],
         (keys[n // 2 :] + np.uint32(1 << 20))]
    )
    f_tile, v_tile = bucket_hash.find(t, jnp.asarray(q))
    f_m, v_m = merge_lookup(t.sorted_keys, t.sorted_vals, jnp.asarray(q))
    assert np.array_equal(np.asarray(f_tile), np.asarray(f_m))
    got_tile = np.where(np.asarray(f_tile), np.asarray(v_tile), 0)
    got_m = np.where(np.asarray(f_m), np.asarray(v_m), 0)
    assert np.array_equal(got_tile, got_m)


def test_cuckoo_has_engines_agree(rng):
    from dwarf_bench_tpu.ops import cuckoo

    n = 2048
    keys = rng.choice(1 << 18, n, replace=False).astype(np.uint32) + 1
    tbl = cuckoo.build(jnp.asarray(keys), 4 * n, np.uint32(1),
                       np.uint32(2), 10000)
    assert bool(tbl.success)
    q = np.concatenate(
        [keys[: n // 2], keys[n // 2 :] + np.uint32(1 << 20)]
    )
    got = np.asarray(cuckoo.has(tbl, jnp.asarray(q)))  # 2-probe on CPU
    f_m, _ = merge_lookup(
        tbl.keys_sorted, jnp.zeros_like(tbl.keys_sorted), jnp.asarray(q)
    )
    assert np.array_equal(got, np.asarray(f_m))


class TestBitonicNetwork:
    @pytest.mark.parametrize("n", [256, 1024, 16384])
    @pytest.mark.parametrize("split", [0.0, 0.3, 0.5, 0.97])
    def test_merge_sorts_bitonic_input(self, rng, n, split):
        from dwarf_bench_tpu.ops.bitonic import merge_bitonic

        a = int(n * split)
        keys = rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(
            np.uint32)
        asc = np.sort(keys[:a])
        desc = np.sort(keys[a:])[::-1]
        k = np.concatenate([asc, desc])
        aux = rng.permutation(n).astype(np.uint32)  # unique tiebreak
        # aux must make the input monotone under the composite order:
        # re-sort each half by (key, aux)
        half1 = np.lexsort((aux[:a], k[:a]))
        half2 = np.lexsort((aux[a:], k[a:]))[::-1]
        k = np.concatenate([k[:a][half1], k[a:][half2]])
        aux = np.concatenate([aux[:a][half1], aux[a:][half2]])
        payload = rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(
            np.uint32)
        ks, as_, ps = merge_bitonic(
            (jnp.asarray(k), jnp.asarray(aux), jnp.asarray(payload)))
        order = np.lexsort((aux, k))
        assert np.array_equal(np.asarray(ks), k[order])
        assert np.array_equal(np.asarray(as_), aux[order])
        assert np.array_equal(np.asarray(ps), payload[order])

    def test_merge_single_key_column(self, rng):
        from dwarf_bench_tpu.ops.bitonic import merge_bitonic

        n = 4096
        keys = rng.integers(0, 1000, n).astype(np.uint32)  # many ties
        k = np.concatenate([np.sort(keys[: n // 2]),
                            np.sort(keys[n // 2:])[::-1]])
        (ks,) = merge_bitonic((jnp.asarray(k),), num_cmp=1)
        assert np.array_equal(np.asarray(ks), np.sort(k))
