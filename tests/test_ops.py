"""Operator-level oracle tests: scan/filter, sort, reduce, groupby, joins."""

import numpy as np
import jax.numpy as jnp
import pytest

from dwarf_bench_tpu.ops import csr_join, groupby, join, reduce as red, scan, sort


class TestFilter:
    @pytest.mark.parametrize("fn", [scan.filter_xla, scan.filter_two_pass])
    @pytest.mark.parametrize("n", [1, 100, 8192, 100_000])
    def test_vs_oracle(self, rng, fn, n):
        x = rng.integers(1, 10000, n, endpoint=True).astype(np.int32)
        out, cnt = fn(jnp.asarray(x))
        exp = scan.filter_oracle(x)
        assert int(cnt) == len(exp)
        assert np.array_equal(np.asarray(out)[: len(exp)], exp)

    @pytest.mark.parametrize("n", [100, 8192, 200_000])
    @pytest.mark.parametrize("thr", [5, 100, 3000])
    def test_sparse_vs_oracle(self, rng, n, thr):
        x = rng.integers(1, 10000, n, endpoint=True).astype(np.int32)
        out, cnt = scan.filter_sparse(jnp.asarray(x), thr)
        exp = scan.filter_oracle(x, thr)
        assert int(cnt) == len(exp)
        assert np.array_equal(np.asarray(out)[: len(exp)], exp)

    def test_sparse_cap_trip_falls_back(self, rng):
        # selectivity 0.9: both caps trip, cond takes the general branch
        x = rng.integers(1, 10, 50_000, endpoint=True).astype(np.int32)
        out, cnt = scan.filter_sparse(jnp.asarray(x), 9)
        exp = scan.filter_oracle(x, 9)
        assert int(cnt) == len(exp)
        assert np.array_equal(np.asarray(out)[: len(exp)], exp)

    def test_sparse_none_and_all(self):
        x = np.full(10_000, 99, np.int32)
        out, cnt = scan.filter_sparse(jnp.asarray(x))
        assert int(cnt) == 0
        x = np.ones(10_000, np.int32)
        out, cnt = scan.filter_sparse(jnp.asarray(x))
        assert int(cnt) == 10_000
        assert (np.asarray(out) == 1).all()

    def test_sparse_caps_ok_host_check(self, rng):
        # benchmark-shaped data passes; dense data fails the caps
        x = rng.integers(1, 10000, 200_000, endpoint=True).astype(np.int32)
        assert scan.sparse_caps_ok(x, 5)
        dense = rng.integers(1, 10, 50_000, endpoint=True).astype(np.int32)
        assert not scan.sparse_caps_ok(dense, 9)
        # wrong dtype and wrapped-threshold guard
        assert not scan.sparse_caps_ok(x.astype(np.int64), 5)
        assert not scan.sparse_caps_ok(x, -(2**31) + 512)

    @pytest.mark.parametrize("thr", [5, 30])
    def test_sparse_assume_sparse_matches_oracle(self, rng, thr):
        # host-verified precondition -> the cond-free pipeline (round-5
        # verdict item 2) must equal the oracle exactly
        x = rng.integers(1, 10000, 200_000, endpoint=True).astype(np.int32)
        assert scan.sparse_caps_ok(x, thr)
        out, cnt = scan.filter_sparse(jnp.asarray(x), thr,
                                      assume_sparse=True)
        exp = scan.filter_oracle(x, thr)
        assert int(cnt) == len(exp)
        assert np.array_equal(np.asarray(out)[: len(exp)], exp)

    def test_sparse_boundary_selectivity(self, rng):
        # right at the single/multi boundary: ~2 matches per 32-chunk
        x = rng.integers(1, 16, 100_000, endpoint=True).astype(np.int32)
        out, cnt = scan.filter_sparse(jnp.asarray(x), 2)
        exp = scan.filter_oracle(x, 2)
        assert int(cnt) == len(exp)
        assert np.array_equal(np.asarray(out)[: len(exp)], exp)

    def test_all_match(self):
        x = np.ones(1000, np.int32)
        out, cnt = scan.filter_two_pass(jnp.asarray(x))
        assert int(cnt) == 1000
        assert (np.asarray(out) == 1).all()

    def test_none_match(self):
        x = np.full(1000, 99, np.int32)
        out, cnt = scan.filter_xla(jnp.asarray(x))
        assert int(cnt) == 0


class TestSortReduce:
    @pytest.mark.parametrize("n", [1, 255, 65536])
    def test_sort(self, rng, n):
        x = rng.integers(1, 10000, n, endpoint=True).astype(np.int32)
        assert np.array_equal(np.asarray(sort.sort_xla(jnp.asarray(x))),
                              sort.sort_oracle(x))

    @pytest.mark.parametrize("n", [1, 255, 8192, 65536, 100_001])
    def test_sort_counting(self, rng, n):
        x = rng.integers(1, 10000, n, endpoint=True).astype(np.int32)
        assert np.array_equal(np.asarray(sort.sort_counting(jnp.asarray(x))),
                              sort.sort_oracle(x))

    def test_sort_counting_negative_and_ties(self, rng):
        x = rng.integers(-5000, 5000, 20_000).astype(np.int32)
        x[:100] = -5000  # heavy tie at the range edge
        assert np.array_equal(np.asarray(sort.sort_counting(jnp.asarray(x))),
                              sort.sort_oracle(x))

    def test_sort_counting_single_value(self):
        x = np.full(4096, 7, np.int32)
        assert (np.asarray(sort.sort_counting(jnp.asarray(x))) == 7).all()

    def test_sort_host_dispatch(self, rng):
        # host-side engine pick (round-5 verdict item 7): correct on every
        # range class; CPU platform always yields sort_auto
        x = rng.integers(1, 10000, 4096, endpoint=True).astype(np.int32)
        eng = sort.sort_host_dispatch(x)
        assert np.array_equal(np.asarray(eng(jnp.asarray(x))),
                              sort.sort_oracle(x))
        assert sort.sort_host_dispatch(x, platform="cpu") is sort.sort_auto
        assert sort.sort_host_dispatch(
            np.empty(0, np.int32)) is sort.sort_auto

    def test_sort_auto_narrow_and_wide(self, rng):
        narrow = rng.integers(1, 10000, 10_000, endpoint=True).astype(np.int32)
        assert np.array_equal(np.asarray(sort.sort_auto(jnp.asarray(narrow))),
                              sort.sort_oracle(narrow))
        wide = rng.integers(-(2**31), 2**31 - 1, 10_000).astype(np.int32)
        assert np.array_equal(np.asarray(sort.sort_auto(jnp.asarray(wide))),
                              sort.sort_oracle(wide))
        # range straddling the 2^14 cutoff (uint32-exact check, no overflow)
        edge = np.array([-(2**31), 2**31 - 1, 0, 5, -3], np.int32)
        assert np.array_equal(np.asarray(sort.sort_auto(jnp.asarray(edge))),
                              sort.sort_oracle(edge))
        just_wide = rng.integers(0, 1 << 14, 10_000, endpoint=True).astype(
            np.int32
        )
        just_wide[0], just_wide[1] = 0, 1 << 14  # diff == 2^14: must fall back
        assert np.array_equal(
            np.asarray(sort.sort_auto(jnp.asarray(just_wide))),
            sort.sort_oracle(just_wide),
        )

    def test_sort_auto_narrow_bins_boundary(self, rng):
        # the 80-bin histogram branch switches at span 80*128 = 10240:
        # pin both sides of the cliff (span 10239 -> hi80, 10240 -> hi128)
        for span in (sort._NARROW_BINS - 1, sort._NARROW_BINS,
                     sort._NARROW_BINS + 1):
            x = rng.integers(0, span, 20_000, endpoint=True).astype(np.int32)
            x[0], x[1] = 0, span  # force the exact span
            assert np.array_equal(
                np.asarray(sort.sort_auto(jnp.asarray(x))),
                sort.sort_oracle(x),
            ), span

    def test_reduce_wraps_like_int32(self, rng):
        x = rng.integers(1, 10000, 1_000_000, endpoint=True).astype(np.int32)
        assert int(np.int32(np.asarray(red.reduce_sum(jnp.asarray(x))))) == \
            red.reduce_oracle(x)


class TestGroupBy:
    @pytest.mark.parametrize("G", [1, 20, 64, 1024])
    def test_all_variants(self, rng, G):
        n = 10_000
        keys = rng.integers(0, G, n).astype(np.uint32)
        vals = rng.integers(1, 10000, n, endpoint=True).astype(np.uint32)
        exp = groupby.groupby_oracle(keys, vals, G)
        for fn in (groupby.groupby_sum_matmul, groupby.groupby_sum_sorted,
                   groupby.groupby_sum_2level,
                   groupby.groupby_sum_scatter):
            got = np.asarray(fn(jnp.asarray(keys), jnp.asarray(vals), G))
            assert np.array_equal(got, exp), fn.__name__

    @pytest.mark.parametrize("G", [256, 65536])
    def test_packed_sort_large_g(self, rng, G):
        n = 100_000
        k = rng.integers(0, G, n).astype(np.uint32)
        v = rng.integers(1, 10000, n).astype(np.uint32)
        got = groupby.groupby_sum_packed_sort(jnp.asarray(k),
                                              jnp.asarray(v), G)
        assert np.array_equal(np.asarray(got),
                              groupby.groupby_oracle(k, v, G))

    @pytest.mark.parametrize("G", [8192, 65536])
    def test_2level_large_g(self, rng, G):
        n = 50_000
        keys = rng.integers(0, G, n).astype(np.uint32)
        vals = rng.integers(1, 10000, n, endpoint=True).astype(np.uint32)
        got = np.asarray(groupby.groupby_sum_2level(
            jnp.asarray(keys), jnp.asarray(vals), G))
        assert np.array_equal(got, groupby.groupby_oracle(keys, vals, G))

    def test_large_group_count_dispatch(self, rng):
        G = 65536
        n = 50_000
        keys = rng.integers(0, G, n).astype(np.uint32)
        vals = rng.integers(1, 10000, n, endpoint=True).astype(np.uint32)
        exp = groupby.groupby_oracle(keys, vals, G)
        got = np.asarray(groupby.groupby_sum(jnp.asarray(keys),
                                             jnp.asarray(vals), G))
        assert np.array_equal(got, exp)

    @pytest.mark.parametrize("executors", [1, 16, 1024])
    def test_local_partition_merge(self, rng, executors):
        G, n = 64, 20_000
        keys = rng.integers(0, G, n).astype(np.uint32)
        vals = rng.integers(1, 10000, n, endpoint=True).astype(np.uint32)
        parts = groupby.groupby_partials(jnp.asarray(keys), jnp.asarray(vals),
                                         G, executors)
        got = np.asarray(groupby.groupby_merge(parts))
        assert np.array_equal(got, groupby.groupby_oracle(keys, vals, G))

    def test_sum_wraps_uint32(self):
        keys = np.zeros(5000, np.uint32)
        vals = np.full(5000, 4_000_000, np.uint32)  # sum 2e10 wraps
        exp = groupby.groupby_oracle(keys, vals, 4)
        got = np.asarray(groupby.groupby_sum_sorted(jnp.asarray(keys),
                                                    jnp.asarray(vals), 4))
        assert np.array_equal(got, exp)


class TestJoin:
    def _data(self, rng, n):
        mk = lambda: rng.choice(np.arange(1, n * 10 + 1), n,
                                replace=False).astype(np.uint32)
        return mk(), mk(), mk(), mk()

    @pytest.mark.parametrize("n", [16, 500])
    def test_hash_join_vs_oracle(self, rng, n):
        ak, av, bk, bv = self._data(rng, n)
        t = join.hash_join_build(jnp.asarray(ak), jnp.asarray(av), 2 * n, 3)
        res = join.hash_join_probe(t, jnp.asarray(bk), jnp.asarray(bv), 3)
        assert np.array_equal(join.join_rows_sorted(res),
                              join.seq_join_oracle(ak, av, bk, bv))

    def test_nested_loop_vs_oracle(self, rng):
        ak, av, bk, bv = self._data(rng, 200)
        res = join.nested_loop_join(jnp.asarray(ak), jnp.asarray(av),
                                    jnp.asarray(bk), jnp.asarray(bv))
        assert np.array_equal(join.join_rows_sorted(res),
                              join.seq_join_oracle(ak, av, bk, bv))


class TestCsrJoin:
    @pytest.mark.parametrize("n,hi", [(100, 20), (3000, 10000)])
    def test_id_sets(self, rng, n, hi):
        A = rng.integers(1, hi, n, endpoint=True).astype(np.uint32)
        B = rng.integers(1, hi, n, endpoint=True).astype(np.uint32)
        d = len(np.unique(A))
        t = csr_join.build(jnp.asarray(A), distinct_cap=d, ht_size=2 * d)
        res = csr_join.probe(t, jnp.asarray(B))
        assert csr_join.join_id_sets(t, res) == csr_join.oracle_id_sets(A, B)

    def test_counts_and_positions_consistent(self, rng):
        n = 1000
        A = rng.integers(1, 50, n, endpoint=True).astype(np.uint32)
        d = len(np.unique(A))
        t = csr_join.build(jnp.asarray(A), distinct_cap=d, ht_size=2 * d)
        counts = np.asarray(t.counts)[:d]
        pos = np.asarray(t.pos)[:d]
        assert counts.sum() == n
        assert np.array_equal(pos, np.concatenate([[0], np.cumsum(counts)[:-1]]))
        # id_buffer grouped by key: each segment holds rows with equal key
        idbuf = np.asarray(t.id_buffer)
        for j in range(d):
            seg_ids = idbuf[pos[j]: pos[j] + counts[j]]
            assert len(set(A[seg_ids])) == 1


class TestDenseCsrJoin:
    @pytest.mark.parametrize("n,lo,hi", [(100, 1, 20), (3000, 1, 10000),
                                         (5000, 90000, 100000)])
    def test_id_sets(self, rng, n, lo, hi):
        A = rng.integers(lo, hi, n, endpoint=True).astype(np.uint32)
        B = rng.integers(lo, hi, n, endpoint=True).astype(np.uint32)
        assert csr_join.dense_applicable(A, B)
        t = csr_join.build_dense(jnp.asarray(A))
        res = csr_join.probe_dense(t, jnp.asarray(B))
        assert csr_join.join_id_sets(t, res) == csr_join.oracle_id_sets(A, B)
        assert int(t.num_distinct) == len(np.unique(A))

    def test_probe_misses_and_empty_padding(self, rng):
        A = np.concatenate(
            [rng.integers(100, 200, 500).astype(np.uint32),
             np.full(12, 0xFFFFFFFF, np.uint32)]  # EMPTY padding rows
        )
        B = rng.integers(1, 400, 300).astype(np.uint32)  # misses both sides
        t = csr_join.build_dense(jnp.asarray(A))
        res = csr_join.probe_dense(t, jnp.asarray(B))
        assert csr_join.join_id_sets(t, res) == csr_join.oracle_id_sets(
            A[:500], B
        )

    def test_heavy_key_unpacked_fallback(self, rng):
        # one key holds 5000 rows (count >= 2^12): packed_ok is False and
        # the probe must take the two-gather path with identical results
        A = np.concatenate(
            [np.full(5000, 7, np.uint32),
             rng.integers(1, 100, 1000).astype(np.uint32)]
        )
        B = rng.integers(1, 100, 500).astype(np.uint32)
        t = csr_join.build_dense(jnp.asarray(A))
        assert not bool(t.packed_ok) and not bool(t.packed3_ok)
        res = csr_join.probe_dense(t, jnp.asarray(B))
        assert csr_join.join_id_sets(t, res) == csr_join.oracle_id_sets(A, B)

    def test_mid_count_packed4_fallback(self, rng):
        # counts in [2^10, 2^12): the 3-plane layout is out (cnt >= 1024)
        # but the absolute 4-plane packing still applies
        A = np.concatenate(
            [np.full(2000, 42, np.uint32),
             rng.integers(1, 100, 1000).astype(np.uint32)]
        )
        B = rng.integers(1, 100, 500).astype(np.uint32)
        t = csr_join.build_dense(jnp.asarray(A))
        assert bool(t.packed_ok) and not bool(t.packed3_ok)
        res = csr_join.probe_dense(t, jnp.asarray(B))
        assert csr_join.join_id_sets(t, res) == csr_join.oracle_id_sets(A, B)

    def test_rel_overflow_packed4_fallback(self, rng):
        # 20000 rows over one 128-key bucket: every count < 1024 but the
        # bucket-relative offsets exceed 2^14, so packed3_ok must trip
        A = rng.integers(0, 128, 20000).astype(np.uint32) + 1000
        B = rng.integers(900, 1300, 500).astype(np.uint32)
        t = csr_join.build_dense(jnp.asarray(A))
        assert not bool(t.packed3_ok) and bool(t.packed_ok)
        assert int(np.asarray(t.counts).max()) < 1024
        res = csr_join.probe_dense(t, jnp.asarray(B))
        assert csr_join.join_id_sets(t, res) == csr_join.oracle_id_sets(A, B)

    def test_benchmark_shape_uses_rel_path(self, rng):
        # the headline config ([1, 10000] uniform) must qualify for the
        # 3-plane bucket-relative probe
        A = rng.integers(1, 10000, 1 << 15, endpoint=True).astype(np.uint32)
        B = rng.integers(1, 10000, 1 << 14, endpoint=True).astype(np.uint32)
        t = csr_join.build_dense(jnp.asarray(A))
        assert bool(t.packed3_ok)
        res = csr_join.probe_dense(t, jnp.asarray(B))
        assert csr_join.join_id_sets(t, res) == csr_join.oracle_id_sets(A, B)

    def test_dense_applicable(self, rng):
        assert not csr_join.dense_applicable(
            np.array([1], np.uint32), np.array([1 << 20], np.uint32)
        )
        assert csr_join.dense_applicable(
            np.array([0xFFFFFFFF], np.uint32), np.array([5], np.uint32)
        )


class TestJoinHelpers:
    """Host-side helpers — the analog of tests/join_tests.cpp (seq_join,
    equality, row/col-store conversions)."""

    def test_row_col_roundtrip(self, rng):
        k = rng.integers(1, 100, 50).astype(np.uint32)
        v1 = rng.integers(1, 100, 50).astype(np.uint32)
        v2 = rng.integers(1, 100, 50).astype(np.uint32)
        rows = join.columns_to_rows(k, v1, v2)
        rk, rv1, rv2 = join.rows_to_columns(rows, 3)
        assert np.array_equal(rk, k)
        assert np.array_equal(rv1, v1)
        assert np.array_equal(rv2, v2)

    def test_seq_join_counts(self):
        ak = np.array([1, 2, 2, 3], np.uint32)
        av = np.array([10, 20, 21, 30], np.uint32)
        bk = np.array([2, 2, 4], np.uint32)
        bv = np.array([200, 201, 400], np.uint32)
        out = join.seq_join_oracle(ak, av, bk, bv)
        assert out.shape == (4, 3)  # 2 a-rows × 2 b-rows for key 2
        assert set(out[:, 0].tolist()) == {2}

    def test_empty_join(self):
        out = join.seq_join_oracle(
            np.array([1], np.uint32), np.array([1], np.uint32),
            np.array([9], np.uint32), np.array([9], np.uint32),
        )
        assert out.shape[0] == 0


class TestReducePallas:
    @pytest.mark.parametrize("n", [1, 1000, 524_288, 1_000_001])
    def test_pallas_matches_oracle(self, rng, n):
        x = rng.integers(-(2**30), 2**30, n).astype(np.int32)
        got = int(np.asarray(red.reduce_sum_pallas(jnp.asarray(x),
                                                   interpret=True)))
        assert np.int32(got) == red.reduce_oracle(x)


class TestProbeMergeBitonic:
    def test_matches_probe_wide_keys(self, rng):
        # wide keys (dense path inapplicable); CPU takes the probe_merge
        # fallback — contract equality with the hash-chain probe
        n = 5000
        pool = rng.choice(1 << 30, 3000, replace=False).astype(np.uint32)
        a = rng.choice(pool, n).astype(np.uint32)  # duplicates: 1-to-many
        b = np.concatenate([rng.permutation(a)[: n // 2],
                            rng.integers(1 << 30, 1 << 31, n - n // 2)
                            .astype(np.uint32)])
        t = csr_join.build(jnp.asarray(a), 4096, 8192)
        r0 = csr_join.probe(t, jnp.asarray(b))
        r1 = csr_join.probe_merge_bitonic(t, jnp.asarray(b))
        assert np.array_equal(np.asarray(r0.found), np.asarray(r1.found))
        assert np.array_equal(np.asarray(r0.pos), np.asarray(r1.pos))
        assert np.array_equal(np.asarray(r0.counts),
                              np.asarray(r1.counts))
