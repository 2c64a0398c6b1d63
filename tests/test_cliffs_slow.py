"""Slow-tier fuzz of the engines' size/shape dispatch cliffs AT the sizes
where the benchmark actually runs (VERDICT r1 #10): every ``lax.cond``
branch and cap formula is pinned at benchmark scale, not just on small
synthetic inputs.

Cliffs covered:
  * filter_sparse cap trips at n = 2^22: thresholds chosen to put the
    single-match-chunk count under / around / far over ``cap_single``
    (the sparse fast path vs the general butterfly fallback), plus the
    out-of-window encoding.
  * dense CSR join packed / packed3 / two-gather probe engines around
    n = 2^20 (packed_ok), rel >= 2^14 at n = 2^21, and count >= 2^10 /
    2^12 under skew (ops/csr_join.py:244-257).
  * sort_auto at value span 2^14 ± 1 with n = 2^22 (counting sort vs
    lax.sort branches).
"""

from __future__ import annotations

import numpy as np
import pytest

pytestmark = pytest.mark.slow


class TestFilterSparseCliffs:
    N = 1 << 22

    @pytest.mark.parametrize(
        "threshold",
        [
            5,  # benchmark selectivity 4e-4: deep in the sparse path
            40,  # singles well under cap_single
            80,  # singles around cap_single (expected ~0.5/chunk)
            200,  # caps tripped -> general branch
            5000,  # selectivity 0.5 -> general branch
            600,  # >512: many matches fall OUTSIDE the 255-wide window
        ],
    )
    def test_exact_across_cap_cliffs(self, rng, threshold):
        from dwarf_bench_tpu.ops.scan import filter_oracle, filter_sparse

        x = rng.integers(1, 10000, self.N, endpoint=True).astype(np.int32)
        out, count = filter_sparse(x, threshold)
        expected = filter_oracle(x, threshold)
        assert int(count) == len(expected)
        assert np.array_equal(np.asarray(out)[: int(count)], expected)

    def test_negative_threshold_guard(self, rng):
        """thresholds near INT32_MIN route away from the window encoding
        (chunk_stats wrap guard) and still produce exact output."""
        from dwarf_bench_tpu.ops.scan import filter_oracle, filter_sparse

        x = rng.integers(-(2**31), 2**31 - 1, self.N).astype(np.int32)
        thr = -(2**31) + 100
        out, count = filter_sparse(x, thr)
        expected = filter_oracle(x, thr)
        assert int(count) == len(expected)
        assert np.array_equal(np.asarray(out)[: int(count)], expected)


class TestDenseJoinEngineCliffs:
    def _check_probe(self, A, B, table, res):
        """Exact probe check vs the host oracle: counts = per-key histogram
        of A at the query key; pos = #A keys strictly below (both engines
        construct pos exactly so)."""
        from dwarf_bench_tpu.ops import csr_join

        ak = np.sort(A.astype(np.int64))
        lo = np.searchsorted(ak, B.astype(np.int64), side="left")
        hi = np.searchsorted(ak, B.astype(np.int64), side="right")
        exp_cnt = hi - lo
        found = np.asarray(res.found)
        assert np.array_equal(found, exp_cnt > 0)
        m = found
        assert np.array_equal(np.asarray(res.counts)[m], exp_cnt[m])
        assert np.array_equal(np.asarray(res.pos)[m].astype(np.int64), lo[m])
        # id_buffer grouped by key + a permutation of [0, n)
        idb = np.asarray(table.id_buffer).astype(np.int64)
        assert np.array_equal(np.sort(idb), np.arange(len(A)))
        gk = A.astype(np.uint32)[idb]
        assert np.all(gk[1:] >= gk[:-1])

    def _run(self, A, B):
        from dwarf_bench_tpu.ops import csr_join

        assert csr_join.dense_applicable(A, B)
        table = csr_join.build_dense(A)
        res = csr_join.probe_dense(table, B)
        return table, res

    def test_packed3_path_at_2p20(self, rng):
        """Uniform [1, 10000] at exactly n = 2^20: the bucket-relative
        3-plane engine is live (packed3_ok), and results are exact."""
        n = 1 << 20
        A = rng.integers(1, 10000, n, endpoint=True).astype(np.uint32)
        B = rng.integers(1, 10000, n, endpoint=True).astype(np.uint32)
        table, res = self._run(A, B)
        assert bool(table.packed3_ok)
        assert bool(table.packed_ok)
        self._check_probe(A, B, table, res)

    def test_two_gather_path_at_2p21(self, rng):
        """n = 2^21 uniform: bucket-relative offsets exceed 2^14 and
        pos << 12 exceeds the packed layout -> the two-gather fallback is
        the live branch; still exact."""
        n = 1 << 21
        A = rng.integers(1, 10000, n, endpoint=True).astype(np.uint32)
        B = rng.integers(1, 10000, n, endpoint=True).astype(np.uint32)
        table, res = self._run(A, B)
        assert not bool(table.packed_ok)  # n > 2^20
        assert not bool(table.packed3_ok)  # rel >= 2^14
        self._check_probe(A, B, table, res)

    def test_skewed_counts_disable_packing(self, rng):
        """One key holding > 4096 rows at n = 2^20 exceeds both count
        fields (10 and 12 bits) -> two-gather branch; exact."""
        n = 1 << 20
        A = rng.integers(1, 10000, n, endpoint=True).astype(np.uint32)
        A[: 5000] = 777
        B = rng.integers(1, 10000, n, endpoint=True).astype(np.uint32)
        table, res = self._run(A, B)
        assert not bool(table.packed_ok)
        assert not bool(table.packed3_ok)
        self._check_probe(A, B, table, res)

    def test_count_boundary_1024(self, rng):
        """counts crossing 2^10 kill packed3 but keep packed (cnt < 2^12)
        at n <= 2^20."""
        n = 1 << 20
        A = rng.integers(1, 10000, n, endpoint=True).astype(np.uint32)
        A[:2000] = 4242  # count ~2000: >= 2^10, < 2^12
        B = rng.integers(1, 10000, n, endpoint=True).astype(np.uint32)
        table, res = self._run(A, B)
        assert not bool(table.packed3_ok)
        assert bool(table.packed_ok)
        self._check_probe(A, B, table, res)


class TestSortAutoSpanCliff:
    N = 1 << 22

    def test_narrow_span_counting_branch(self, rng):
        from dwarf_bench_tpu.ops.sort import sort_auto

        base = 123456
        x = (
            base + rng.integers(0, (1 << 14) - 1, self.N)
        ).astype(np.int32)  # span 2^14 - 1: counting branch
        out = np.asarray(sort_auto(x))
        assert np.array_equal(out, np.sort(x))

    def test_wide_span_xla_branch(self, rng):
        from dwarf_bench_tpu.ops.sort import sort_auto

        base = 123456
        x = (base + rng.integers(0, (1 << 14) - 1, self.N)).astype(np.int32)
        x[0] = base - 1  # span 2^14: one past the counting bound
        x[1] = base + (1 << 14) - 1
        out = np.asarray(sort_auto(x))
        assert np.array_equal(out, np.sort(x))

    def test_negative_wrap_span(self, rng):
        """min/max straddling int32 sign: the uint32 span math must not
        pick the counting branch."""
        from dwarf_bench_tpu.ops.sort import sort_auto

        x = rng.integers(-(2**31), 2**31 - 1, self.N).astype(np.int32)
        out = np.asarray(sort_auto(x))
        assert np.array_equal(out, np.sort(x))
