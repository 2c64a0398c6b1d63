"""Primitive-layer tests: compaction, segments, scans."""

import numpy as np
import jax.numpy as jnp

from dwarf_bench_tpu.ops.primitives import (
    compact,
    compact_multi,
    cummax,
    exclusive_cumsum,
    rank_in_segment,
    segment_ids_from_sorted,
    sort_by_key,
)


class TestCompact:
    def test_matches_numpy(self, rng):
        x = rng.integers(1, 100, 1000).astype(np.int32)
        mask = x < 30
        out, cnt = compact(jnp.asarray(x), jnp.asarray(mask))
        exp = x[mask]
        assert int(cnt) == len(exp)
        assert np.array_equal(np.asarray(out)[: len(exp)], exp)

    def test_capacity_truncates(self, rng):
        x = np.arange(100, dtype=np.int32)
        out, cnt = compact(jnp.asarray(x), jnp.ones(100, bool), capacity=10)
        assert int(cnt) == 100  # count reports all matches
        assert np.array_equal(np.asarray(out), np.arange(10))

    def test_empty_mask(self):
        x = np.arange(8, dtype=np.int32)
        out, cnt = compact(jnp.asarray(x), jnp.zeros(8, bool))
        assert int(cnt) == 0

    def test_multi(self, rng):
        a = rng.integers(0, 50, 200).astype(np.int32)
        b = rng.integers(0, 50, 200).astype(np.uint32)
        mask = a % 3 == 0
        (ca, cb), cnt = compact_multi((jnp.asarray(a), jnp.asarray(b)),
                                      jnp.asarray(mask))
        assert int(cnt) == mask.sum()
        assert np.array_equal(np.asarray(ca)[: int(cnt)], a[mask])
        assert np.array_equal(np.asarray(cb)[: int(cnt)], b[mask])


class TestSegments:
    def test_segment_ids(self):
        keys = jnp.asarray([2, 2, 5, 5, 5, 9], jnp.int32)
        assert np.array_equal(
            np.asarray(segment_ids_from_sorted(keys)), [0, 0, 1, 1, 1, 2]
        )

    def test_rank_in_segment(self):
        seg = jnp.asarray([0, 0, 1, 1, 1, 2], jnp.int32)
        assert np.array_equal(
            np.asarray(rank_in_segment(seg)), [0, 1, 0, 1, 2, 0]
        )


class TestScans:
    def test_exclusive(self):
        x = jnp.asarray([1, 2, 3, 4], jnp.int32)
        assert np.array_equal(np.asarray(exclusive_cumsum(x)), [0, 1, 3, 6])

    def test_cummax(self):
        x = jnp.asarray([3, 1, 4, 1, 5], jnp.int32)
        assert np.array_equal(np.asarray(cummax(x)), [3, 3, 4, 4, 5])

    def test_sort_by_key_stable(self, rng):
        k = rng.integers(0, 10, 100).astype(np.int32)
        v = np.arange(100, dtype=np.int32)
        sk, sv = sort_by_key(jnp.asarray(k), jnp.asarray(v))
        order = np.argsort(k, kind="stable")
        assert np.array_equal(np.asarray(sk), k[order])
        assert np.array_equal(np.asarray(sv), v[order])
