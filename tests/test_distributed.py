"""Distributed-layer tests on a virtual 8-device CPU mesh
(xla_force_host_platform_device_count, set in conftest.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dwarf_bench_tpu.ops.groupby import groupby_oracle
from dwarf_bench_tpu.parallel import (
    dist_csr_join,
    dist_groupby_dense,
    dist_groupby_shuffle,
    make_mesh,
    shard_rows,
)

N_DEV = 8


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= N_DEV, "conftest must fake 8 devices"
    return make_mesh(N_DEV)


class TestDistGroupBy:
    def test_dense_matches_oracle(self, mesh, rng):
        G, n = 64, 8 * 4096
        keys = rng.integers(0, G, n).astype(np.uint32)
        vals = rng.integers(1, 10000, n, endpoint=True).astype(np.uint32)
        fn = dist_groupby_dense(mesh, G)
        dk, dv = shard_rows(mesh, keys, vals)
        out = np.asarray(fn(dk, dv))
        assert np.array_equal(out, groupby_oracle(keys, vals, G))

    def test_shuffle_matches_oracle(self, mesh, rng):
        G, n = 128, 8 * 2048
        keys = rng.integers(0, G, n).astype(np.uint32)
        vals = rng.integers(1, 10000, n, endpoint=True).astype(np.uint32)
        cap = (n // N_DEV // N_DEV) * 4  # generous slack
        fn = dist_groupby_shuffle(mesh, G, cap)
        dk, dv = shard_rows(mesh, keys, vals)
        out, overflow = fn(dk, dv)
        assert int(np.sum(np.asarray(overflow))) == 0
        # per-chip partials sum to the dense result (each key owned by
        # exactly one chip)
        merged = np.sum(np.asarray(out, dtype=np.uint64), axis=0).astype(
            np.uint32
        )
        assert np.array_equal(merged, groupby_oracle(keys, vals, G))
        # ownership is disjoint: a nonzero group appears on exactly one chip
        nonzero_chips = (np.asarray(out) != 0).sum(axis=0)
        assert nonzero_chips.max() <= 1


class TestDistJoin:
    def test_total_matches_oracle(self, mesh, rng):
        n = 8 * 1024
        per_chip = n // N_DEV
        A = rng.integers(1, 2000, n, endpoint=True).astype(np.uint32)
        B = rng.integers(1, 2000, n, endpoint=True).astype(np.uint32)
        # oracle: total matching pairs
        from collections import Counter

        ca, cb = Counter(A.tolist()), Counter(B.tolist())
        expected_total = sum(ca[k] * cb.get(k, 0) for k in ca)

        cap = (per_chip // N_DEV) * 4
        fn = dist_csr_join(
            mesh,
            rows_per_chip=per_chip,
            distinct_cap=N_DEV * cap,
            ht_size=2 * N_DEV * cap,
            shuffle_capacity=cap,
        )
        da, db = shard_rows(mesh, A, B)
        counts, local_totals, total, overflow = fn(da, db)
        assert int(np.sum(np.asarray(overflow))) == 0
        assert int(np.asarray(total).ravel()[0]) == expected_total
        assert int(np.sum(np.asarray(local_totals))) == expected_total

        # dense engine (global key span < 2^14, host-checked like the dwarf)
        from dwarf_bench_tpu.ops.csr_join import dense_applicable

        assert dense_applicable(A, B)
        fn_dense = dist_csr_join(
            mesh,
            rows_per_chip=per_chip,
            distinct_cap=N_DEV * cap,
            ht_size=2 * N_DEV * cap,
            shuffle_capacity=cap,
            dense=True,
        )
        _, _, total_d, overflow_d = fn_dense(da, db)
        assert int(np.sum(np.asarray(overflow_d))) == 0
        assert int(np.asarray(total_d).ravel()[0]) == expected_total

    @pytest.mark.parametrize("dense", [False, True])
    def test_ring_join_matches_oracle(self, mesh, rng, dense):
        from dwarf_bench_tpu.parallel import dist_csr_join_ring

        n = 8 * 512
        per_chip = n // N_DEV
        A = rng.integers(1, 800, n, endpoint=True).astype(np.uint32)
        B = rng.integers(1, 800, n, endpoint=True).astype(np.uint32)
        from collections import Counter

        ca, cb = Counter(A.tolist()), Counter(B.tolist())
        expected_total = sum(ca[k] * cb.get(k, 0) for k in ca)
        fn = dist_csr_join_ring(
            mesh, rows_per_chip=per_chip, distinct_cap=per_chip,
            ht_size=2 * per_chip + 2, dense=dense,
        )
        da, db = shard_rows(mesh, A, B)
        counts, local_totals, total = fn(da, db)
        assert int(np.asarray(total).ravel()[0]) == expected_total
        # per-B-row counts are GLOBAL and in original row order
        exp_counts = np.array([ca.get(int(k), 0) for k in B], np.int32)
        assert np.array_equal(
            np.asarray(counts).reshape(-1), exp_counts
        )

    def test_ring_join_extreme_skew(self, mesh, rng):
        """One key holds half of A: the ring join needs no capacity at all
        (the skew-breaker design — no hash shuffle, only rotation)."""
        from dwarf_bench_tpu.parallel import dist_csr_join_ring

        n = 8 * 512
        per_chip = n // N_DEV
        A = rng.integers(1, 100, n, endpoint=True).astype(np.uint32)
        A[: n // 2] = 7
        B = rng.integers(1, 100, n, endpoint=True).astype(np.uint32)
        from collections import Counter

        ca, cb = Counter(A.tolist()), Counter(B.tolist())
        expected_total = sum(ca[k] * cb.get(k, 0) for k in ca)
        fn = dist_csr_join_ring(
            mesh, rows_per_chip=per_chip, distinct_cap=per_chip,
            ht_size=2 * per_chip + 2,
        )
        da, db = shard_rows(mesh, A, B)
        _, _, total = fn(da, db)
        assert int(np.asarray(total).ravel()[0]) == expected_total


class TestShuffle:
    def test_partition_preserves_rows(self, mesh, rng):
        """Every row arrives at the chip that owns its key hash."""
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        from dwarf_bench_tpu.parallel.shuffle import (
            SHUFFLE_SEED,
            partition_for_shuffle,
        )
        from dwarf_bench_tpu.ops.hashing import murmur3_32
        from dwarf_bench_tpu.ops.hashtable import EMPTY

        n = 8 * 512
        keys = rng.integers(1, 100000, n).astype(np.uint32)
        vals = np.arange(n, dtype=np.uint32)
        cap = (n // N_DEV // N_DEV) * 4

        def local(k, v):
            rk, rv, rc, ov = partition_for_shuffle(k, v, N_DEV, cap, "x")
            return rk.reshape(-1)[None], rv.reshape(-1)[None], ov.reshape(1)

        fn = jax.jit(
            shard_map(
                local, mesh=mesh, in_specs=(P("x"), P("x")),
                out_specs=(P("x"), P("x"), P("x")),
            )
        )
        dk, dv = shard_rows(mesh, keys, vals)
        rk, rv, ov = fn(dk, dv)
        assert int(np.sum(np.asarray(ov))) == 0
        rk = np.asarray(rk)  # (ndev, ndev*cap)
        rv = np.asarray(rv)
        # multiset of delivered (key, val) pairs == sent pairs
        mask = rk.reshape(-1) != np.uint32(EMPTY)
        delivered = sorted(zip(rk.reshape(-1)[mask], rv.reshape(-1)[mask]))
        assert delivered == sorted(zip(keys, vals))
        # destination correctness
        dest = np.asarray(murmur3_32(jnp.asarray(keys), SHUFFLE_SEED)) % N_DEV
        for chip in range(N_DEV):
            chip_keys = rk[chip][rk[chip] != np.uint32(EMPTY)]
            expect = np.sort(keys[dest == chip])
            assert np.array_equal(np.sort(chip_keys), expect)


class TestDistFilter:
    def test_matches_local(self, mesh, rng):
        from dwarf_bench_tpu.parallel import dist_filter

        n = 8 * 2048
        x = rng.integers(1, 10000, n, endpoint=True).astype(np.int32)
        cap = n // 8
        fn = dist_filter(mesh, 5000, cap)
        dx = shard_rows(mesh, x)
        outs, counts, offsets, total = fn(dx)
        outs, counts, offsets = map(np.asarray, (outs, counts, offsets))
        exp_total = int((x < 5000).sum())
        assert int(np.asarray(total).ravel()[0]) == exp_total
        # concatenating per-chip prefixes in offset order reproduces copy_if
        got = np.concatenate(
            [outs[c][: counts[c]] for c in range(8)]
        )
        assert np.array_equal(got, x[x < 5000])
        assert np.array_equal(offsets, np.cumsum(counts) - counts)


class TestDistSort:
    def test_globally_sorted(self, mesh, rng):
        from dwarf_bench_tpu.parallel import dist_sort

        n = 8 * 2048
        x = rng.integers(1, 100000, n).astype(np.uint32)
        cap = (n // 8) * 2  # slack for partition imbalance
        fn = dist_sort(mesh, cap)
        dx = shard_rows(mesh, x)
        out, valid, overflow = fn(dx)
        out, valid = np.asarray(out), np.asarray(valid)
        assert int(np.sum(np.asarray(overflow))) == 0
        got = np.concatenate([out[c][: valid[c]] for c in range(8)])
        assert np.array_equal(got, np.sort(x))


class TestSkewJoin:
    def _expected(self, A, B):
        from collections import Counter

        ca, cb = Counter(A.tolist()), Counter(B.tolist())
        return sum(ca[k] * cb.get(k, 0) for k in ca)

    def test_heavy_skew_handled(self, mesh, rng):
        """50% of rows share one key: the plain hash shuffle overflows its
        fixed-capacity slots; the skew-aware variant broadcasts the heavy
        key's build rows and still matches the oracle exactly."""
        from dwarf_bench_tpu.parallel import dist_csr_join, dist_csr_join_skew

        per_chip = 1024
        n = N_DEV * per_chip
        A = rng.integers(1, 2000, n, endpoint=True).astype(np.uint32)
        B = rng.integers(1, 2000, n, endpoint=True).astype(np.uint32)
        A[rng.random(n) < 0.5] = 777
        B[rng.random(n) < 0.5] = 777
        cap = (per_chip // N_DEV) * 4
        da, db = shard_rows(mesh, A, B)

        plain = dist_csr_join(mesh, per_chip, N_DEV * cap, 2 * N_DEV * cap, cap)
        _, _, _, ov = plain(da, db)
        assert int(np.sum(np.asarray(ov))) > 0  # hash shuffle breaks

        skew = dist_csr_join_skew(mesh, per_chip, N_DEV * cap,
                                  2 * N_DEV * cap, cap)
        _, _, total, ov2 = skew(da, db)
        assert int(np.sum(np.asarray(ov2))) == 0
        assert int(np.asarray(total).ravel()[0]) == self._expected(A, B)

    def test_uniform_data_no_heavy_keys(self, mesh, rng):
        """Without skew the heavy list is empty and results still match."""
        from dwarf_bench_tpu.parallel import dist_csr_join_skew

        per_chip = 512
        n = N_DEV * per_chip
        A = rng.integers(1, 50000, n, endpoint=True).astype(np.uint32)
        B = rng.integers(1, 50000, n, endpoint=True).astype(np.uint32)
        cap = (per_chip // N_DEV) * 4
        da, db = shard_rows(mesh, A, B)
        skew = dist_csr_join_skew(mesh, per_chip, N_DEV * cap,
                                  2 * N_DEV * cap, cap)
        _, _, total, ov = skew(da, db)
        assert int(np.sum(np.asarray(ov))) == 0
        assert int(np.asarray(total).ravel()[0]) == self._expected(A, B)
