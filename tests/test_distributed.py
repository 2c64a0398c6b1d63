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


class TestMultiColumnShuffle:
    def test_tuple_payloads_preserved(self, mesh, rng):
        """N payload columns ride the exchange with their keys (the 64-bit
        payload path: two uint32 columns)."""
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        from dwarf_bench_tpu.ops.hashtable import EMPTY
        from dwarf_bench_tpu.parallel.shuffle import partition_for_shuffle

        n = 8 * 512
        keys = rng.integers(1, 100000, n).astype(np.uint32)
        v64 = rng.integers(0, 2**64 - 1, n, dtype=np.uint64)
        lo = (v64 & 0xFFFFFFFF).astype(np.uint32)
        hi = (v64 >> 32).astype(np.uint32)
        ids = np.arange(n, dtype=np.uint32)
        cap = (n // N_DEV // N_DEV) * 4

        def local(k, a, b, c):
            rk, (ra, rb, rc), _, ov = partition_for_shuffle(
                k, (a, b, c), N_DEV, cap, "x"
            )
            return (
                rk.reshape(-1)[None], ra.reshape(-1)[None],
                rb.reshape(-1)[None], rc.reshape(-1)[None], ov.reshape(1),
            )

        fn = jax.jit(
            shard_map(
                local, mesh=mesh, in_specs=(P("x"),) * 4,
                out_specs=(P("x"),) * 5,
            )
        )
        rk, ra, rb, rc = map(
            np.asarray, fn(*shard_rows(mesh, keys, lo, hi, ids))[:4]
        )
        m = rk.reshape(-1) != np.uint32(EMPTY)
        got = sorted(
            zip(
                rk.reshape(-1)[m],
                (rb.reshape(-1)[m].astype(np.uint64) << 32)
                | ra.reshape(-1)[m],
                rc.reshape(-1)[m],
            )
        )
        assert got == sorted(zip(keys, v64, ids))


class TestDistJoinRows:
    def test_rows_match_seq_join_oracle(self, mesh, rng):
        """The distributed 1:1 join's materialized row set equals the
        seq_join oracle order-insensitively (join_helpers.hpp:86-125)."""
        from dwarf_bench_tpu.common.datagen import make_unique_random
        from dwarf_bench_tpu.ops.join import seq_join_oracle
        from dwarf_bench_tpu.parallel import dist_hash_join_rows

        n = 8 * 512
        a_keys = make_unique_random(n, seed=11)
        a_vals = make_unique_random(n, seed=12)
        b_keys = make_unique_random(n, seed=13)
        b_vals = make_unique_random(n, seed=14)
        expected = seq_join_oracle(a_keys, a_vals, b_keys, b_vals)

        cap = (n // N_DEV // N_DEV) * 4
        fn = dist_hash_join_rows(
            mesh, shuffle_capacity=cap, ht_size=2 * N_DEV * cap
        )
        outs = fn(*shard_rows(mesh, a_keys, a_vals, b_keys, b_vals))
        k, a, b, cnt, ov = map(np.asarray, outs)
        assert int(ov.sum()) == 0
        rows = []
        for c in range(N_DEV):
            m = int(cnt[c])
            rows += list(zip(k[c][:m], a[c][:m], b[c][:m]))
        got = np.array(sorted(rows), dtype=np.uint64).reshape(-1, 3)
        assert np.array_equal(got, expected)


class TestDist2D:
    """2-D (dcn, ici) mesh variants on the same 8 virtual devices (2x4)."""

    @pytest.fixture(scope="class")
    def mesh2d(self):
        from dwarf_bench_tpu.parallel import make_mesh_2d

        assert len(jax.devices()) >= N_DEV
        return make_mesh_2d(2, 4)

    def _expected(self, A, B):
        from collections import Counter

        ca, cb = Counter(A.tolist()), Counter(B.tolist())
        return sum(ca[k] * cb.get(k, 0) for k in ca)

    def test_shuffle_2d_two_hop_delivery(self, mesh2d, rng):
        """Every row reaches the chip owning its key hash after the
        hierarchical ICI-then-DCN exchange."""
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        from dwarf_bench_tpu.ops.hashing import murmur3_32
        from dwarf_bench_tpu.ops.hashtable import EMPTY
        from dwarf_bench_tpu.parallel.shuffle import (
            SHUFFLE_SEED,
            partition_for_shuffle_2d,
        )

        n = 8 * 512
        keys = rng.integers(1, 100000, n).astype(np.uint32)
        vals = np.arange(n, dtype=np.uint32)
        cap1 = (n // 8 // 4) * 4
        cap2 = (n // 8 // 2) * 4

        def local(k, v):
            rk, rv, _, ov = partition_for_shuffle_2d(
                k, v, 2, 4, cap1, cap2, "dcn", "ici"
            )
            return (
                rk.reshape(-1)[None, None],
                rv.reshape(-1)[None, None],
                ov.reshape(1, 1),
            )

        sh = P(("dcn", "ici"))
        fn = jax.jit(
            shard_map(
                local, mesh=mesh2d, in_specs=(sh, sh),
                out_specs=(P("dcn", "ici"),) * 3,
            )
        )
        dk, dv = shard_rows(mesh2d, keys, vals)
        rk, rv, ov = fn(dk, dv)
        assert int(np.sum(np.asarray(ov))) == 0
        rk = np.asarray(rk).reshape(8, -1)  # chip-linear rows
        rv = np.asarray(rv).reshape(8, -1)
        m = rk.reshape(-1) != np.uint32(EMPTY)
        got = sorted(zip(rk.reshape(-1)[m], rv.reshape(-1)[m]))
        assert got == sorted(zip(keys, vals))
        dest = np.asarray(murmur3_32(jnp.asarray(keys), SHUFFLE_SEED)) % 8
        for chip in range(8):
            chip_keys = rk[chip][rk[chip] != np.uint32(EMPTY)]
            assert np.array_equal(
                np.sort(chip_keys), np.sort(keys[dest == chip])
            )

    @pytest.mark.parametrize("dense", [False, True])
    def test_join_2d_matches_oracle(self, mesh2d, rng, dense):
        from dwarf_bench_tpu.parallel import dist_csr_join_2d

        n = 8 * 1024
        per_chip = n // 8
        A = rng.integers(1, 2000, n, endpoint=True).astype(np.uint32)
        B = rng.integers(1, 2000, n, endpoint=True).astype(np.uint32)
        cap1 = (per_chip // 4) * 2
        cap2 = (per_chip // 2) * 2
        fn = dist_csr_join_2d(
            mesh2d, rows_per_chip=per_chip, distinct_cap=2 * cap2,
            ht_size=4 * cap2 + 2, cap_ici=cap1, cap_dcn=cap2, dense=dense,
        )
        da, db = shard_rows(mesh2d, A, B)
        counts, local_totals, total, ov = fn(da, db)
        assert int(np.sum(np.asarray(ov))) == 0
        assert int(np.asarray(total).ravel()[0]) == self._expected(A, B)

    def test_ring_2d_matches_oracle(self, mesh2d, rng):
        from collections import Counter

        from dwarf_bench_tpu.parallel import dist_csr_join_ring_2d

        n = 8 * 512
        per_chip = n // 8
        A = rng.integers(1, 800, n, endpoint=True).astype(np.uint32)
        B = rng.integers(1, 800, n, endpoint=True).astype(np.uint32)
        fn = dist_csr_join_ring_2d(
            mesh2d, rows_per_chip=per_chip, distinct_cap=per_chip,
            ht_size=2 * per_chip + 2,
        )
        da, db = shard_rows(mesh2d, A, B)
        counts, local_totals, total = fn(da, db)
        assert int(np.asarray(total).ravel()[0]) == self._expected(A, B)
        ca = Counter(A.tolist())
        exp_counts = np.array([ca.get(int(k), 0) for k in B], np.int32)
        assert np.array_equal(np.asarray(counts).reshape(-1), exp_counts)


class TestSkewJoinZipf:
    """Adversarial Zipf-distributed keys stress the skew thresholds
    (dist_join.dist_csr_join_skew: heavy detection + broadcast split)."""

    def _expected(self, A, B):
        from collections import Counter

        ca, cb = Counter(A.tolist()), Counter(B.tolist())
        return sum(ca[k] * cb.get(k, 0) for k in ca)

    def test_zipf_keys_exact(self, mesh, rng):
        from dwarf_bench_tpu.parallel import dist_csr_join_skew

        per_chip = 1024
        n = N_DEV * per_chip
        # Zipf(1.3) clipped: a realistic heavy-tail key column — a handful
        # of keys hold a large share of rows, many mid-weight keys follow
        A = np.minimum(rng.zipf(1.3, n), 1 << 20).astype(np.uint32)
        B = np.minimum(rng.zipf(1.3, n), 1 << 20).astype(np.uint32)
        cap = (per_chip // N_DEV) * 4
        fn = dist_csr_join_skew(
            mesh, per_chip, N_DEV * cap, 2 * N_DEV * cap, cap,
            heavy_cap=32, candidates_per_chip=16,
        )
        da, db = shard_rows(mesh, A, B)
        light, heavy, total, ov = fn(da, db)
        assert int(np.sum(np.asarray(ov))) == 0
        assert int(np.asarray(total).ravel()[0]) == self._expected(A, B)

    def test_threshold_boundary(self, mesh, rng):
        """A key just ABOVE the heavy threshold (shuffle_capacity // 2)
        rides the broadcast path; one just below rides the shuffle — both
        exact, no overflow. Pins the dist_join threshold semantics."""
        from dwarf_bench_tpu.parallel import dist_csr_join_skew

        per_chip = 1024
        n = N_DEV * per_chip
        cap = (per_chip // N_DEV) * 4  # 512 → threshold 256
        thr = cap // 2
        A = rng.integers(1, 5000, n, endpoint=True).astype(np.uint32)
        B = rng.integers(1, 5000, n, endpoint=True).astype(np.uint32)
        # exact global counts: X = thr + 8 (heavy), Y = thr - 8 (light)
        X, Y = np.uint32(100001), np.uint32(100002)
        A[: thr + 8] = X
        A[thr + 8 : 2 * thr] = Y
        fn = dist_csr_join_skew(
            mesh, per_chip, N_DEV * cap, 2 * N_DEV * cap, cap
        )
        da, db = shard_rows(mesh, A, B)
        light, heavy, total, ov = fn(da, db)
        assert int(np.sum(np.asarray(ov))) == 0
        assert int(np.asarray(total).ravel()[0]) == self._expected(A, B)
        # the heavy path's counts are per LOCAL B row: plant probes
        B2 = B.copy()
        B2[:4] = X  # rows 0..3 on chip 0
        B2[4:8] = Y
        da2, db2 = shard_rows(mesh, A, B2)
        light2, heavy2, total2, ov2 = fn(da2, db2)
        assert int(np.sum(np.asarray(ov2))) == 0
        assert int(np.asarray(total2).ravel()[0]) == self._expected(A, B2)
        hc = np.asarray(heavy2).reshape(-1)
        assert np.all(hc[:4] == thr + 8)  # X answered by the heavy path
        assert np.all(hc[4:8] == 0)  # Y answered by the light path


@pytest.mark.slow
class TestDistJoinAtScale:
    """Oracle-validated distributed joins at the scaling-harness size
    (2^18 rows/chip — scripts/benchmark_scaling.py's per-chip load, where
    round 2 only measured throughput). Validates that the capacity and
    skew policies HOLD at scale: exact global totals and zero overflow."""

    N = N_DEV * (1 << 18)

    @staticmethod
    def _expected_total(A, B):
        ca = np.bincount(A, minlength=1 << 14).astype(np.uint64)
        cb = np.bincount(B, minlength=1 << 14).astype(np.uint64)
        return int(np.sum(ca * cb))

    def test_hash_shuffle_join_at_scale(self, mesh, rng):
        from dwarf_bench_tpu.parallel import dist_csr_join

        n = self.N
        per_chip = n // N_DEV
        A = rng.integers(1, 10000, n, endpoint=True).astype(np.uint32)
        B = rng.integers(1, 10000, n, endpoint=True).astype(np.uint32)
        cap = (per_chip // N_DEV) * 2  # 2x the uniform expectation
        fn = dist_csr_join(
            mesh, rows_per_chip=per_chip, distinct_cap=1 << 14,
            ht_size=1 << 15, shuffle_capacity=cap,
        )
        da, db = shard_rows(mesh, A, B)
        counts, local_totals, total, overflow = fn(da, db)
        assert int(np.sum(np.asarray(overflow))) == 0
        expected = self._expected_total(A, B)
        assert int(np.asarray(total).ravel()[0]) == expected
        assert int(np.sum(np.asarray(local_totals, np.uint64))) == expected

    def test_skew_join_at_scale(self, mesh, rng):
        """12% of both sides on one key: the plain hash shuffle would need
        a >6x capacity slot for that chip; the skew variant broadcasts the
        heavy key and keeps overflow at 0 with the uniform-sized slots."""
        from dwarf_bench_tpu.parallel import dist_csr_join_skew

        n = self.N
        per_chip = n // N_DEV
        A = rng.integers(1, 10000, n, endpoint=True).astype(np.uint32)
        B = rng.integers(1, 10000, n, endpoint=True).astype(np.uint32)
        hot = rng.random(n) < 0.12
        A[hot] = 7
        hot_b = rng.random(n) < 0.12
        B[hot_b] = 7
        cap = (per_chip // N_DEV) * 2
        fn = dist_csr_join_skew(
            mesh, rows_per_chip=per_chip, distinct_cap=1 << 14,
            ht_size=1 << 15, shuffle_capacity=cap,
        )
        da, db = shard_rows(mesh, A, B)
        light, heavy, total, overflow = fn(da, db)
        assert int(np.sum(np.asarray(overflow))) == 0
        # the heavy key alone yields ~63e9 pairs: the device-side int32
        # ``total`` wraps (documented), so validate in uint64 on the host
        # from the per-row counts — and per-row EXACTNESS for the heavy
        # side, which rides the broadcast join in original row order.
        ca = np.bincount(A, minlength=1 << 14).astype(np.uint64)
        heavy_rows = np.asarray(heavy).reshape(-1).astype(np.uint64)
        exp_heavy = np.where(B == 7, ca[7], 0).astype(np.uint64)
        assert np.array_equal(heavy_rows, exp_heavy)
        light_sum = int(np.sum(np.asarray(light).astype(np.uint64)))
        assert light_sum + int(exp_heavy.sum()) == self._expected_total(
            A, B
        )
        # the wrapped device total agrees mod 2^32
        assert int(np.asarray(total).ravel()[0]) % (1 << 32) == (
            self._expected_total(A, B) % (1 << 32)
        )
