"""Cross-engine fuzz: every adaptive dispatch must agree with the oracle
regardless of which engine the runtime range/cap checks select."""

import numpy as np
import jax.numpy as jnp
import pytest

from dwarf_bench_tpu.ops import csr_join, scan, sort


@pytest.mark.parametrize("trial", range(12))
def test_sort_auto_random_ranges(rng, trial):
    n = int(rng.integers(1, 60_000))
    lo = int(rng.integers(-(2**28), 2**28))
    span = int(rng.integers(1, 2**uint_bits(trial)))
    x = rng.integers(lo, lo + span, n, endpoint=True).astype(np.int32)
    got = np.asarray(sort.sort_auto(jnp.asarray(x)))
    assert np.array_equal(got, sort.sort_oracle(x)), (n, lo, span)


def uint_bits(trial):
    # spans from tiny to far past the 2^14 counting-sort cutoff
    return [1, 3, 8, 13, 14, 15, 16, 20, 24, 14, 13, 15][trial]


@pytest.mark.parametrize("trial", range(12))
def test_sort_auto_dispatch_logic_on_cpu(rng, trial):
    """The SHIPPED range-dispatch logic (uint32 span wrap, the 80·128 and
    2^14 cliffs, counting-sort composition) — not just its components —
    runs off-device via ``force_dispatch`` (round-3 advisor: the CPU
    short-circuit left it accelerator-only)."""
    n = int(rng.integers(1, 30_000))
    lo = int(rng.integers(-(2**28), 2**28))
    span = int(rng.integers(1, 2**uint_bits(trial)))
    x = rng.integers(lo, lo + span, n, endpoint=True).astype(np.int32)
    got = np.asarray(sort.sort_auto(jnp.asarray(x), force_dispatch=True))
    assert np.array_equal(got, sort.sort_oracle(x)), (n, lo, span)


def test_sort_auto_dispatch_span_wrap_cpu(rng):
    """int32 extremes: max - min wraps int32 but is exact in uint32 —
    the dispatch must take lax.sort, not a 16K-bin counting sort."""
    x = np.array([-(2**31), 2**31 - 1, 0, 5, -7], np.int32)
    got = np.asarray(sort.sort_auto(jnp.asarray(x), force_dispatch=True))
    assert np.array_equal(got, np.sort(x))


@pytest.mark.parametrize("trial", range(10))
def test_filter_sparse_random_selectivity(rng, trial):
    n = int(rng.integers(1, 80_000))
    hi = int(rng.integers(2, 20_000))
    thr = int(rng.integers(1, hi + 1))
    x = rng.integers(1, hi, n, endpoint=True).astype(np.int32)
    out, cnt = scan.filter_sparse(jnp.asarray(x), thr)
    exp = scan.filter_oracle(x, thr)
    assert int(cnt) == len(exp), (n, hi, thr)
    assert np.array_equal(np.asarray(out)[: len(exp)], exp), (n, hi, thr)


@pytest.mark.parametrize("trial", range(8))
def test_dense_join_random(rng, trial):
    n = int(rng.integers(2, 20_000))
    lo = int(rng.integers(0, 2**20))
    span = int(rng.integers(1, (1 << 14) - 1))
    A = (lo + rng.integers(0, span, n, endpoint=True)).astype(np.uint32)
    B = (lo + rng.integers(0, span, n, endpoint=True)).astype(np.uint32)
    assert csr_join.dense_applicable(A, B)
    t = csr_join.build_dense(jnp.asarray(A))
    res = csr_join.probe_dense(t, jnp.asarray(B))
    assert csr_join.join_id_sets(t, res) == csr_join.oracle_id_sets(A, B)
