"""MXU Pallas cumsum vs jnp.cumsum (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dwarf_bench_tpu.ops.cumsum_pallas import cumsum_pallas


@pytest.mark.parametrize("n", [1, 1000, 131072, 300_000])
def test_matches_jnp(rng, n):
    # sparse 0/1-ish input (the run-expansion shape): block sums far < 2^24
    x = (rng.random(n) < 0.01).astype(np.int32) * rng.integers(1, 5, n).astype(
        np.int32
    )
    got = np.asarray(cumsum_pallas(jnp.asarray(x), interpret=True))
    assert np.array_equal(got, np.cumsum(x).astype(np.int32))


def test_carry_init_and_negatives(rng):
    x = rng.integers(-3, 4, 50_000).astype(np.int32)
    got = np.asarray(cumsum_pallas(jnp.asarray(x), carry_init=-7,
                                   interpret=True))
    assert np.array_equal(got, (np.cumsum(x) - 7).astype(np.int32))


def test_expand_runs_equivalence(rng):
    """The counting-sort path: expansion via cumsum_pallas == XLA path."""
    from dwarf_bench_tpu.ops.sort import histogram_16k

    n = 100_000
    k = rng.integers(0, 10000, n).astype(np.int32)
    counts = histogram_16k(jnp.asarray(k))
    starts = jnp.cumsum(counts) - counts
    s = jnp.zeros((n,), jnp.int32).at[starts].add(1, mode="drop")
    got = np.asarray(cumsum_pallas(s, carry_init=-1, interpret=True))
    exp = np.cumsum(np.asarray(s)) - 1
    assert np.array_equal(got, exp)
    assert np.array_equal(got, np.sort(k, kind="stable"))


def test_wide_multiplicities(rng):
    """Values past bf16's 256 exact-int limit: the device bug caught by
    the first TPU small-grid radix sweep (0/9 valid at 25600) — the
    counting sort's boundary column carries one multiplicity per run of
    empty bins, which exceeds 256 in small/degenerate sorts. The
    sign-preserving two-plane operand split must stay exact to 2^15."""
    s = np.zeros(25600, np.int32)
    idx = rng.integers(0, 25600, 10240)
    np.add.at(s, idx, 1)
    s[7] = 9000
    s[200] = 300
    got = np.asarray(cumsum_pallas(jnp.asarray(s), interpret=True))
    assert np.array_equal(got, np.cumsum(s).astype(np.int32))
    s2 = np.zeros(256, np.int32)
    s2[0] = 16384  # all 2^14 bins sharing one start (all-equal keys)
    got = np.asarray(cumsum_pallas(jnp.asarray(s2), interpret=True))
    assert np.array_equal(got, np.cumsum(s2).astype(np.int32))


@pytest.mark.parametrize("n", [256, 25600, 100_000])
def test_expand_runs_pallas_path_small_n(rng, n):
    """The ACCELERATOR expansion path at small n (multiplicities > 1;
    > 255 in the degenerate case) — the 2026-08 bf16-truncation bug
    lived exclusively here and the CPU-only grid missed it. force_pallas
    + interpret runs the real kernel dispatch on the CPU backend."""
    from dwarf_bench_tpu.ops.sort import _expand_runs, histogram_16k

    for keys in (
        rng.integers(0, 10000, n).astype(np.int32),
        np.full(n, 9000, np.int32),  # degenerate: all equal
    ):
        counts = histogram_16k(jnp.asarray(keys), hi_bins=80)
        got = np.asarray(
            _expand_runs(counts, n, force_pallas=True, interpret=True)
        )
        assert np.array_equal(got, np.sort(keys)), n
