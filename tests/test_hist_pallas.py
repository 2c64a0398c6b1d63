"""Pallas fused histogram vs the XLA formulation (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dwarf_bench_tpu.ops.hist_pallas import histogram_16k_pallas
from dwarf_bench_tpu.ops.sort import histogram_16k


@pytest.mark.parametrize("n", [1, 1000, 16384, 50_000])
def test_matches_xla_histogram(rng, n):
    k = rng.integers(0, 1 << 14, n).astype(np.int32)
    got = np.asarray(histogram_16k_pallas(jnp.asarray(k), interpret=True))
    exp = np.asarray(histogram_16k(jnp.asarray(k)))
    assert np.array_equal(got, exp)
    assert got.sum() == n


@pytest.mark.parametrize("hi_bins", [8, 128, 512])
def test_weighted_matches_oracle(rng, hi_bins):
    from dwarf_bench_tpu.ops.groupby import groupby_oracle
    from dwarf_bench_tpu.ops.hist_pallas import weighted_histogram_pallas

    n, g = 50_000, hi_bins * 128
    k = rng.integers(0, g, n).astype(np.int32)
    v = rng.integers(1, 10000, n, endpoint=True).astype(np.int32)
    got = np.asarray(
        weighted_histogram_pallas(
            jnp.asarray(k), jnp.asarray(v), hi_bins=hi_bins, interpret=True
        )
    ).astype(np.uint32)
    assert np.array_equal(got, groupby_oracle(k, v, g))


def test_out_of_range_ignored(rng):
    k = rng.integers(0, 1 << 14, 5000).astype(np.int32)
    k[:100] = -1  # uint32 huge → ignored
    k[100:200] = 1 << 14  # just out of range
    k[200:300] = np.int32(-2147483648)
    got = np.asarray(histogram_16k_pallas(jnp.asarray(k), interpret=True))
    exp = np.bincount(k[300:][k[300:] >= 0], minlength=1 << 14)
    assert np.array_equal(got, exp)
    assert got.sum() == 4700


@pytest.mark.parametrize("num_groups", [20, 64, 1000, 4096])
def test_groupby_small_f32_matches_oracle(rng, num_groups):
    from dwarf_bench_tpu.ops.groupby import groupby_oracle
    from dwarf_bench_tpu.ops.groupby_pallas import groupby_small_pallas_f32

    n = 50_000
    k = rng.integers(0, num_groups, n).astype(np.uint32)
    v = rng.integers(1, 10000, n, endpoint=True).astype(np.uint32)
    got = np.asarray(
        groupby_small_pallas_f32(
            jnp.asarray(k), jnp.asarray(v), num_groups, interpret=True
        )
    )
    assert np.array_equal(got, groupby_oracle(k, v, num_groups))


def test_groupby_small_f32_out_of_range_ignored(rng):
    from dwarf_bench_tpu.ops.groupby import groupby_oracle
    from dwarf_bench_tpu.ops.groupby_pallas import groupby_small_pallas_f32

    G, n = 64, 20_000
    k = rng.integers(0, G, n).astype(np.int32)
    v = rng.integers(1, 10000, n, endpoint=True).astype(np.int32)
    k[:50] = -7  # uint32 huge
    k[50:100] = G  # just out of range (and == the ga*gb sentinel for G=64)
    got = np.asarray(
        groupby_small_pallas_f32(
            jnp.asarray(k), jnp.asarray(v), G, interpret=True
        )
    )
    assert np.array_equal(got, groupby_oracle(k[100:], v[100:], G))


def test_groupby_small_f32_exactness_edge(rng):
    """Worst case for the f32 HIGHEST path: 1024-lane half-rows filled with
    one group at the max value (2^14 - 1): cell partial = 16,776,192, one
    ulp under 2^24."""
    from dwarf_bench_tpu.ops.groupby import groupby_oracle
    from dwarf_bench_tpu.ops.groupby_pallas import groupby_small_pallas_f32

    G, n = 64, 1 << 15
    k = np.zeros(n, np.uint32)  # every row in group 0
    v = np.full(n, (1 << 14) - 1, np.uint32)
    got = np.asarray(
        groupby_small_pallas_f32(jnp.asarray(k), jnp.asarray(v), G,
                                 interpret=True)
    )
    assert np.array_equal(got, groupby_oracle(k, v, G))


@pytest.mark.parametrize("hi_bins,n", [(80, 1 << 16), (128, 100000),
                                       (80, 16384)])
def test_swar_histogram_matches(rng, hi_bins, n):
    """Bin-packed SWAR one-hot construction (round 3) is a drop-in for
    histogram_16k_pallas, including out-of-range/negative keys."""
    from dwarf_bench_tpu.ops.hist_pallas import histogram_16k_swar_pallas
    from dwarf_bench_tpu.ops.sort import histogram_16k

    k = rng.integers(-100, hi_bins * 128 + 500, n).astype(np.int32)
    ref = histogram_16k(jnp.asarray(k), hi_bins=hi_bins)
    got = histogram_16k_swar_pallas(
        jnp.asarray(k), hi_bins=hi_bins, interpret=True
    )
    assert np.array_equal(np.asarray(ref), np.asarray(got))


@pytest.mark.parametrize("hi_bins", [256, 512])
def test_swar_weighted_histogram_matches(rng, hi_bins):
    """SWAR hi-side one-hots (grouped byte patterns + kill masks) are a
    drop-in for the int8 weighted histogram, incl. out-of-range keys."""
    from dwarf_bench_tpu.ops.hist_pallas import (
        weighted_histogram_i8_pallas,
        weighted_histogram_i8_swar_pallas,
    )

    n = 1 << 16
    k = rng.integers(-3, hi_bins * 128 + 99, n).astype(np.int32)
    v = rng.integers(1, 10000, n).astype(np.int32)
    a = weighted_histogram_i8_pallas(
        jnp.asarray(k), jnp.asarray(v), hi_bins=hi_bins, interpret=True
    )
    b = weighted_histogram_i8_swar_pallas(
        jnp.asarray(k), jnp.asarray(v), hi_bins=hi_bins, interpret=True
    )
    assert np.array_equal(np.asarray(a), np.asarray(b))
