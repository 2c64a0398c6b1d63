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


@pytest.mark.parametrize("num_groups", [20, 64, 1024, 4096, 100])
def test_groupby_small_swar_matches_oracle(rng, num_groups):
    """Round-4 SWAR balanced-digit group-by: drop-in for
    groupby_small_pallas, incl. out-of-range keys and the int32 wrap."""
    from dwarf_bench_tpu.ops.groupby import groupby_oracle
    from dwarf_bench_tpu.ops.groupby_pallas import groupby_small_swar_pallas

    n = 1 << 15
    k = rng.integers(0, num_groups + 7, n).astype(np.uint32)  # some OOR
    v = rng.integers(0, 1 << 14, n).astype(np.uint32)
    got = np.asarray(groupby_small_swar_pallas(
        jnp.asarray(k), jnp.asarray(v), num_groups, interpret=True))
    ok = k < num_groups  # out-of-range keys must contribute nothing
    assert np.array_equal(got, groupby_oracle(k[ok], v[ok], num_groups))


def test_groupby_small_swar_degenerate(rng):
    """Single group, boundary digits, tiny n, value extremes 0 / 2^14-1
    (the small-grid bf16-truncation lesson: degenerate sizes too)."""
    from dwarf_bench_tpu.ops.groupby import groupby_oracle
    from dwarf_bench_tpu.ops.groupby_pallas import groupby_small_swar_pallas

    cases = [
        (np.zeros(5000, np.uint32),
         np.full(5000, (1 << 14) - 1, np.uint32), 64),
        (np.array([0, 63, 64, 127], np.uint32),
         np.array([1, 2, 3, 4], np.uint32), 64),
        (np.array([7], np.uint32), np.array([0], np.uint32), 20),
    ]
    for k, v, G in cases:
        got = np.asarray(groupby_small_swar_pallas(
            jnp.asarray(k), jnp.asarray(v), G, interpret=True))
        ok = k < G
        assert np.array_equal(got, groupby_oracle(k[ok], v[ok], G)), (
            G, k[:4])


@pytest.mark.parametrize("hi_bins,n", [(80, 1 << 16), (128, 100000),
                                       (80, 16384)])
@pytest.mark.parametrize("fast", [True, False])
def test_swar_histogram_matches(rng, hi_bins, n, fast):
    """Bin-packed SWAR one-hot construction (round 3) is a drop-in for
    histogram_16k_pallas, including out-of-range/negative keys — in both
    the generic 6-op and the 3-op 7-bit zero-detect forms (round 4:
    sentinel routing at hi_bins ≤ 120, lane kill mask at 128)."""
    from dwarf_bench_tpu.ops.hist_pallas import histogram_16k_swar_pallas
    from dwarf_bench_tpu.ops.sort import histogram_16k

    k = rng.integers(-100, hi_bins * 128 + 500, n).astype(np.int32)
    ref = histogram_16k(jnp.asarray(k), hi_bins=hi_bins)
    got = histogram_16k_swar_pallas(
        jnp.asarray(k), hi_bins=hi_bins, fast_zdetect=fast, interpret=True
    )
    assert np.array_equal(np.asarray(ref), np.asarray(got))


def test_swar_histogram_degenerate(rng):
    """Small + degenerate inputs (the round-3 bf16-truncation lesson):
    single value, all out-of-range, boundary digits 0/127, tiny n."""
    from dwarf_bench_tpu.ops.hist_pallas import histogram_16k_swar_pallas
    from dwarf_bench_tpu.ops.sort import histogram_16k

    cases = [
        np.full(777, 5, np.int32),                       # one hot bin
        np.full(64, 1 << 14, np.int32),                  # all out of range
        np.array([0, 127, 128, 16383, -1], np.int32),    # digit extremes
        np.array([16256 + 127], np.int32),               # last bin only
    ]
    for k in cases:
        for hb in (80, 128):
            ref = np.asarray(histogram_16k(jnp.asarray(k), hi_bins=hb))
            got = np.asarray(histogram_16k_swar_pallas(
                jnp.asarray(k), hi_bins=hb, interpret=True))
            assert np.array_equal(ref, got), (k[:4], hb)


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
