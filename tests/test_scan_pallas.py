"""Pallas streaming-filter kernel tests (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dwarf_bench_tpu.ops.scan import filter_oracle
from dwarf_bench_tpu.ops.scan_pallas import filter_pallas


@pytest.mark.parametrize(
    "n,threshold",
    [
        (2048, 5),       # reference selectivity (~4/10000)
        (10000, 5000),   # selectivity 0.5 (BASELINE config)
        (1 << 15, 9999), # nearly everything selected
        (100, 2),        # nearly nothing / tiny non-tile-aligned input
        (4096, 10001),   # everything selected
        (2048, 1),       # nothing selected
    ],
)
def test_filter_pallas_vs_oracle(rng, n, threshold):
    x = rng.integers(1, 10000, n, endpoint=True).astype(np.int32)
    out, cnt = filter_pallas(jnp.asarray(x), threshold, interpret=True)
    exp = filter_oracle(x, threshold)
    assert int(cnt) == len(exp)
    assert np.array_equal(np.asarray(out)[: len(exp)], exp)


def test_filter_pallas_small_tile(rng):
    x = rng.integers(1, 10, 1000, endpoint=True).astype(np.int32)
    out, cnt = filter_pallas(jnp.asarray(x), 5, tile=256, interpret=True)
    exp = filter_oracle(x, 5)
    assert int(cnt) == len(exp)
    assert np.array_equal(np.asarray(out)[: len(exp)], exp)


@pytest.mark.parametrize(
    "n,threshold,deep",
    [
        (1 << 18, 5, 0),      # benchmark selectivity, fused fast path
        (1 << 18, 5, 40),     # out-of-window singles join the gather path
        (1 << 17, 5000, 0),   # dense: caps trip -> general fallback
        (100000, 5, 5),       # non-chunk-aligned n
    ],
)
def test_filter_sparse_fused_vs_oracle(rng, n, threshold, deep):
    """The round-3 fused path (chunk_stats_fused + scan_tail_compact)
    end to end in interpret mode; `interpret=True` forces the fused
    engine even on the CPU backend."""
    from dwarf_bench_tpu.ops.scan import filter_sparse

    x = rng.integers(1, 10000, n, endpoint=True).astype(np.int32)
    if deep:
        x[rng.integers(0, n, deep)] = -700
    out, cnt = filter_sparse(jnp.asarray(x), threshold, interpret=True)
    exp = filter_oracle(x, threshold)
    assert int(cnt) == len(exp)
    assert np.array_equal(np.asarray(out)[: len(exp)], exp)
