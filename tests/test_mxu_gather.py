"""MXU one-hot matmul table gather vs plain indexing."""

import numpy as np
import jax.numpy as jnp
import pytest

from dwarf_bench_tpu.ops.mxu_gather import gather_16k


@pytest.mark.parametrize("k,n", [(7, 100), (16384, 10_000), (5000, 8192)])
def test_gather_matches_indexing(rng, k, n):
    table = rng.integers(0, 2**31, k).astype(np.uint32)
    idx = rng.integers(0, k, n).astype(np.int32)
    got = np.asarray(gather_16k(jnp.asarray(table), jnp.asarray(idx)))
    assert np.array_equal(got, table[idx])


def test_out_of_range_returns_zero(rng):
    table = rng.integers(1, 100, 128).astype(np.int32)
    idx = np.array([-1, 128, 16384, 0, -2147483648], np.int32)
    got = np.asarray(gather_16k(jnp.asarray(table), jnp.asarray(idx)))
    assert np.array_equal(got, [0, 0, 0, table[0], 0])


def test_full_32bit_values(rng):
    table = np.array([0xFFFFFFFF, 0, 0x80000000, 0x12345678], np.uint32)
    idx = np.array([0, 1, 2, 3, 2], np.int32)
    got = np.asarray(gather_16k(jnp.asarray(table), jnp.asarray(idx)))
    assert np.array_equal(got, table[idx])
