"""Mask-driven multi-column Pallas compaction (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dwarf_bench_tpu.ops.compact_pallas import compact_mask_pallas


@pytest.mark.parametrize("n", [100, 16384, 50_000])
@pytest.mark.parametrize("sel", [0.0, 0.001, 0.3, 1.0])
def test_two_cols_vs_numpy(rng, n, sel):
    mask = rng.random(n) < sel
    a = rng.integers(0, 2**31, n).astype(np.int32)
    b = rng.integers(0, 2**31, n).astype(np.int32)
    (oa, ob), cnt = compact_mask_pallas(
        jnp.asarray(mask), (jnp.asarray(a), jnp.asarray(b)), interpret=True
    )
    k = int(cnt)
    assert k == mask.sum()
    assert np.array_equal(np.asarray(oa)[:k], a[mask])
    assert np.array_equal(np.asarray(ob)[:k], b[mask])


def test_one_col(rng):
    n = 20_000
    mask = rng.random(n) < 0.01
    a = np.arange(n, dtype=np.int32)
    (oa,), cnt = compact_mask_pallas(
        jnp.asarray(mask), (jnp.asarray(a),), interpret=True
    )
    k = int(cnt)
    assert np.array_equal(np.asarray(oa)[:k], a[mask])
