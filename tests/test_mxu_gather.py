"""MXU one-hot matmul table gather vs plain indexing."""

import numpy as np
import jax.numpy as jnp
import pytest

from dwarf_bench_tpu.ops.mxu_gather import gather_16k, gather_16k_rel


@pytest.mark.parametrize("k,n", [(7, 100), (16384, 10_000), (5000, 8192)])
def test_gather_matches_indexing(rng, k, n):
    table = rng.integers(0, 2**31, k).astype(np.uint32)
    idx = rng.integers(0, k, n).astype(np.int32)
    got = np.asarray(gather_16k(jnp.asarray(table), jnp.asarray(idx)))
    assert np.array_equal(got, table[idx])


@pytest.mark.parametrize("k,n", [(16384, 10_000), (777, 2048)])
def test_gather_int8_planes(rng, k, n):
    # 5 x 7-bit planes cover any 32-bit value on the int8 MXU path
    table = rng.integers(0, 2**32, k, dtype=np.uint64).astype(np.uint32)
    idx = rng.integers(0, k, n).astype(np.int32)
    got = np.asarray(
        gather_16k(jnp.asarray(table), jnp.asarray(idx), planes=5,
                   plane_dtype="int8")
    )
    assert np.array_equal(got, table[idx])


@pytest.mark.parametrize("n", [100, 10_000])
@pytest.mark.parametrize("engine", ["f32", "bf16_planes"])
def test_gather_rel_matches_indexing(rng, n, engine):
    # full 24-bit range on both tables (the layout's exactness bound)
    packed3 = rng.integers(0, 1 << 24, 16384).astype(np.uint32)
    packed3[:4] = [0, 1, (1 << 24) - 1, (1 << 24) - 2]
    base = rng.integers(0, 1 << 24, 128).astype(np.int32)
    base[:2] = [(1 << 24) - 1, 0]
    idx = np.concatenate(
        [rng.integers(0, 16384, n - 2).astype(np.int32),
         np.array([-1, 16500], np.int32)]
    )
    rel, b = gather_16k_rel(
        jnp.asarray(packed3), jnp.asarray(base), jnp.asarray(idx),
        engine=engine,
    )
    rel, b = np.asarray(rel), np.asarray(b)
    ok = (idx >= 0) & (idx < 16384)
    assert np.array_equal(rel[ok], packed3[idx[ok]])
    assert np.array_equal(b[ok], base[idx[ok] >> 7])
    assert np.all(rel[~ok] == 0) and np.all(b[~ok] == 0)


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


def test_probe_dense_rel_pallas_matches_xla(rng):
    import jax.numpy as jnp

    from dwarf_bench_tpu.ops import csr_join
    from dwarf_bench_tpu.ops.probe_pallas import probe_dense_rel_pallas

    n = 1 << 14
    A = rng.integers(1, 10000, n, endpoint=True).astype(np.uint32)
    B = rng.integers(1, 12000, n, endpoint=True).astype(np.uint32)  # misses
    t = csr_join.build_dense(jnp.asarray(A))
    assert bool(t.packed3_ok)
    ki = (B.astype(np.int64) - int(t.minv)).astype(np.int32)
    ki[(ki < 0) | (ki >= 1 << 14)] = -1
    pos, cnt = probe_dense_rel_pallas(
        t.packed3, t.base128, jnp.asarray(ki), interpret=True
    )
    ref = csr_join.probe_dense(t, jnp.asarray(B))
    assert np.array_equal(np.asarray(cnt), np.asarray(ref.counts))
    assert np.array_equal(np.asarray(pos), np.asarray(ref.pos))
    assert np.array_equal(np.asarray(cnt) > 0, np.asarray(ref.found))


@pytest.mark.parametrize("hi_rows", [128, 80])
def test_probe_dense_cat_pallas_matches_xla(rng, hi_rows):
    """Round-4 scaled-plane-concat fused probe == the XLA rel path,
    incl. misses, out-of-range keys, and the range-aware hi_rows form."""
    import jax.numpy as jnp

    from dwarf_bench_tpu.ops import csr_join
    from dwarf_bench_tpu.ops.probe_pallas import probe_dense_cat_pallas

    n = 1 << 14
    span = hi_rows * 128 - 300
    A = rng.integers(1, span, n, endpoint=True).astype(np.uint32)
    B = rng.integers(1, span + 900, n, endpoint=True).astype(np.uint32)
    t = csr_join.build_dense(jnp.asarray(A))
    assert bool(t.packed3_ok)
    ki = (B.astype(np.int64) - int(t.minv)).astype(np.int32)
    ki[(ki < 0) | (ki >= hi_rows * 128)] = -1
    pos, cnt = probe_dense_cat_pallas(
        t.packed3, t.base128, jnp.asarray(ki), hi_rows=hi_rows,
        interpret=True,
    )
    ref = csr_join.probe_dense(t, jnp.asarray(B), hi_rows=hi_rows)
    assert np.array_equal(np.asarray(cnt), np.asarray(ref.counts))
    assert np.array_equal(np.asarray(pos), np.asarray(ref.pos))
    assert np.array_equal(np.asarray(cnt) > 0, np.asarray(ref.found))


@pytest.mark.parametrize("hi_rows,form", [(80, "f32"), (128, "int8"),
                                          (80, "int8")])
def test_gather_rel_variants(rng, hi_rows, form):
    """Range-aware (hi_rows) and int8 4-plane rel-gathers match the
    shipped f32-HIGHEST form bit-exactly, incl. out-of-range indices."""
    from dwarf_bench_tpu.ops.mxu_gather import gather_16k_rel

    packed3 = jnp.asarray(
        rng.integers(0, 1 << 24, 16384).astype(np.int32)
    )
    base = jnp.asarray(rng.integers(0, 1 << 20, 128).astype(np.int32))
    idx = jnp.asarray(
        rng.integers(-3, hi_rows * 128, 1 << 14).astype(np.int32)
    )
    r0, b0 = gather_16k_rel(packed3, base, idx)
    r1, b1 = gather_16k_rel(
        packed3, base, idx, engine=form, hi_rows=hi_rows
    )
    assert np.array_equal(np.asarray(r0), np.asarray(r1))
    assert np.array_equal(np.asarray(b0), np.asarray(b1))
