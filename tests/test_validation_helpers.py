"""Tunnel-friendly validation helpers: the checksum paths must accept
exactly what the exact paths accept (forced on CPU via force_checksum)."""

import numpy as np
import jax.numpy as jnp

from dwarf_bench_tpu.dwarfs.base import (
    all_true_on_device,
    rows_equal_on_device,
    sorted_equal_on_device,
)


def test_all_true(rng):
    f = jnp.asarray(np.ones(1000, bool))
    assert all_true_on_device(f)
    assert not all_true_on_device(f.at[777].set(False))


def test_sorted_equal_checksum(rng):
    e = np.sort(rng.integers(0, 2**31, 100000).astype(np.int32))
    d = jnp.asarray(e)
    assert sorted_equal_on_device(d, e, force_checksum=True)
    # value perturbation
    bad = e.copy()
    bad[5] += 1
    assert not sorted_equal_on_device(jnp.asarray(bad), e,
                                      force_checksum=True)
    # unsorted output with the right multiset
    bad2 = e.copy()
    bad2[10], bad2[20] = bad2[20], bad2[10]
    if bad2[10] != bad2[20]:
        assert not sorted_equal_on_device(jnp.asarray(bad2), e,
                                          force_checksum=True)
    # exact path agrees
    assert sorted_equal_on_device(d, e)


def test_rows_equal_checksum(rng):
    r = 5000
    rows = rng.integers(0, 2**31, (r, 3)).astype(np.uint32)
    order = rng.permutation(r)
    cap = r + 100
    cols = tuple(
        jnp.asarray(np.pad(rows[order, j], (0, cap - r))) for j in range(3)
    )
    cnt = jnp.asarray(np.int32(r))
    expected = rows[np.lexsort(rows.T[::-1])]
    assert rows_equal_on_device(cols, cnt, expected, force_checksum=True)
    assert rows_equal_on_device(cols, cnt, expected)  # exact path
    # one row value changed
    bad = [np.asarray(c).copy() for c in cols]
    bad[1][17] ^= 1
    assert not rows_equal_on_device(
        tuple(jnp.asarray(b) for b in bad), cnt, expected,
        force_checksum=True,
    )
    # count mismatch
    assert not rows_equal_on_device(cols, jnp.asarray(np.int32(r - 1)),
                                    expected, force_checksum=True)


def test_validate_csr_join_large(rng):
    import jax.numpy as jnp

    from dwarf_bench_tpu.dwarfs.join import _validate_csr_join_large
    from dwarf_bench_tpu.ops import csr_join

    n = 70000
    A = rng.integers(1, 10000, n, endpoint=True).astype(np.uint32)
    B = rng.integers(1, 12000, n, endpoint=True).astype(np.uint32)
    da = jnp.asarray(A)
    t = csr_join.build_dense(da)
    res = csr_join.probe_dense(t, jnp.asarray(B))
    assert _validate_csr_join_large(A, B, da, t, res)

    # corrupt one probe position
    bad = csr_join.CsrProbeResult(
        res.found, res.pos.at[17].add(jnp.where(res.found[17], 1, 0)),
        res.counts,
    )
    bad_or_miss = _validate_csr_join_large(A, B, da, t, bad)
    assert (not bad_or_miss) or not bool(res.found[17])

    # corrupt the id_buffer grouping
    t2 = t._replace(
        id_buffer=t.id_buffer.at[0].set(t.id_buffer[n - 1]))
    assert not _validate_csr_join_large(A, B, da, t2, res)
