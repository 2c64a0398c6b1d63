"""Interpret-mode tests for the two-pass Pallas bitonic merge and the
fused fill kernel (the TPU engines behind merge_lookup_bitonic)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dwarf_bench_tpu.ops.bitonic import merge_bitonic
from dwarf_bench_tpu.ops.bitonic_pallas import merge_bitonic_pallas
from dwarf_bench_tpu.ops.merge_fill_pallas import merge_fill_pallas


def _bitonic_input(rng, n, ncols, split=0.37):
    keys = rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32)
    a = int(n * split)
    aux = rng.permutation(n).astype(np.uint32)
    k1, k2 = keys[:a], keys[a:]
    o1 = np.lexsort((aux[:a], k1))
    o2 = np.lexsort((aux[a:], k2))[::-1]
    k = np.concatenate([k1[o1], k2[o2]])
    ax = np.concatenate([aux[:a][o1], aux[a:][o2]])
    pay = rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32)
    return (jnp.asarray(k), jnp.asarray(ax), jnp.asarray(pay))[:ncols]


def test_small_n_falls_back_to_jnp(rng):
    cols = _bitonic_input(rng, 1 << 12, 2)
    ref = merge_bitonic(cols)
    got = merge_bitonic_pallas(cols, interpret=True)
    for r, g in zip(ref, got):
        assert np.array_equal(np.asarray(r), np.asarray(g))


@pytest.mark.slow
@pytest.mark.parametrize("ncols", [2, 3])
def test_pallas_merge_matches_jnp_network(rng, ncols):
    # n >= 2*8*lanes so the two-pass Pallas path actually runs
    n = 1 << 18
    cols = _bitonic_input(rng, n, ncols)
    ref = merge_bitonic(cols)
    got = merge_bitonic_pallas(cols, interpret=True)
    for r, g in zip(ref, got):
        assert np.array_equal(np.asarray(r), np.asarray(g))


@pytest.mark.parametrize("val16,memb", [(True, False), (False, False),
                                        (False, True)])
def test_fill_kernel_matches_scan_reference(rng, val16, memb):
    TAG = np.uint32(0x80000000)
    nt = nq = 1 << 14  # merged N = 2^15: one fill-block multiple
    keys = np.sort(rng.choice(1 << 20, nt, replace=False).astype(np.uint32))
    vals = rng.integers(0, 1 << 32, nt, dtype=np.uint64).astype(np.uint32)
    q = np.concatenate([
        rng.permutation(keys)[: nq // 2],
        rng.integers(1 << 21, 1 << 22, nq - nq // 2).astype(np.uint32),
    ])
    q[0] = 0  # key-0-before-any-source edge
    rng.shuffle(q)
    qi = np.arange(nq, dtype=np.uint32)
    order = np.lexsort((qi, q))
    qs, qidx = q[order], qi[order]
    dv = vals - np.roll(vals, 1)
    dv[0] = vals[0]
    ka = np.concatenate([keys, qs[::-1]])
    aa = np.concatenate(
        [(dv & 0xFFFF).astype(np.uint32), (TAG | qidx)[::-1]]
    )
    dvc = np.concatenate([dv, np.zeros(nq, np.uint32)])
    sk, sa, sdv = (
        np.asarray(x) for x in merge_bitonic(
            (jnp.asarray(ka), jnp.asarray(aa), jnp.asarray(dvc))
        )
    )
    dest, val = merge_fill_pallas(
        jnp.asarray(sk), jnp.asarray(sa), jnp.asarray(sdv), nq,
        val16=val16, membership=memb, interpret=True,
    )
    # scalar reference
    is_src = (sa & 0x80000000) == 0
    carry = np.maximum.accumulate(
        np.where(is_src, sk.astype(np.uint64) + 1, 0)
    )
    found = (
        (~is_src) & (carry == sk.astype(np.uint64) + 1)
        & (sk != 0xFFFFFFFF)
    )
    sv = np.where(is_src, (sa & 0xFFFF) if val16 else sdv, 0).astype(
        np.uint32)
    fv = np.cumsum(sv, dtype=np.uint32)
    if val16:
        fv = fv & 0xFFFF
    qp = sa & 0x7FFFFFFF
    is_real = (~is_src) & (qp < nq)
    rdest = np.where(is_real, (qp << 1) | found, 0xFFFFFFFF).astype(
        np.uint32)
    rval = np.where(found & (not memb), fv, 0).astype(np.uint32)
    assert np.array_equal(np.asarray(dest), rdest)
    assert np.array_equal(np.asarray(val), rval)
