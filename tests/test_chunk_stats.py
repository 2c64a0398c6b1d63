"""Phase-A chunk statistics (window encoding) vs a numpy oracle, plus the
uninitialized-prefix emit kernel."""

import numpy as np
import jax.numpy as jnp
import pytest

from dwarf_bench_tpu.ops.chunk_stats import chunk_stats_xla
from dwarf_bench_tpu.ops.chunk_stats_pallas import chunk_stats_pallas
from dwarf_bench_tpu.ops.compact_pallas import emit_prefix_pallas


def oracle(x2, thr):
    m = x2 < thr
    cnt = m.sum(1)
    d = thr - np.maximum(x2.astype(np.int64), thr - 512)
    vclip = np.clip(d, 0, 256)
    vs = np.minimum(vclip.sum(1), 511)
    stat = cnt * 512 + vs
    base = np.cumsum(cnt) - cnt
    return stat.astype(np.int32), base.astype(np.int32)


@pytest.mark.parametrize("nch,thr", [(256, 5), (1024, 5000), (300, -100)])
def test_stats_match_oracle(rng, nch, thr):
    x2 = rng.integers(-10000, 10000, (nch, 128)).astype(np.int32)
    stat, base = chunk_stats_xla(jnp.asarray(x2), thr)
    est, eb = oracle(x2, thr)
    assert np.array_equal(np.asarray(stat), est)
    assert np.array_equal(np.asarray(base), eb)


def test_window_encoding_cases():
    # one chunk per case: single in-window, single below-window (marker
    # 256 -> vsum == 256), multi, empty
    thr = 5
    rows = np.full((4, 128), 10000, np.int32)
    rows[0, 7] = 3  # in window: vsum = 2
    rows[1, 3] = -5000  # below window: vsum = 256
    rows[2, 1] = 1
    rows[2, 2] = 4
    stat, base = chunk_stats_xla(jnp.asarray(rows), thr)
    stat = np.asarray(stat)
    cnt, vsw = stat >> 9, stat & 511
    assert list(cnt) == [1, 1, 2, 0]
    assert vsw[0] == 2 and thr - vsw[0] == 3
    assert vsw[1] == 256
    assert np.array_equal(np.asarray(base), [0, 1, 2, 4])


@pytest.mark.parametrize(
    "nch,thr",
    [
        (256, 5),
        (1024, 5000),
        (300, -100),  # non-block-multiple tail exercises the thr padding
        (4096, 5),  # exactly one (256, 2048) block
        (4097, 10000),  # everything matches: cnt == 128 per chunk
    ],
)
def test_stats_pallas_matches_xla(rng, nch, thr):
    """The streaming MXU kernel is a drop-in for chunk_stats_xla
    (benchmark-scale perf lives in scripts/measure_r3.py)."""
    x2 = rng.integers(-10000, 10000, (nch, 128)).astype(np.int32)
    s0, b0 = chunk_stats_xla(jnp.asarray(x2), thr)
    s1, b1 = chunk_stats_pallas(jnp.asarray(x2), thr, interpret=True)
    assert np.array_equal(np.asarray(s0), np.asarray(s1))
    assert np.array_equal(np.asarray(b0), np.asarray(b1))


@pytest.mark.parametrize(
    "nch,thr",
    [
        (256, 5),
        (1024, 5000),
        (300, -100),  # non-block-multiple tail exercises the thr padding
        (4096, 5),  # exactly one (256, 2048) block
        (4097, 10000),  # everything matches: cnt == 128 per chunk
        (9000, 5),  # multi-block: exercises the in-kernel base carry
    ],
)
def test_stats_fused_matches_xla(rng, nch, thr):
    """The single-dot packed kernel (round 3) returns stat AND base from
    one pallas_call — drop-in for chunk_stats_xla."""
    from dwarf_bench_tpu.ops.chunk_stats_pallas import chunk_stats_fused

    x2 = rng.integers(-10000, 10000, (nch, 128)).astype(np.int32)
    s0, b0 = chunk_stats_xla(jnp.asarray(x2), thr)
    s1, b1 = chunk_stats_fused(jnp.asarray(x2), thr, interpret=True)
    assert np.array_equal(np.asarray(s0), np.asarray(s1))
    assert np.array_equal(np.asarray(b0), np.asarray(b1))


@pytest.mark.parametrize("nch,density", [(2048, 0.001), (6000, 0.01),
                                         (2048, 0.0)])
def test_scan_tail_compact(rng, nch, density):
    """The fused tail kernel reproduces both chunk-level compactions (and
    the base[mids] gather) of the multi-dispatch path exactly."""
    from dwarf_bench_tpu.ops.primitives import compact_multi
    from dwarf_bench_tpu.ops.scan_tail_pallas import scan_tail_compact

    thr = 5
    x2 = rng.integers(1, 10001, (nch, 128)).astype(np.int32)
    hit = rng.random((nch, 128)) < density
    x2[hit] = rng.integers(-1000, 5, hit.sum()).astype(np.int32)
    stat, base = chunk_stats_xla(jnp.asarray(x2), thr)
    cnt, vsw = stat >> 9, stat & 511
    single = (cnt == 1) & (vsw >= 1) & (vsw <= 255)
    multi = (cnt >= 1) & ~single
    cap_s, cap_m = 4096, 512
    spos, sval, mids, mbase, ns, nm = scan_tail_compact(
        stat, base, thr, cap_s, cap_m, interpret=True
    )
    (rpos, rval), rns = compact_multi(
        (base, jnp.int32(thr) - vsw), single, capacity=cap_s
    )
    (rmids, rmbase), rnm = compact_multi(
        (jnp.arange(nch, dtype=jnp.int32), base), multi, capacity=cap_m
    )
    ns, nm = int(ns), int(nm)
    assert (ns, nm) == (int(rns), int(rnm))
    assert np.array_equal(np.asarray(spos[:ns]), np.asarray(rpos[:ns]))
    assert np.array_equal(np.asarray(sval[:ns]), np.asarray(rval[:ns]))
    assert np.all(np.asarray(spos[ns:]) == np.int32(0x7FFFFFFF))
    assert np.array_equal(np.asarray(mids[:nm]), np.asarray(rmids[:nm]))
    assert np.array_equal(np.asarray(mbase[:nm]), np.asarray(rmbase[:nm]))


@pytest.mark.parametrize("l,cap", [(100, 1000), (128, 128), (37, 40)])
def test_emit_prefix(rng, l, cap):
    v = rng.integers(-(2**31), 2**31, l).astype(np.int32)
    out = np.asarray(emit_prefix_pallas(jnp.asarray(v), cap, interpret=True))
    assert out.shape == (cap,)
    assert np.array_equal(out[:l], v)


@pytest.mark.parametrize("nch,density", [(8192, 0.0005), (131072, 0.0005),
                                         (20000, 0.01), (2048, 0.0)])
def test_scan_tail_streams(rng, nch, density):
    """The streaming two-mask tail kernel (the shipped round-3 engine)
    reproduces both chunk-level compactions exactly at any nch."""
    from dwarf_bench_tpu.ops.primitives import compact_multi
    from dwarf_bench_tpu.ops.scan_tail_pallas import scan_tail_streams

    thr = 5
    x2 = rng.integers(1, 10001, (nch, 128)).astype(np.int32)
    hit = rng.random((nch, 128)) < density
    x2[hit] = rng.integers(-1000, 5, hit.sum()).astype(np.int32)
    stat, base = chunk_stats_xla(jnp.asarray(x2), thr)
    cnt, vsw = stat >> 9, stat & 511
    single = (cnt == 1) & (vsw >= 1) & (vsw <= 255)
    multi = (cnt >= 1) & ~single
    cap_s, cap_m = 16384, 2048
    spos, sval, mids, mbase, ns, nm = scan_tail_streams(
        stat, base, thr, cap_s, cap_m, interpret=True
    )
    (rpos, rval), rns = compact_multi(
        (base, jnp.int32(thr) - vsw), single, capacity=cap_s
    )
    (rmids, rmbase), rnm = compact_multi(
        (jnp.arange(nch, dtype=jnp.int32), base), multi, capacity=cap_m
    )
    ns, nm = int(ns), int(nm)
    assert (ns, nm) == (int(rns), int(rnm))
    assert np.array_equal(np.asarray(spos[:ns]), np.asarray(rpos[:ns]))
    assert np.array_equal(np.asarray(sval[:ns]), np.asarray(rval[:ns]))
    assert np.all(np.asarray(spos[ns:]) == np.int32(0x7FFFFFFF))
    assert np.array_equal(np.asarray(mids[:nm]), np.asarray(rmids[:nm]))
    assert np.array_equal(np.asarray(mbase[:nm]), np.asarray(rmbase[:nm]))


@pytest.mark.parametrize("nch,thr", [(256, 5), (1000, 5000), (300, -100),
                                     (128, 5), (4096, 9999)])
def test_roll_stats_match_oracle(rng, nch, thr):
    """Round-4 lane-roll stats kernel is a drop-in for chunk_stats_xla,
    incl. non-multiple-of-rows nch and all-match/all-miss chunks."""
    from dwarf_bench_tpu.ops.chunk_stats_pallas import (
        chunk_stats_roll_pallas,
    )

    x2 = rng.integers(-10000, 10000, (nch, 128)).astype(np.int32)
    x2[0, :] = thr - 1  # an all-match chunk (cnt = 128)
    x2[-1, :] = thr + 1 if thr < 2**31 - 2 else thr  # an all-miss chunk
    stat, base = chunk_stats_roll_pallas(
        jnp.asarray(x2), thr, rows=1024, interpret=True
    )
    est, eb = oracle(x2, thr)
    assert np.array_equal(np.asarray(stat), est)
    assert np.array_equal(np.asarray(base), eb)
