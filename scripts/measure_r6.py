"""Round-5 TPU experiments, batch 1: the bulk hash probe rebuild.

Round-4 verdict item 1: slab/cuckoo bulk probes sat at 0.057-0.077
Grows/s at 2^24 — three full-width lax.sort passes over the 2^25-element
concat (the comparison network's ~200+ compare-exchange passes). The
round-5 engine (ops/merge_lookup.merge_lookup_bitonic) keeps lax.sort
only for the two unavoidable permutation sorts (queries in, results out)
and replaces the big concat sort with a log2(N)-stage hand-built bitonic
merge against the build-time-sorted table (ops/bitonic).

Groups (run as `python scripts/measure_r6.py p0 p1 ...`):

  p0: legacy merge probe at 2^24 (baseline re-measure, ms scale).
  p1: bitonic probe val_bits=32 / 16 / membership, compact_first on/off.
  p2: DEVICE validation: bitonic vs legacy at 2^24 (found count + val
      checksum must agree exactly), plus hit-rate sanity (~50%).
  d1: decomposition — each pipeline stage standalone: sortQ (2-op
      num_keys=2 2^24), bitonic merge alone (2-col and 3-col, 2^25),
      cumsum+cummax scans (2^25), compaction (2^25 -> 2^24), sort2
      (2-op 2^24) and the no-compact sort2 (2-op 2^25). This is the
      costed-wall table for docs/performance.md.
  d2: lax.sort operand/width scaling at 2^24: 1-op u32, 2-op u32,
      2-op num_keys=2, 3-op stable — grounds the wall arithmetic.

  CAUTION: QUIET HOST; ms-scale kernels, so queue-k timing is valid
  (dispatch 0.13-0.30 ms is noise at 10+ ms). Remote compiles: the
  25-stage merge is one fresh shape — budget minutes on first run.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from dwarf_bench_tpu.common.device import enable_persistent_compile_cache
from dwarf_bench_tpu.utils.timing import time_amortized, timed


def _scalar(x):
    return np.asarray(jax.jit(lambda a: a.ravel()[0])(x))


def _data(n=1 << 24, seed=0):
    rng = np.random.default_rng(seed)
    keys = (rng.permutation(2 * n)[:n].astype(np.uint32) + 1)
    vals = rng.integers(1, 10000, n, endpoint=True).astype(np.uint32)
    probes = np.empty(n, np.uint32)
    probes[: n // 2] = keys[: n // 2]
    probes[n // 2:] = (
        rng.integers(0, n, n // 2).astype(np.uint32) + np.uint32(4 * n)
    )
    rng.shuffle(probes)
    return keys, vals, probes


def _table(keys, vals):
    from dwarf_bench_tpu.ops.merge_lookup import sort_table

    return jax.jit(sort_table)(jnp.asarray(keys), jnp.asarray(vals))


def p0():
    from dwarf_bench_tpu.ops.merge_lookup import merge_lookup

    keys, vals, probes = _data()
    sk, sv = _table(keys, vals)
    q = jnp.asarray(probes)
    fn = jax.jit(merge_lookup)
    _, t0 = timed(fn, sk, sv, q)  # compile+warm
    t = min(timed(fn, sk, sv, q)[1] for _ in range(3))
    n = probes.shape[0]
    print(f"p0 legacy merge_lookup 2^24: {t*1e3:.1f} ms = "
          f"{n/t/1e9:.3f} Grows/s", flush=True)


def p1():
    from dwarf_bench_tpu.ops.merge_lookup import merge_lookup_bitonic

    keys, vals, probes = _data()
    sk, sv = _table(keys, vals)
    q = jnp.asarray(probes)
    n = probes.shape[0]
    for label, kw in (
        ("v32 compact", dict(val_bits=32, compact_first=True)),
        ("v32 nocompact", dict(val_bits=32, compact_first=False)),
        ("v16 compact", dict(val_bits=16, compact_first=True)),
        ("member compact", dict(membership=True, compact_first=True)),
    ):
        fn = jax.jit(partial(merge_lookup_bitonic, **kw))
        _, _ = timed(fn, sk, sv, q)
        t = min(timed(fn, sk, sv, q)[1] for _ in range(3))
        print(f"p1 bitonic {label} 2^24: {t*1e3:.1f} ms = "
              f"{n/t/1e9:.3f} Grows/s", flush=True)


def p2():
    from dwarf_bench_tpu.ops.merge_lookup import (
        merge_lookup, merge_lookup_bitonic,
    )

    keys, vals, probes = _data()
    sk, sv = _table(keys, vals)
    q = jnp.asarray(probes)

    def digest(pair):
        f, v = pair
        w = jnp.arange(1, f.shape[0] + 1, dtype=jnp.uint32)
        v = v.astype(jnp.uint32)
        return jnp.stack([
            jnp.sum(f.astype(jnp.uint32)),
            jnp.sum(v * w),
            jnp.sum(v),
        ])

    d_leg = np.asarray(jax.jit(
        lambda a, b, c: digest(merge_lookup(a, b, c)))(sk, sv, q))
    for vb in (32, 16):
        d_bit = np.asarray(jax.jit(
            lambda a, b, c: digest(
                merge_lookup_bitonic(a, b, c, val_bits=vb)))(sk, sv, q))
        ok = np.array_equal(d_leg, d_bit)
        print(f"p2 v{vb} digest legacy={d_leg.tolist()} "
              f"bitonic={d_bit.tolist()} -> "
              f"{'OK' if ok else 'MISMATCH'}", flush=True)
        assert ok
    nhit = int(d_leg[0])
    print(f"p2 hits {nhit} / {q.shape[0]} (expect ~50%)", flush=True)


def p3():
    """Device-side bisect of the p2 value mismatch (found agreed, vals
    did not): c1 device-cumsum exactness, c2 engine A/B at 2^20 with
    compaction on/off, c3 compact_mask_pallas vs compact_multi."""
    from dwarf_bench_tpu.ops.merge_lookup import (
        merge_lookup, merge_lookup_bitonic,
    )

    rng = np.random.default_rng(7)
    # c1: cumsum uint32 exactness at 2^25 — sampled vs host numpy
    n = 1 << 25
    X = rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32)
    x = jnp.asarray(X)
    cs = jax.jit(lambda v: jnp.cumsum(v, dtype=jnp.uint32))(x)
    host = np.cumsum(X, dtype=np.uint32)
    bad = 0
    for i in (0, 1, 127, 8191, 65536, 1 << 20, (1 << 24) + 3, n - 1):
        got = int(np.asarray(jax.jit(lambda a, j: a[j])(cs, i)))
        if got != int(host[i]):
            bad += 1
            print(f"p3 c1 cumsum MISMATCH at {i}: {got} vs {int(host[i])}",
                  flush=True)
    print(f"p3 c1 cumsum u32 sampled mismatches: {bad}", flush=True)

    # c1b: cummax uint32 exactness (large values)
    cm = jax.jit(jax.lax.cummax)(x)
    hostm = np.maximum.accumulate(X)
    badm = 0
    for i in (0, 8191, 1 << 20, n - 1):
        got = int(np.asarray(jax.jit(lambda a, j: a[j])(cm, i)))
        if got != int(hostm[i]):
            badm += 1
    print(f"p3 c1b cummax u32 sampled mismatches: {badm}", flush=True)

    # c2: engine A/B at 2^20, compact on/off
    nt = nq = 1 << 20
    keys = (rng.permutation(2 * nt)[:nt].astype(np.uint32) + 1)
    vals = rng.integers(0, 1 << 32, nt, dtype=np.uint64).astype(np.uint32)
    probes = np.concatenate([
        keys[: nq // 2],
        rng.integers(0, nt, nq // 2).astype(np.uint32) + np.uint32(4 * nt),
    ])
    rng.shuffle(probes)
    sk, sv = _table(keys, vals)
    q = jnp.asarray(probes)

    def digest(pair):
        f, v = pair
        w = jnp.arange(1, f.shape[0] + 1, dtype=jnp.uint32)
        v = v.astype(jnp.uint32)
        return jnp.stack([jnp.sum(f.astype(jnp.uint32)), jnp.sum(v * w)])

    d_leg = np.asarray(jax.jit(
        lambda a, b, c: digest(merge_lookup(a, b, c)))(sk, sv, q))
    for cf in (False, True):
        d_bit = np.asarray(jax.jit(
            lambda a, b, c: digest(merge_lookup_bitonic(
                a, b, c, compact_first=cf)))(sk, sv, q))
        print(f"p3 c2 compact={cf}: legacy={d_leg.tolist()} "
              f"bitonic={d_bit.tolist()} "
              f"{'OK' if np.array_equal(d_leg, d_bit) else 'MISMATCH'}",
              flush=True)

    # c3: compact engines A/B on a 50% mask (2 cols)
    from dwarf_bench_tpu.ops.compact_pallas import compact_mask_pallas
    from dwarf_bench_tpu.ops.primitives import compact_multi

    m = 1 << 21
    colA = jnp.asarray(
        rng.integers(0, 1 << 32, m, dtype=np.uint64).astype(np.uint32))
    colB = jnp.asarray(
        rng.integers(0, 1 << 32, m, dtype=np.uint64).astype(np.uint32))
    # ~40% density so the 2^20 capacity is not overrun (garbage past
    # count is allowed to differ between the engines)
    mask = jnp.asarray((rng.integers(0, 10, m) < 4))

    def dig2(cols, cnt):
        a, b = (c.astype(jnp.uint32) for c in cols)
        w = jnp.arange(1, a.shape[0] + 1, dtype=jnp.uint32)
        keep = jnp.arange(a.shape[0]) < cnt
        a = jnp.where(keep, a, 0)
        b = jnp.where(keep, b, 0)
        return jnp.stack([jnp.sum(a * w), jnp.sum(b * w),
                          cnt.astype(jnp.uint32)])

    dp = np.asarray(jax.jit(lambda ms, a, b: dig2(
        *compact_mask_pallas(ms, (a, b), capacity=1 << 20)))(
            mask, colA, colB))
    dm = np.asarray(jax.jit(lambda ms, a, b: dig2(
        *compact_multi((a, b), ms, capacity=1 << 20)))(
            mask, colA, colB))
    print(f"p3 c3 compact pallas={dp.tolist()} multi={dm.tolist()} "
          f"{'OK' if np.array_equal(dp, dm) else 'MISMATCH'}", flush=True)


def p4():
    """Bisect the compact_mask_pallas 2-col corruption (p3 c3): onset
    size, column count, and the shape of the first divergence."""
    from dwarf_bench_tpu.ops.compact_pallas import compact_mask_pallas
    from dwarf_bench_tpu.ops.primitives import compact_multi

    rng = np.random.default_rng(11)
    for lg in (15, 17, 19, 21):
        m = 1 << lg
        cap = 1 << (lg - 1)
        colA = jnp.asarray(
            rng.integers(0, 1 << 32, m, dtype=np.uint64).astype(np.uint32)
            .astype(np.int32))
        colB = jnp.asarray(
            rng.integers(0, 1 << 32, m, dtype=np.uint64).astype(np.uint32)
            .astype(np.int32))
        mask = jnp.asarray((rng.integers(0, 10, m) < 4))
        for nc in (1, 2):
            cols = (colA,) if nc == 1 else (colA, colB)
            p_out, p_cnt = jax.jit(partial(
                compact_mask_pallas, capacity=cap))(mask, cols)
            m_out, m_cnt = jax.jit(partial(
                compact_multi, capacity=cap))(cols, mask)
            stat = []
            for ci in range(nc):
                keep = jnp.arange(cap) < p_cnt
                diff = jnp.where(
                    keep, (p_out[ci] != m_out[ci]).astype(jnp.int32), 0)
                nbad = int(_scalar(jnp.sum(diff).reshape(1)))
                first = int(_scalar(jnp.argmax(diff).reshape(1)))
                stat.append((nbad, first))
            print(f"p4 m=2^{lg} ncols={nc} cnt={int(_scalar(p_cnt.reshape(1)))}"
                  f" bad/first per col: {stat}", flush=True)
            if nc == 2 and stat[1][0]:
                f0 = stat[1][1]
                for j in range(max(0, f0 - 2), min(cap, f0 + 4)):
                    pv = int(_scalar(p_out[1][j].reshape(1)))
                    mv = int(_scalar(m_out[1][j].reshape(1)))
                    print(f"p4   colB[{j}]: pallas={pv & 0xFFFFFFFF:#x} "
                          f"ref={mv & 0xFFFFFFFF:#x}", flush=True)


def d1():
    from dwarf_bench_tpu.ops.bitonic import merge_bitonic

    rng = np.random.default_rng(1)
    nq = 1 << 24
    N = 1 << 25
    q = jnp.asarray(rng.integers(0, 1 << 32, nq, dtype=np.uint64)
                    .astype(np.uint32))
    qi = jnp.arange(nq, dtype=jnp.uint32)

    t = time_amortized(
        jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=2,
                                          is_stable=False)), q, qi)
    print(f"d1 sortQ (2-op nk2 2^24): {t*1e3:.2f} ms", flush=True)

    # bitonic merge alone on synthetic bitonic input (asc ‖ desc)
    big = jnp.asarray(rng.integers(0, 1 << 32, N, dtype=np.uint64)
                      .astype(np.uint32))
    asc = jax.jit(lambda v: jax.lax.sort(v))(big[: N // 2])
    desc = jnp.flip(jax.jit(lambda v: jax.lax.sort(v))(big[N // 2:]))
    kb = jnp.concatenate([asc, desc])
    aux = jnp.arange(N, dtype=jnp.uint32)
    extra = jnp.flip(aux)
    f2 = jax.jit(lambda k, a: merge_bitonic((k, a), num_cmp=2))
    f3 = jax.jit(lambda k, a, e: merge_bitonic((k, a, e), num_cmp=2))
    t2 = time_amortized(f2, kb, aux)
    print(f"d1 merge 2-col 2^25: {t2*1e3:.2f} ms", flush=True)
    t3 = time_amortized(f3, kb, aux, extra)
    print(f"d1 merge 3-col 2^25: {t3*1e3:.2f} ms", flush=True)

    m = jax.jit(lambda v: jnp.cumsum(v, dtype=jnp.uint32))
    t = time_amortized(m, kb)
    print(f"d1 cumsum u32 2^25: {t*1e3:.2f} ms", flush=True)
    t = time_amortized(jax.jit(jax.lax.cummax), kb)
    print(f"d1 cummax u32 2^25: {t*1e3:.2f} ms", flush=True)

    mask = (aux & 1) == 0  # 50% dense mask
    from dwarf_bench_tpu.ops.compact_pallas import compact_mask_pallas
    fc = jax.jit(partial(compact_mask_pallas, capacity=nq))
    t = time_amortized(fc, mask, (kb, aux))
    print(f"d1 compact 2^25->2^24 (2 cols): {t*1e3:.2f} ms", flush=True)

    s2 = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=1,
                                           is_stable=False))
    t = time_amortized(s2, q, qi)
    print(f"d1 sort2 (2-op 2^24): {t*1e3:.2f} ms", flush=True)
    t = time_amortized(s2, kb, aux)
    print(f"d1 sort2-nocompact (2-op 2^25): {t*1e3:.2f} ms", flush=True)


def d1m():
    """Pallas two-phase merge alone at 2^25 (vs d1's XLA 101/159 ms)."""
    from dwarf_bench_tpu.ops.bitonic_pallas import merge_bitonic_pallas

    rng = np.random.default_rng(1)
    N = 1 << 25
    big = jnp.asarray(rng.integers(0, 1 << 32, N, dtype=np.uint64)
                      .astype(np.uint32))
    asc = jax.jit(lambda v: jax.lax.sort(v))(big[: N // 2])
    desc = jnp.flip(jax.jit(lambda v: jax.lax.sort(v))(big[N // 2:]))
    kb = jnp.concatenate([asc, desc])
    aux = jnp.arange(N, dtype=jnp.uint32)
    extra = jnp.flip(aux)
    f2 = jax.jit(lambda k, a: merge_bitonic_pallas((k, a), num_cmp=2))
    f3 = jax.jit(
        lambda k, a, e: merge_bitonic_pallas((k, a, e), num_cmp=2))
    # device validation vs the XLA network
    from dwarf_bench_tpu.ops.bitonic import merge_bitonic
    ref = jax.jit(lambda k, a: merge_bitonic((k, a), num_cmp=2))(kb, aux)
    got = f2(kb, aux)
    mm = int(_scalar(sum(
        jnp.sum((r != g).astype(jnp.int32)) for r, g in zip(ref, got)
    ).reshape(1)))
    print(f"d1m pallas-vs-xla merge mismatches: {mm}", flush=True)
    t2 = time_amortized(f2, kb, aux)
    print(f"d1m pallas merge 2-col 2^25: {t2*1e3:.2f} ms", flush=True)
    t3 = time_amortized(f3, kb, aux, extra)
    print(f"d1m pallas merge 3-col 2^25: {t3*1e3:.2f} ms", flush=True)


def d1f():
    """merge_fill_pallas standalone at 2^25 (never measured — the p1
    end-to-end exceeds the other stages' sum by ~30 ms)."""
    from dwarf_bench_tpu.ops.merge_fill_pallas import merge_fill_pallas

    rng = np.random.default_rng(5)
    N = 1 << 25
    sk = jnp.asarray(np.sort(
        rng.integers(0, 1 << 32, N, dtype=np.uint64).astype(np.uint32)))
    sa = jnp.asarray(
        rng.integers(0, 1 << 32, N, dtype=np.uint64).astype(np.uint32))
    dv = jnp.asarray(
        rng.integers(0, 1 << 32, N, dtype=np.uint64).astype(np.uint32))
    for label, kw, use_dv in (
        ("v16", dict(val16=True), False),
        ("v32", dict(), True),
        ("member", dict(membership=True), False),
    ):
        fn = jax.jit(partial(merge_fill_pallas, nq=N // 2, **kw))
        args = (sk, sa, dv if use_dv else None)
        t = time_amortized(fn, *args)
        print(f"d1f fill {label} 2^25: {t*1e3:.2f} ms", flush=True)


def j1():
    """Wide-key CSR probe: probe_merge_bitonic vs probe_merge on device
    (validation digest + A/B timing) at 2^20 distinct keys (1-to-many,
    x4 rows) and 2^21 queries — the JoinOmnisci general path."""
    from dwarf_bench_tpu.ops import csr_join

    rng = np.random.default_rng(13)
    nd = 1 << 20
    n = nd * 4
    nq = 1 << 21
    pool = rng.choice(1 << 30, nd, replace=False).astype(np.uint32)
    a = rng.choice(pool, n).astype(np.uint32)
    q = np.concatenate([
        rng.choice(pool, nq // 2).astype(np.uint32),
        rng.integers(1 << 30, 1 << 31, nq // 2).astype(np.uint32),
    ])
    rng.shuffle(q)
    da, dq = jnp.asarray(a), jnp.asarray(q)
    t = jax.jit(partial(csr_join.build, distinct_cap=1 << 20,
                        ht_size=1 << 22))(da)

    def digest(r):
        w = jnp.arange(1, nq + 1, dtype=jnp.uint32)
        return jnp.stack([
            jnp.sum(r.found.astype(jnp.uint32)),
            jnp.sum(r.pos.astype(jnp.uint32) * w),
            jnp.sum(r.counts.astype(jnp.uint32) * w),
        ])

    d0 = np.asarray(jax.jit(
        lambda tt, qq: digest(csr_join.probe_merge(tt, qq)))(t, dq))
    d1_ = np.asarray(jax.jit(
        lambda tt, qq: digest(csr_join.probe_merge_bitonic(tt, qq)))(
            t, dq))
    ok = np.array_equal(d0, d1_)
    print(f"j1 digest merge={d0.tolist()} bitonic={d1_.tolist()} "
          f"{'OK' if ok else 'MISMATCH'}", flush=True)
    assert ok
    for label, fn in (("probe_merge", csr_join.probe_merge),
                      ("probe_merge_bitonic",
                       csr_join.probe_merge_bitonic)):
        f = jax.jit(fn)
        _, _ = timed(f, t, dq)
        tt = time_amortized(f, t, dq)
        print(f"j1 {label} 2^20d/2^21q: {tt*1e3:.2f} ms = "
              f"{nq/tt/1e9:.3f} Gprobes/s", flush=True)


def d1g():
    """Glue attribution: the v16 pipeline sums 35+9+5+13+32 = 94 ms of
    stages but measures 117 end-to-end — time ablated prefixes."""
    from dwarf_bench_tpu.ops.bitonic_pallas import merge_bitonic_pallas
    from dwarf_bench_tpu.ops.merge_fill_pallas import merge_fill_pallas

    keys, vals, probes = _data()
    sk_t, sv_t = _table(keys, vals)
    q = jnp.asarray(probes)
    nq = probes.shape[0]
    TAG = np.uint32(0x80000000)

    def upto_sortq(tk, tv, qq):
        qi = jnp.arange(nq, dtype=jnp.uint32)
        qs, qidx = jax.lax.sort((qq, qi), num_keys=2, is_stable=False)
        return jnp.sum(qs) + jnp.sum(qidx)

    def upto_merge(tk, tv, qq):
        qi = jnp.arange(nq, dtype=jnp.uint32)
        qs, qidx = jax.lax.sort((qq, qi), num_keys=2, is_stable=False)
        dv = (tv - jnp.roll(tv, 1)).at[0].set(tv[0])
        keys_all = jnp.concatenate([tk, jnp.flip(qs)])
        aux_all = jnp.concatenate(
            [dv & jnp.uint32(0xFFFF), jnp.flip(TAG | qidx)]
        )
        m = merge_bitonic_pallas((keys_all, aux_all), num_cmp=2)
        return jnp.sum(m[0]) + jnp.sum(m[1])

    def upto_fill(tk, tv, qq):
        qi = jnp.arange(nq, dtype=jnp.uint32)
        qs, qidx = jax.lax.sort((qq, qi), num_keys=2, is_stable=False)
        dv = (tv - jnp.roll(tv, 1)).at[0].set(tv[0])
        keys_all = jnp.concatenate([tk, jnp.flip(qs)])
        aux_all = jnp.concatenate(
            [dv & jnp.uint32(0xFFFF), jnp.flip(TAG | qidx)]
        )
        m = merge_bitonic_pallas((keys_all, aux_all), num_cmp=2)
        dest, val = merge_fill_pallas(m[0], m[1], None, nq, val16=True)
        return jnp.sum(dest) + jnp.sum(val)

    for label, fn in (("sortQ", upto_sortq), ("merge", upto_merge),
                      ("fill", upto_fill)):
        f = jax.jit(fn)
        _, _ = timed(f, sk_t, sv_t, q)
        t = min(timed(f, sk_t, sv_t, q)[1] for _ in range(3))
        print(f"d1g upto-{label}: {t*1e3:.1f} ms", flush=True)


def d1c():
    """compact_mask_pallas tile sweep at 2^25 -> 2^24 (the 14.31 ms
    reading at tile=2048 looks op-bound, not BW-bound)."""
    from dwarf_bench_tpu.ops.compact_pallas import compact_mask_pallas

    rng = np.random.default_rng(1)
    N = 1 << 25
    colA = jnp.asarray(rng.integers(0, 1 << 32, N, dtype=np.uint64)
                       .astype(np.uint32).astype(np.int32))
    colB = jnp.asarray(rng.integers(0, 1 << 32, N, dtype=np.uint64)
                       .astype(np.uint32).astype(np.int32))
    mask = jnp.asarray((jnp.arange(N) & 1) == 0)
    for tile in (2048, 4096, 8192):
        fc = jax.jit(partial(compact_mask_pallas, capacity=1 << 24,
                             tile=tile))
        t = time_amortized(fc, mask, (colA, colB))
        print(f"d1c compact tile={tile}: {t*1e3:.2f} ms", flush=True)


def d2():
    rng = np.random.default_rng(2)
    n = 1 << 24
    a = jnp.asarray(rng.integers(0, 1 << 32, n, dtype=np.uint64)
                    .astype(np.uint32))
    b = jnp.arange(n, dtype=jnp.uint32)
    c = jnp.zeros((n,), jnp.uint32)
    cases = {
        "1-op": jax.jit(lambda x, y, z: jax.lax.sort((x,), num_keys=1,
                                                     is_stable=False)),
        "2-op": jax.jit(lambda x, y, z: jax.lax.sort(
            (x, y), num_keys=1, is_stable=False)),
        "2-op nk2": jax.jit(lambda x, y, z: jax.lax.sort(
            (x, y), num_keys=2, is_stable=False)),
        "3-op stable": jax.jit(lambda x, y, z: jax.lax.sort(
            (x, y, z), num_keys=1, is_stable=True)),
    }
    for label, fn in cases.items():
        t = time_amortized(fn, a, b, c)
        print(f"d2 lax.sort {label} 2^24: {t*1e3:.2f} ms", flush=True)


def s2():
    """Scan at the bench config (2^24, sel 4e-4) with the host-checked
    assume_sparse dispatch (verdict item 2): the cond tax should be gone
    — expect >= 72 G."""
    from dwarf_bench_tpu.ops import scan
    from dwarf_bench_tpu.utils.timing import time_device_looped_inplace

    rng = np.random.default_rng(0)
    n = 1 << 24
    X = rng.integers(1, 10000, n, endpoint=True).astype(np.int32)
    x = jnp.asarray(X)
    assert scan.sparse_caps_ok(X)
    for label, fn in (
        ("cond", scan.filter_sparse),
        ("assume_sparse", partial(scan.filter_sparse, assume_sparse=True)),
    ):
        t = time_device_looped_inplace(
            fn, x,
            update=lambda a, s: (a[0].at[s & 1023].set(
                1 + (s & 1) * 9999),),
            fold=lambda out: (out[0][0] ^ out[1]).astype(jnp.int32),
        )
        print(f"s2 scan {label} 2^24: {t*1e3:.3f} ms = "
              f"{n/t/1e9:.1f} Grows/s", flush=True)


def c1():
    """Cuckoo phase-split build at 2^24 (verdict item 8): wall time +
    rounds; target <= 10 s from 38.9."""
    import time as _time

    from dwarf_bench_tpu.ops import cuckoo

    rng = np.random.default_rng(0)
    n = 1 << 24
    keys = (rng.permutation(2 * n)[:n].astype(np.uint32) + 1)
    dk = jnp.asarray(keys)
    t0 = _time.time()
    tbl, t_try = timed(
        cuckoo.build, dk, 4 * n, np.uint32(0x9E3779B9),
        np.uint32(0x85EBCA6B), 256,
    )
    t_first = _time.time() - t0  # includes compile
    _, t_warm = timed(
        cuckoo.build, dk, 4 * n, np.uint32(0x9E3779B9),
        np.uint32(0x85EBCA6B), 256,
    )
    print(f"c1 cuckoo build 2^24: warm {t_warm:.2f} s (first incl "
          f"compile {t_first:.1f}) rounds={int(_scalar(tbl.rounds))} "
          f"success={bool(_scalar(tbl.success))}", flush=True)
    # device validation: every key found via the 2-probe path at h1/h2
    q = dk
    h1 = cuckoo.murmur3_32(q, tbl.seed1, 4 * n).astype(jnp.int32)
    h2 = cuckoo._hash2(q, tbl.seed2, 4 * n).astype(jnp.int32)
    miss = int(_scalar(jnp.sum(
        ((tbl.keys[h1] != q) & (tbl.keys[h2] != q)).astype(jnp.int32)
    ).reshape(1)))
    print(f"c1 unplaced-by-value: {miss}", flush=True)


def p5():
    """Slab-probe e2e at the bench config via bucket_hash.find
    (engine auto -> bitonic merge, val_bits=16)."""
    from dwarf_bench_tpu.ops import bucket_hash

    keys, vals, probes = _data()
    n = probes.shape[0]
    nb = bucket_hash.calculate_buckets_count(n)
    tbl, _ = timed(jax.jit(partial(bucket_hash.build, num_buckets=nb)),
                   jnp.asarray(keys), jnp.asarray(vals))
    dp = jnp.asarray(probes)
    fn = jax.jit(partial(bucket_hash.find, val_bits=16))
    _, _ = timed(fn, tbl, dp)
    t = min(timed(fn, tbl, dp)[1] for _ in range(3))
    print(f"p5 bucket_hash.find (bitonic v16) 2^24: {t*1e3:.1f} ms = "
          f"{n/t/1e9:.3f} Grows/s", flush=True)


def s1():
    """BASELINE config #1 at its stated 0.5 selectivity (verdict item 4):
    n = 2^20, threshold 5000 over uniform [1, 10000]. Sub-ms kernels →
    device-looped timing."""
    from dwarf_bench_tpu.ops import scan
    from dwarf_bench_tpu.ops.scan_pallas import filter_pallas
    from dwarf_bench_tpu.utils.timing import time_device_looped_inplace

    rng = np.random.default_rng(3)
    n = 1 << 20
    X = rng.integers(1, 10000, n, endpoint=True).astype(np.int32)
    x = jnp.asarray(X)
    thr = 5000
    exp_cnt = int((X < thr).sum())

    cases = {
        "filter_xla": lambda v: scan.filter_xla(v, thr),
        "filter_two_pass": lambda v: scan.filter_two_pass(v, thr),
        "filter_pallas_t2048": lambda v: filter_pallas(v, thr, tile=2048),
        "filter_pallas_t4096": lambda v: filter_pallas(v, thr, tile=4096),
    }
    for label, fn in cases.items():
        got_cnt = int(_scalar(fn(x)[1]))
        ok = got_cnt == exp_cnt
        t = time_device_looped_inplace(
            fn, x,
            update=lambda a, s: (a[0].at[s & 1023].set(
                1 + (s & 1) * 9000),),
            fold=lambda out: (out[0][0] ^ out[1]).astype(jnp.int32),
        )
        print(f"s1 {label} 2^20 sel50: {t*1e6:.1f} us = "
              f"{n/t/1e9:.2f} Grows/s count={'OK' if ok else 'BAD'}",
              flush=True)


def g1():
    """groupby_big (G = 2^16) n·G-MAC engine vs the packed-sort path
    (verdict item 3)."""
    from dwarf_bench_tpu.ops import groupby
    from dwarf_bench_tpu.utils.timing import time_device_looped_inplace

    rng = np.random.default_rng(4)
    G = 1 << 16
    for lg in (20, 22):
        n = 1 << lg
        k = jnp.asarray(rng.integers(0, G, n).astype(np.uint32))
        v = jnp.asarray(
            rng.integers(1, 10000, n, endpoint=True).astype(np.uint32)
        )
        # device validation first
        a = jax.jit(partial(groupby.groupby_sum_2level, num_groups=G))
        b = jax.jit(partial(groupby.groupby_sum_packed_sort, num_groups=G))
        mm = int(_scalar(jnp.sum((a(k, v) != b(k, v)).astype(jnp.int32))))
        print(f"g1 2^{lg} packed-sort vs 2level mismatches: {mm}",
              flush=True)
        assert mm == 0
        for label, fn in (("2level", a), ("packed_sort", b)):
            t = time_device_looped_inplace(
                fn, k, v,
                update=lambda a2, s: (a2[0], a2[1].at[s & 1023].set(
                    (1 + (s & 1)).astype(jnp.uint32))),
                fold=lambda out: (out[0] & 1).astype(jnp.int32),
            )
            print(f"g1 {label} n=2^{lg} G=2^16: {t*1e3:.3f} ms = "
                  f"{n/t/1e9:.2f} Grows/s", flush=True)


if __name__ == "__main__":
    enable_persistent_compile_cache()
    print(f"device: {jax.devices()[0]}", flush=True)
    for g in sys.argv[1:]:
        globals()[g]()
