"""Round-5 TPU experiments, batch 2: lax.sort dtype-width scaling.

The probe wall arithmetic (docs/performance.md round 5) prices every
permutation move at the measured u32 lax.sort rates (18.1/31.9/34.9 ms
for 1-op/2-op/2-op-nk2 at 2^24). The join's u16-key pair sort measured
0.868 ms at 2^20 — n log^2 n scaling predicts ~20 ms at 2^24, i.e.
~1.6x cheaper than the u32 2-op — suggesting the sort network's cost
tracks operand BYTES (16-bit lanes pack 2x per vreg). Untested at 2^24.

If real, the bulk-probe unsort (val_bits=16 path: values < 2^16 by
caller contract, sorted today as u32) can carry its value column at u16
and the wall table gains a dtype axis.

Groups (`python scripts/measure_r7.py w1 ...`):

  w1: 2-op (u32 key, u16 payload) vs (u32, u32) at 2^24 — the unsort
      candidate (key must stay u32: dest packs a 25-bit index).
  w2: 2-op (u16 key, u32 payload) + 1-op (u16,) at 2^24 — key-width
      characterization for the wall table.
  w3: A/B the val_bits=16 probe unsort stage: (dest u32, val u32) vs
      (dest u32, val u16) including the u32->u16 cast, 2^24.

  CAUTION: QUIET HOST; ms-scale kernels so queue-k timing is valid.
  Each dtype mix is a fresh remote compile — budget minutes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dwarf_bench_tpu.common.device import enable_persistent_compile_cache
from dwarf_bench_tpu.utils.timing import time_amortized

enable_persistent_compile_cache()


def _mk(n=1 << 24, seed=2):
    rng = np.random.default_rng(seed)
    k32 = jnp.asarray(
        rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32)
    )
    p32 = jnp.arange(n, dtype=jnp.uint32)
    k16 = jnp.asarray(rng.integers(0, 1 << 16, n, dtype=np.uint32)
                      .astype(np.uint16))
    p16 = jnp.asarray((np.arange(n) & 0xFFFF).astype(np.uint16))
    return k32, p32, k16, p16


def w1():
    n = 1 << 24
    k32, p32, k16, p16 = _mk(n)
    cases = {
        "2-op (u32,u32)": (jax.jit(lambda a, b: jax.lax.sort(
            (a, b), num_keys=1, is_stable=False)), (k32, p32)),
        "2-op (u32,u16)": (jax.jit(lambda a, b: jax.lax.sort(
            (a, b), num_keys=1, is_stable=False)), (k32, p16)),
    }
    for label, (fn, args) in cases.items():
        t = time_amortized(fn, *args, k=8)
        print(f"w1 lax.sort {label} 2^24: {t*1e3:.2f} ms", flush=True)


def w2():
    n = 1 << 24
    k32, p32, k16, p16 = _mk(n)
    cases = {
        "2-op (u16,u32)": (jax.jit(lambda a, b: jax.lax.sort(
            (a, b), num_keys=1, is_stable=False)), (k16, p32)),
        "1-op (u16,)": (jax.jit(lambda a, b: jax.lax.sort(
            (a,), num_keys=1, is_stable=False)), (k16, p32)),
        "1-op (u32,)": (jax.jit(lambda a, b: jax.lax.sort(
            (a,), num_keys=1, is_stable=False)), (k32, p32)),
    }
    for label, (fn, args) in cases.items():
        t = time_amortized(fn, *args, k=8)
        print(f"w2 lax.sort {label} 2^24: {t*1e3:.2f} ms", flush=True)


def w3():
    """The probe unsort stage as shipped (u32 val) vs u16-val carry,
    cast included — dest packs (qp << 1 | found), distinct, < 2^25."""
    n = 1 << 24
    rng = np.random.default_rng(3)
    dest = jnp.asarray(
        ((rng.permutation(n) << 1) | rng.integers(0, 2, n))
        .astype(np.uint32)
    )
    val = jnp.asarray(rng.integers(0, 1 << 16, n).astype(np.uint32))

    @jax.jit
    def unsort_u32(d, v):
        sd, sv = jax.lax.sort((d, v), num_keys=1, is_stable=False)
        return sd, sv

    @jax.jit
    def unsort_u16(d, v):
        sd, sv = jax.lax.sort(
            (d, v.astype(jnp.uint16)), num_keys=1, is_stable=False
        )
        return sd, sv.astype(jnp.uint32)

    for label, fn in (("u32 val", unsort_u32), ("u16 val", unsort_u16)):
        t = time_amortized(fn, dest, val, k=8)
        print(f"w3 unsort {label} 2^24: {t*1e3:.2f} ms", flush=True)
    a = unsort_u32(dest, val)
    b = unsort_u16(dest, val)
    same = bool(jax.jit(
        lambda x, y: (x[0] == y[0]).all() & (x[1] == y[1]).all()
    )(a, b))
    print(f"w3 exact match: {same}", flush=True)


def c2():
    """Cuckoo build phase-switch threshold sweep at 2^24 (late round 5).

    Phase-1 FULL rounds cost ~4 serialized O(n) scatter/gather passes
    each; phase-2 active rounds at cap=c cost O(c) + one O(size) claims
    zeroing. Round 1 (all keys on h1, 4x slots) leaves ~1 - 4(1-e^-1/4)
    = ~11.5% unplaced, so cap = n/8 should switch after ONE full round
    vs 2-4 at the shipped n/128. Warm build + 2-probe validation per
    cap."""
    import time as _time

    from dwarf_bench_tpu.ops import cuckoo

    rng = np.random.default_rng(0)
    n = 1 << 24
    keys = (rng.permutation(2 * n)[:n].astype(np.uint32) + 1)
    dk = jnp.asarray(keys)

    from dwarf_bench_tpu.utils.timing import timed

    for label, cap in (("n>>7 (shipped)", n >> 7), ("n>>4", n >> 4),
                       ("n>>3", n >> 3)):
        tbl, _ = timed(
            cuckoo.build, dk, 4 * n, np.uint32(0x9E3779B9),
            np.uint32(0x85EBCA6B), 256, None, cap,
        )  # compile + first run
        _, t_warm = timed(
            cuckoo.build, dk, 4 * n, np.uint32(0x9E3779B9),
            np.uint32(0x85EBCA6B), 256, None, cap,
        )
        h1 = cuckoo.murmur3_32(dk, tbl.seed1, 4 * n).astype(jnp.int32)
        h2 = cuckoo._hash2(dk, tbl.seed2, 4 * n).astype(jnp.int32)
        miss = int(np.asarray(jax.jit(lambda a, b, c: jnp.sum(
            ((a[b] != dk) & (a[c] != dk)).astype(jnp.int32)
        ).reshape(1))(tbl.keys, h1, h2))[0])
        rounds = int(np.asarray(jax.jit(lambda r: r.reshape(1))(
            tbl.rounds))[0])
        ok = bool(np.asarray(jax.jit(lambda s: s.reshape(1))(
            tbl.success))[0])
        print(f"c2 cap={label}: warm {t_warm:.2f} s rounds={rounds} "
              f"success={ok} unplaced-by-value={miss}", flush=True)


def c3():
    """Cascaded active-set caps (n/8 -> n/128 tail stage) at 2^24:
    warm build + validation vs the single-stage c2 numbers."""
    from dwarf_bench_tpu.ops import cuckoo
    from dwarf_bench_tpu.utils.timing import timed

    rng = np.random.default_rng(0)
    n = 1 << 24
    keys = (rng.permutation(2 * n)[:n].astype(np.uint32) + 1)
    dk = jnp.asarray(keys)
    tbl, _ = timed(
        cuckoo.build, dk, 4 * n, np.uint32(0x9E3779B9),
        np.uint32(0x85EBCA6B), 256,
    )
    _, t_warm = timed(
        cuckoo.build, dk, 4 * n, np.uint32(0x9E3779B9),
        np.uint32(0x85EBCA6B), 256,
    )
    h1 = cuckoo.murmur3_32(dk, tbl.seed1, 4 * n).astype(jnp.int32)
    h2 = cuckoo._hash2(dk, tbl.seed2, 4 * n).astype(jnp.int32)
    miss = int(np.asarray(jax.jit(lambda a, b, c: jnp.sum(
        ((a[b] != dk) & (a[c] != dk)).astype(jnp.int32)
    ).reshape(1))(tbl.keys, h1, h2))[0])
    rounds = int(np.asarray(jax.jit(lambda r: r.reshape(1))(
        tbl.rounds))[0])
    ok = bool(np.asarray(jax.jit(lambda s: s.reshape(1))(
        tbl.success))[0])
    print(f"c3 cascade: warm {t_warm:.2f} s rounds={rounds} "
          f"success={ok} unplaced-by-value={miss}", flush=True)


def c4():
    """Decompose the remaining full-set round: each serialized n-pass
    primitive at n=2^24 keys into a 2^26 table, plus one fused round
    body — names where the ~2.7 s warm build goes."""
    from dwarf_bench_tpu.ops.cuckoo import murmur3_32, _hash2, _rot_priority

    rng = np.random.default_rng(0)
    n = 1 << 24
    size = 4 * n
    keys = jnp.asarray(rng.permutation(2 * n)[:n].astype(np.uint32) + 1)
    s1, s2 = np.uint32(0x9E3779B9), np.uint32(0x85EBCA6B)
    h1 = jax.jit(lambda k: murmur3_32(k, s1, size).astype(jnp.int32))(keys)
    idx = jnp.arange(n, dtype=jnp.int32)
    pr = jax.jit(lambda i: _rot_priority(i, jnp.int32(0)))(idx)
    table = jnp.full((size,), np.uint32(0xFFFFFFFF), dtype=jnp.uint32)

    cases = {
        "claims scatter-max n->4n": jax.jit(
            lambda c, p: jnp.zeros((size,), jnp.uint32).at[c].max(
                p, mode="drop")),
        "gather claims[cand]": jax.jit(lambda t, c: t[c]),
        "table scatter set": jax.jit(
            lambda t, c, k: t.at[c].set(k, mode="drop")),
        "murmur pair": jax.jit(lambda k: (
            murmur3_32(k, s1, size), _hash2(k, s2, size))),
    }
    claims = cases["claims scatter-max n->4n"](h1, pr)
    for label, fn in cases.items():
        if label == "claims scatter-max n->4n":
            t = time_amortized(fn, h1, pr, k=4)
        elif label == "gather claims[cand]":
            t = time_amortized(fn, claims, h1, k=4)
        elif label == "table scatter set":
            t = time_amortized(fn, table, h1, keys, k=4)
        else:
            t = time_amortized(fn, keys, k=4)
        print(f"c4 {label}: {t*1e3:.1f} ms", flush=True)


def c5():
    """Warm cuckoo build: host np.uint32 seeds vs device-array seeds
    (the hash_hit50 harness passes tbl.seed1/seed2 back in and reads
    ~10x the bench's warm time — is the seed aval the cause?)."""
    from dwarf_bench_tpu.ops import cuckoo
    from dwarf_bench_tpu.utils.timing import timed
    from dwarf_bench_tpu.common.datagen import make_unique_random

    n = 1 << 24
    keys = make_unique_random(n, seed=1234)
    dk = jnp.asarray(keys)
    s1, s2 = np.uint32(0x9E3779B9), np.uint32(0x85EBCA6B)
    tbl, t_host = timed(cuckoo.build, dk, 4 * n, s1, s2, 256)
    _, t_host = timed(cuckoo.build, dk, 4 * n, s1, s2, 256)
    print(f"c5 np seeds warm: {t_host:.2f} s", flush=True)
    _, t_dev = timed(cuckoo.build, dk, 4 * n, tbl.seed1, tbl.seed2, 256)
    _, t_dev = timed(cuckoo.build, dk, 4 * n, tbl.seed1, tbl.seed2, 256)
    print(f"c5 device-array seeds warm: {t_dev:.2f} s", flush=True)


if __name__ == "__main__":
    for g in sys.argv[1:] or ["w1", "w2", "w3"]:
        globals()[g]()
