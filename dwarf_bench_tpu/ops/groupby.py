"""Group-by sum aggregation.

The reference aggregates with a CAS + fetch_add hash table
(groupby/groupby.cpp:58-93 via NonOwningHashTableNonBitmask::add,
hashtable.hpp:136-153) and a partitioned variant where each executor owns a
private table merged serially afterwards (groupby/groupby_local.cpp:58-112).
Keys are dense in [0, groups_count), so the observable output is a dense
``output[groups_count]`` sum array.

TPU re-derivations (no atomics):

  * ``groupby_sum_matmul`` — per-tile one-hot matmul on the MXU:
    ``acc += onehot(keys_tile) @ vals_tile``. Exactness: with 1024-row tiles,
    each f32 partial sum is ≤ 1024·10000 < 2^24, so every f32 add is exact;
    tile partials are accumulated in int32 (wrapping like the C++ uint32
    oracle). The fastest path for small-to-medium group counts — the
    aggregation rides the systolic array instead of scattered memory.
  * ``groupby_sum_sorted`` — sort rows by key, then per-segment sums from
    differences of an inclusive cumsum (wrap-exact in int32), scattered to
    the dense output at unique indices. Scales to large group counts.
  * ``groupby_sum_scatter`` — single scatter-add; XLA's fallback lowering.

  * ``groupby_local`` — the partitioned shape: rows are split into
    ``executors`` contiguous chunks (groupby_local.cpp:66-70); each chunk
    produces a private dense partial (vmapped one-hot matmul = the
    LinearHashtable per executor), then partials are tree-reduced over the
    executor axis (the reference's serial merge, groupby_local.cpp:87-112).
    Returns both stages separately so the dwarf can time group vs. reduce.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_TILE = 1024  # keeps f32 one-hot partial sums exact: 1024 * 10000 < 2^24


@partial(jax.jit, static_argnames=("num_groups",))
def groupby_sum_matmul(keys: jnp.ndarray, vals: jnp.ndarray, num_groups: int):
    n = keys.shape[0]
    pad = (-n) % _TILE
    k = jnp.pad(keys.astype(jnp.int32), (0, pad), constant_values=num_groups)
    v = jnp.pad(vals.astype(jnp.int32), (0, pad))
    kt = k.reshape(-1, _TILE)
    vt = v.reshape(-1, _TILE).astype(jnp.float32)

    def tile_partial(kt_i, vt_i):
        onehot = (kt_i[:, None] == jnp.arange(num_groups)[None, :]).astype(
            jnp.float32
        )
        # (1, TILE) @ (TILE, G) on the MXU; exact in f32 (partials < 2^24).
        # HIGHEST is REQUIRED on TPU: the default truncates the f32 value
        # operand to bf16 (8-bit mantissa), silently rounding any value
        # past 256 (the Mosaic/XLA-TPU default-precision hazard caught by
        # the small-grid radix sweep; docs/performance.md round 3).
        return (
            jnp.matmul(
                vt_i[None, :], onehot,
                precision=jax.lax.Precision.HIGHEST,
            )[0]
        ).astype(jnp.int32)

    partials = jax.vmap(tile_partial)(kt, vt)  # (tiles, G) int32
    return jnp.sum(partials, axis=0, dtype=jnp.int32).astype(jnp.uint32)


_BF16_TILE = 8192  # exactness: 127 * 8192 < 2^24 (f32 accumulator)


@partial(jax.jit, static_argnames=("num_groups",))
def groupby_sum_matmul_bf16(
    keys: jnp.ndarray, vals: jnp.ndarray, num_groups: int
):
    """bf16 one-hot matmuls at ~4× the f32 MXU rate, exact for values
    < 2^14: split v = lo7 + hi7·2^7 (each ≤ 127, exact in bf16; products
    ≤ 127 exact; f32 accumulation keeps partials < 2^24), two matmuls,
    recombine in int32. The benchmark columns are uniform [1, 10000] so the
    precondition holds; ``groupby_sum`` falls back to the f32 path
    otherwise."""
    n = keys.shape[0]
    pad = (-n) % _BF16_TILE
    k = jnp.pad(keys.astype(jnp.int32), (0, pad), constant_values=num_groups)
    v = jnp.pad(vals.astype(jnp.int32), (0, pad))
    kt = k.reshape(-1, _BF16_TILE)
    lo = (v & 0x7F).astype(jnp.bfloat16).reshape(-1, _BF16_TILE)
    hi = (v >> 7).astype(jnp.bfloat16).reshape(-1, _BF16_TILE)

    def tile_partial(kt_i, lo_i, hi_i):
        onehot = (kt_i[:, None] == jnp.arange(num_groups)[None, :]).astype(
            jnp.bfloat16
        )
        s_lo = jnp.dot(lo_i[None, :], onehot,
                       preferred_element_type=jnp.float32)[0]
        s_hi = jnp.dot(hi_i[None, :], onehot,
                       preferred_element_type=jnp.float32)[0]
        return s_lo.astype(jnp.int32) + (s_hi.astype(jnp.int32) << 7)

    partials = jax.vmap(tile_partial)(kt, lo, hi)
    return jnp.sum(partials, axis=0, dtype=jnp.int32).astype(jnp.uint32)


def _hi_bins_for(num_groups: int) -> int:
    """Smallest power-of-two sublane width covering num_groups/128 hi
    digits (multiple of 8 for sublane tiling)."""
    hb = -(-num_groups // 128)
    return max(8, 1 << (hb - 1).bit_length())


@partial(jax.jit, static_argnames=("num_groups",))
def groupby_sum_2level(
    keys: jnp.ndarray, vals: jnp.ndarray, num_groups: int
):
    """MXU group-by for 4096 < G <= 65536 (the BASELINE.json GroupBy config
    has 2^16 distinct keys) via the two-level (hi digit / lo 7-bit digit)
    weighted histogram: sums[h, l] = Σ_t v_plane[t]·oh_hi·oh_lo with
    values split into two 7-bit bf16 planes (exact for v < 2^14). Pallas
    fused kernel on accelerators, per-tile XLA formulation on CPU."""
    assert num_groups <= 1 << 16
    hi_bins = _hi_bins_for(num_groups)
    if jax.default_backend() != "cpu":
        # int8 MXU path: 1.65x the bf16 planes at hi_bins=512 (the
        # BASELINE G=2^16 config) — scripts/measure_r3.py d6. For 256+
        # hi bins the SWAR hi-side one-hot shaves the VPU half (0.798
        # vs 0.822 ms at 2^20/hi512 — the kernel is MXU-bound on its
        # n·G plane MACs, so the margin is small; measure_r4.py g9).
        from .hist_pallas import (
            weighted_histogram_i8_pallas,
            weighted_histogram_i8_swar_pallas,
        )

        eng = (
            weighted_histogram_i8_swar_pallas
            if hi_bins >= 256
            else weighted_histogram_i8_pallas
        )
        sums = eng(
            keys.astype(jnp.int32), vals.astype(jnp.int32), hi_bins=hi_bins
        )
        return sums[:num_groups].astype(jnp.uint32)

    n = keys.shape[0]
    pad = (-n) % _BF16_TILE
    k = jnp.pad(keys.astype(jnp.int32), (0, pad),
                constant_values=np.int32(hi_bins * 128))
    v = jnp.pad(vals.astype(jnp.int32), (0, pad))
    kt = k.reshape(-1, _BF16_TILE)
    vt = v.reshape(-1, _BF16_TILE)
    cols_hi = jnp.arange(hi_bins, dtype=jnp.int32)
    cols_lo = jnp.arange(128, dtype=jnp.int32)

    def tile_partial(kt_i, vt_i):
        oh_hi = ((kt_i >> 7)[:, None] == cols_hi[None, :]).astype(
            jnp.bfloat16
        )
        oh_lo = ((kt_i & 127)[:, None] == cols_lo[None, :]).astype(
            jnp.bfloat16
        )
        out = jnp.zeros((hi_bins, 128), jnp.int32)
        for shift in (0, 7):
            vp = ((vt_i >> shift) & 0x7F).astype(jnp.bfloat16)
            s = jax.lax.dot_general(
                oh_hi * vp[:, None], oh_lo,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            out = out + (s.astype(jnp.int32) << shift)
        return out

    partials = jax.vmap(tile_partial)(kt, vt)
    sums = jnp.sum(partials, axis=0, dtype=jnp.int32).reshape(-1)
    return sums[:num_groups].astype(jnp.uint32)


@partial(jax.jit, static_argnames=("num_groups",))
def groupby_sum_packed_sort(
    keys: jnp.ndarray, vals: jnp.ndarray, num_groups: int
):
    """Round-5 alternative for the large-G regime: ONE single-operand
    unstable sort of the packed ``(key << 16) | val`` word replaces the
    n·G MXU MACs of the weighted histogram entirely — cost becomes
    O(n log^2 n) sort + O(n) streaming, INDEPENDENT of G.

    PRECONDITIONS (caller-checked): keys < 2^16 (num_groups <= 2^16) and
    vals < 2^16. Within a group the packed sort also orders by value,
    which is unobservable in a sum. Segment sums come from the cumsum
    difference at group boundaries (exact mod 2^32, the uint32 oracle's
    wrap); the <= G boundary rows are compacted and scattered to the
    dense output (a G-element scatter — tiny next to the sort).

    Reference shape: groupby/groupby.cpp:58-93 (hash aggregate). The
    1-op sort network measured 1.75x faster than 2-op at 2^20 on v5e
    (scripts/measure_r3.py d7), which is what makes this competitive
    with the MAC-wall engines at G = 2^16."""
    assert num_groups <= (1 << 16)
    n = keys.shape[0]
    packed = (
        (keys.astype(jnp.uint32) << 16) | vals.astype(jnp.uint32)
    )
    (sp,) = jax.lax.sort((packed,), num_keys=1, is_stable=False)
    k_s = (sp >> 16).astype(jnp.int32)
    v_s = (sp & jnp.uint32(0xFFFF)).astype(jnp.int32)
    cs = jnp.cumsum(v_s, dtype=jnp.int32)  # wraps mod 2^32; diffs exact
    is_end = jnp.concatenate([k_s[1:] != k_s[:-1], jnp.ones((1,), bool)])
    if jax.default_backend() != "cpu":
        from .compact_pallas import compact_mask_pallas

        (ek, ecs), cnt = compact_mask_pallas(
            is_end, (k_s, cs), capacity=num_groups
        )
    else:
        from .primitives import compact_multi

        (ek, ecs), cnt = compact_multi(
            (k_s, cs), is_end, capacity=num_groups
        )
    valid = jnp.arange(num_groups) < cnt
    prev = jnp.concatenate([jnp.zeros((1,), jnp.int32), ecs[:-1]])
    diff = ecs - prev
    out = jnp.zeros((num_groups + 1,), jnp.int32)
    out = out.at[jnp.where(valid, ek, num_groups)].set(
        jnp.where(valid, diff, 0), mode="drop"
    )
    return out[:num_groups].astype(jnp.uint32)


@partial(jax.jit, static_argnames=("num_groups",))
def groupby_sum_sorted(keys: jnp.ndarray, vals: jnp.ndarray, num_groups: int):
    n = keys.shape[0]
    # unstable: per-group sums are order-independent (mod-2^32 adds commute)
    sk, sv = jax.lax.sort(
        (keys.astype(jnp.int32), vals.astype(jnp.int32)), num_keys=1,
        is_stable=False,
    )
    cs = jnp.cumsum(sv, dtype=jnp.int32)  # wraps mod 2^32 like uint32
    # segment sum = cumsum at segment end − cumsum before segment start;
    # both scatter at UNIQUE key indices (one start/end per group)
    is_end = jnp.concatenate([sk[1:] != sk[:-1], jnp.ones((1,), bool)])
    is_start = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])
    seg_base = jnp.concatenate([jnp.zeros((1,), jnp.int32), cs[:-1]])
    out_end = jnp.zeros((num_groups + 1,), jnp.int32)
    out_base = jnp.zeros((num_groups + 1,), jnp.int32)
    out_end = out_end.at[jnp.where(is_end, sk, num_groups)].set(
        jnp.where(is_end, cs, 0), mode="drop"
    )
    out_base = out_base.at[jnp.where(is_start, sk, num_groups)].set(
        jnp.where(is_start, seg_base, 0), mode="drop"
    )
    return (out_end[:num_groups] - out_base[:num_groups]).astype(jnp.uint32)


@partial(jax.jit, static_argnames=("num_groups",))
def groupby_sum_scatter(keys: jnp.ndarray, vals: jnp.ndarray, num_groups: int):
    out = jnp.zeros((num_groups,), jnp.int32)
    return out.at[keys.astype(jnp.int32)].add(vals.astype(jnp.int32)).astype(
        jnp.uint32
    )


def groupby_sum(keys, vals, num_groups: int, vals_below_2p14: bool = False):
    """Dispatch: MXU one-hot path for small group counts (bf16 planes when
    the caller guarantees values < 2^14), two-level MXU weighted histogram
    up to 2^16 groups, sort path beyond."""
    if num_groups <= 4096:
        if vals_below_2p14:
            if jax.default_backend() != "cpu":
                # balanced-digit Pallas kernel: ga + gb ≈ 2·sqrt(G) VPU
                # compares per element instead of G (15.0 vs 10.5 Grows/s
                # at G=64, 2^22 on v5e — scripts/measure_r3.py d2)
                from .groupby_pallas import groupby_small_pallas

                return groupby_small_pallas(keys, vals, num_groups)
            return groupby_sum_matmul_bf16(keys, vals, num_groups)
        return groupby_sum_matmul(keys, vals, num_groups)
    if num_groups <= (1 << 16) and vals_below_2p14:
        return groupby_sum_2level(keys, vals, num_groups)
    return groupby_sum_sorted(keys, vals, num_groups)


@partial(jax.jit, static_argnames=("num_groups", "executors"))
def groupby_partials(
    keys: jnp.ndarray, vals: jnp.ndarray, num_groups: int, executors: int
):
    """Stage 1 of GroupByLocal: per-executor private dense partials over
    contiguous row chunks (groupby_local.cpp:58-83). Rows beyond
    ``executors * (n // executors)`` chunks are distributed like the
    reference's work-per-executor ceil split."""
    n = keys.shape[0]
    per = -(-n // executors)
    pad = executors * per - n
    k = jnp.pad(keys.astype(jnp.int32), (0, pad), constant_values=num_groups)
    v = jnp.pad(vals.astype(jnp.int32), (0, pad))
    kc = k.reshape(executors, per)
    vc = v.reshape(executors, per).astype(jnp.float32)

    def one_exec(kc_i, vc_i):
        onehot = (kc_i[:, None] == jnp.arange(num_groups)[None, :]).astype(
            jnp.float32
        )
        # HIGHEST: the value operand exceeds bf16's 256 exact-int limit
        # (see groupby_sum_matmul) — the TPU default would round it
        return (
            jnp.matmul(
                vc_i[None, :], onehot,
                precision=jax.lax.Precision.HIGHEST,
            )[0]
        ).astype(jnp.int32)

    if per > _TILE:
        # keep f32 exactness: split each chunk into ≤1024-row tiles
        tiles = -(-per // _TILE)
        padded = tiles * _TILE - per
        kc = jnp.pad(kc, ((0, 0), (0, padded)), constant_values=num_groups)
        vc = jnp.pad(vc, ((0, 0), (0, padded)))
        kc = kc.reshape(executors * tiles, _TILE)
        vc = vc.reshape(executors * tiles, _TILE)
        parts = jax.vmap(one_exec)(kc, vc)
        return jnp.sum(
            parts.reshape(executors, tiles, num_groups), axis=1,
            dtype=jnp.int32,
        )
    return jax.vmap(one_exec)(kc, vc)  # (executors, G) int32


@jax.jit
def groupby_merge(partials: jnp.ndarray):
    """Stage 2: tree-reduce executor partials (groupby_local.cpp:87-112)."""
    return jnp.sum(partials, axis=0, dtype=jnp.int32).astype(jnp.uint32)


def groupby_oracle(keys, vals, num_groups: int) -> np.ndarray:
    """Dense scalar oracle (groupby/groupby.cpp:8-19) with uint32 wrap."""
    out = np.zeros(num_groups, np.uint32)
    np.add.at(out, np.asarray(keys, np.int64), np.asarray(vals, np.uint32))
    return out
