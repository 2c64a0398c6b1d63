"""Filter / two-pass scan (stream compaction).

TPU-native re-derivation of the reference's scan dwarfs:
  - TwoPassScan (scan/scan.cl:3-42): pass 1 counts matches per thread chunk,
    serial exclusive prefix over per-thread counts, pass 2 scatters matches.
  - DPLScan (scan/dplscan.cpp:43-44): oneDPL copy_if.

Both filter ``x < 5`` over int columns. The two-pass structure is already the
idiomatic TPU answer to a dynamic-size output; here the "threads" are VMEM
tiles and the prefix over tile counts is a cumsum. Two implementations:

  * ``filter_xla`` — mask → cumsum → scatter-to-rank, fully fused by XLA.
  * ``filter_two_pass`` — explicit tiled two-pass using per-tile counts +
    exclusive tile offsets (mirrors the reference kernel structure but
    vectorized; still XLA ops, Pallas variant lives in scan_pallas.py).

Outputs follow the fixed-capacity + count pattern: ``(out[capacity], count)``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .primitives import compact, exclusive_cumsum

DEFAULT_THRESHOLD = 5  # reference predicate: x < 5 (scan/scan.cl:14)


@partial(jax.jit, static_argnames=("capacity",))
def filter_xla(x: jnp.ndarray, threshold=DEFAULT_THRESHOLD, capacity=None):
    """copy_if(x, x < threshold) → (out, count)."""
    return compact(x, x < threshold, capacity=capacity)


@partial(jax.jit, static_argnames=("capacity", "tile"))
def filter_two_pass(
    x: jnp.ndarray,
    threshold=DEFAULT_THRESHOLD,
    capacity: int | None = None,
    tile: int = 8192,
):
    """Two-pass tiled filter mirroring scan/scan.cl's structure.

    Pass 1: per-tile match counts. Prefix: exclusive cumsum over tile counts
    (the reference's thread-0 serial loop, scan.cl:23-31). Pass 2: each tile
    scatters its matches at ``tile_offset + rank_within_tile``.
    """
    n = x.shape[0]
    if capacity is None:
        capacity = n
    pad = (-n) % tile
    xp = jnp.pad(x, (0, pad), constant_values=jnp.asarray(threshold, x.dtype))
    tiles = xp.reshape(-1, tile)
    mask = (tiles < threshold).astype(jnp.int32)
    tile_counts = jnp.sum(mask, axis=1)  # pass 1
    tile_offsets = exclusive_cumsum(tile_counts)  # prefix
    count = tile_offsets[-1] + tile_counts[-1]
    # pass 2: global rank = tile offset + exclusive rank within the tile
    rank_in_tile = jnp.cumsum(mask, axis=1) - mask
    rank = tile_offsets[:, None] + rank_in_tile
    idx = jnp.where((mask > 0) & (rank < capacity), rank, capacity)
    out = jnp.zeros((capacity,), dtype=x.dtype)
    out = out.at[idx.reshape(-1)].set(xp, mode="drop")
    return out, count.astype(jnp.int32)


# position sentinel: sorts last. np scalar, NOT jnp — a module-level jnp
# constant initializes the XLA backend at import time (breaking
# jax.distributed.initialize ordering) and lives on the default device.
_BIG = np.int32(0x7FFFFFFF)


def sparse_caps_ok(
    x,
    threshold=DEFAULT_THRESHOLD,
    chunk: int = 128,
    cap_mc: int | None = None,
    cap_single: int | None = None,
    cap_melems: int | None = None,
) -> bool:
    """HOST-side precondition check for ``filter_sparse(assume_sparse=
    True)`` — the same host-knowledge convention as the radix range check
    and the join's ``dense_applicable`` (both mirroring the reference's
    host-side ``count_distinct``, join_omnisci.cpp:55-69). Replicates the
    on-device ``ok`` predicate exactly (chunk classification per
    ops/chunk_stats window encoding): callers that hold the host data can
    verify the caps once and skip the ``lax.cond`` fallback construct
    (0.043 ms of the 0.263 ms 2^24 filter — docs/performance.md round-4
    stage table)."""
    x = np.asarray(x)
    n = x.shape[0]
    if x.dtype != np.int32 or n >= (1 << 30):
        return False
    thr = int(threshold)
    if thr <= -(2**31) + 512:
        return False
    if cap_mc is None:
        cap_mc = max(512, n >> 15)
    if cap_single is None:
        cap_single = max(16384, n >> 10)
    if cap_melems is None:
        cap_melems = max(4096, n >> 12)
    pad = (-n) % chunk
    xp = np.pad(x, (0, pad), constant_values=thr)
    x2 = xp.reshape(-1, chunk)
    m = x2 < thr
    cnt = m.sum(axis=1)
    # window encoding (ops/chunk_stats): vsum == the match's distance only
    # when the single match lies in (thr-256, thr); out-of-window singles
    # (vsum clip 256 marker) reroute to the multi/gather path
    d = np.clip(thr - np.maximum(x2, thr - 512), 0, 256)
    vs = np.minimum(d.sum(axis=1), 511)
    single = (cnt == 1) & (vs >= 1) & (vs <= 255)
    multi = (cnt >= 1) & ~single
    total = int(cnt.sum())
    n_single = int(single.sum())
    n_multi = int(multi.sum())
    n_melems = total - n_single
    return (
        n_single <= cap_single
        and n_multi <= cap_mc
        and n_melems <= cap_melems
    )


@partial(
    jax.jit,
    static_argnames=(
        "capacity", "chunk", "cap_mc", "cap_single", "cap_melems",
        "stats_pallas", "tail_rows", "interpret", "assume_sparse",
    ),
)
def filter_sparse(
    x: jnp.ndarray,
    threshold=DEFAULT_THRESHOLD,
    capacity: int | None = None,
    chunk: int = 128,
    cap_mc: int | None = None,
    cap_single: int | None = None,
    cap_melems: int | None = None,
    stats_pallas: bool | None = None,
    tail_rows: int = 8,
    interpret: bool = False,
    assume_sparse: bool = False,
):
    """Sparsity-adaptive copy_if → (out, count).

    The reference's benchmark predicate (x < 5 over uniform [1, 10000],
    scan/scan.cl:14 + common/common.hpp:31-40) selects ~0.04% of rows, so a
    full streaming compaction does O(log tile) vector passes per element to
    move almost nothing. This engine is near read-bound at low selectivity:

      phase A (ONE fused streaming pass, ops/chunk_stats — XLA's fused
        row reductions; a Pallas MXU variant exists in
        ops/chunk_stats_pallas but measured slower END TO END, see the
        dispatch comment below): per-128-chunk match counts,
        window-clipped match sums, and the exclusive output offset. A
        chunk with exactly one match inside the 255-wide window below the
        threshold needs no second read — its value is
        ``threshold - vsum``.
      phase B (tiny): the rare chunks with ≥ 2 matches (expected
        (chunk·sel)²/2 per chunk) — plus any single-match chunk whose value
        fell outside the window — are compacted to a ≤``cap_mc`` id list,
        row-gathered, and their elements' output positions computed
        in-chunk; the ≤``cap_melems`` matching elements are then compacted
        out of the gathered rows so the ordering sort stays small.
      ordering: single values (≤``cap_single``) and multi-chunk elements
        carry explicit output positions; one small pair sort by position
        restores global order — garbage rows carry a sentinel position and
        sort past ``count``. Positions are unique so the ~1.6x faster
        unstable network is exact.

    When any cap trips (higher selectivity), a ``lax.cond`` falls back to
    the general butterfly compaction (filter_pallas / filter_two_pass), so
    the result is correct for EVERY selectivity; only the fast path is
    specialized. Requires n < 2^30 (position sentinel headroom).

    ``assume_sparse=True`` (PRECONDITION: ``sparse_caps_ok`` verified on
    the host) drops the ``lax.cond`` and runs the sparse pipeline
    unconditionally — the round-4 stage table prices the cond's fallback
    construct at 0.043 ms of the 0.263 ms 2^24 filter, pure dispatch tax
    once the host already knows the caps hold (the radix host-range-check
    convention). Callers with host-unknown data keep the default runtime
    dispatch.

    ``chunk`` must be 128 (one vreg row / the fused kernel's tile width).
    """
    n = x.shape[0]
    assert chunk == 128, "filter_sparse chunks are one vreg row"
    if capacity is None:
        capacity = n
    if x.dtype != jnp.int32 or n >= (1 << 30):
        # the fused phase-A kernel's window arithmetic is int32 (the
        # reference filters int columns, scan/scan.cl:3); other dtypes and
        # huge n (position sentinel headroom) take the general engine
        if jax.default_backend() != "cpu":
            from .scan_pallas import filter_pallas

            return filter_pallas(x, threshold, capacity=capacity)
        return filter_two_pass(x, threshold, capacity=capacity)
    if cap_mc is None:
        # expected multi-match chunks at benchmark selectivity s=4e-4 is
        # (chunk·s)²/2 per chunk ≈ n/2^17; scale caps with n so the fast
        # path holds across the reference's sweep sizes (up to 2^27 rows)
        cap_mc = max(512, n >> 15)
    if cap_single is None:
        cap_single = max(16384, n >> 10)
    if cap_melems is None:
        cap_melems = max(4096, n >> 12)
    on_accel = jax.default_backend() != "cpu"

    pad = (-n) % chunk
    xp = jnp.pad(x, (0, pad), constant_values=jnp.asarray(0, x.dtype))
    if pad:
        # padded tail must not match: overwrite with threshold (x < x false)
        tail_is_pad = jnp.arange(xp.shape[0]) >= n
        xp = jnp.where(tail_is_pad, jnp.asarray(threshold, x.dtype), xp)
    nch = xp.shape[0] // chunk
    thr_i = jnp.asarray(threshold, jnp.int32)
    # Round-3 path (accelerators): phase A stays the XLA fused
    # reductions — quiet-host standalone at 2^24: 0.180 ms (XLA) vs
    # 0.218 (round-2 Pallas) vs 0.316 (the round-3 single-packed-dot
    # chunk_stats_fused, kept as a documented negative result) — and the
    # tail classification + BOTH chunk-level compactions collapse into
    # ONE streaming kernel (scan_tail_pallas.scan_tail_streams, the
    # carry-buffer machinery; the single-step merge-tree variant
    # measured 0.377 ms standalone and is likewise kept only as a
    # negative result). Interleaved e2e A/B at 2^24: THIS path
    # 0.239-0.244 ms vs the round-2 multi-dispatch path 0.310-0.313 —
    # a 1.3x end-to-end win. Numbers: scripts/measure_r4.py g10/g12.
    use_fused = (
        jax.default_backend() != "cpu" or interpret
    ) and stats_pallas is None
    if use_fused:
        from .chunk_stats import chunk_stats_xla

        stat, base = chunk_stats_xla(
            xp.reshape(nch, chunk).astype(jnp.int32), thr_i
        )
    elif stats_pallas:
        from .chunk_stats_pallas import chunk_stats_pallas

        stat, base = chunk_stats_pallas(
            xp.reshape(nch, chunk).astype(jnp.int32), thr_i,
            interpret=interpret,
        )
    else:
        from .chunk_stats import chunk_stats_xla

        stat, base = chunk_stats_xla(
            xp.reshape(nch, chunk).astype(jnp.int32), thr_i
        )
    cnt = stat >> 9
    vsw = stat & 511
    total = (base[-1] + cnt[-1]).astype(jnp.int32)
    if use_fused:
        from .scan_tail_pallas import scan_tail_streams

        spos_k, sval_k, mids_k, mbase_k, n_single, n_multi = (
            scan_tail_streams(
                stat, base, thr_i, cap_single, cap_mc, rows=tail_rows,
                interpret=interpret
            )
        )
    else:
        # in-window singles are fully described by phase A; out-of-window
        # singles (vsw == 256 marker or a wrapped-threshold 0) join the
        # gather path, which reads true values
        single = (cnt == 1) & (vsw >= 1) & (vsw <= 255)
        multi = (cnt >= 1) & ~single
        n_multi = jnp.sum(multi.astype(jnp.int32))
        n_single = jnp.sum(single.astype(jnp.int32))
    n_melems = total - n_single
    ok = (
        (n_single <= cap_single)
        & (n_multi <= cap_mc)
        & (n_melems <= cap_melems)
        # threshold - 512 must not wrap in the window encoding
        & (thr_i > jnp.int32(-(2**31) + 512))
    )
    sval = thr_i - vsw  # the match value for in-window single chunks

    if use_fused:
        from .compact_pallas import compact_mask_pallas, emit_prefix_pallas

        def sparse_branch_f(xp, spos, sv, mids, mbase):
            # the chunk-level streams arrive pre-compacted from
            # scan_tail_compact; only the rare multi-chunk element work,
            # the ordering sort, and the prefix emit remain
            iota_m = jnp.arange(cap_mc, dtype=jnp.int32)
            valid_m = iota_m < n_multi
            midsafe = jnp.where(valid_m, mids, 0)
            rows = xp.reshape(nch, chunk)[midsafe]
            gm = (rows < threshold) & valid_m[:, None]
            grank = jnp.cumsum(gm.astype(jnp.int32), axis=1) - gm
            # mbase rides the multi compaction — no base[mids] gather
            gpos = jnp.where(gm, mbase[:, None] + grank, _BIG)
            (mpos, mval), _ = compact_mask_pallas(
                gm.reshape(-1),
                (gpos.reshape(-1), rows.reshape(-1).astype(jnp.int32)),
                capacity=cap_melems, interpret=interpret,
            )
            iota_e = jnp.arange(cap_melems, dtype=jnp.int32)
            mpos = jnp.where(iota_e < n_melems, mpos, _BIG)
            all_pos = jnp.concatenate([spos, mpos])
            all_val = jnp.concatenate([sv, mval])
            _, svals = jax.lax.sort(
                (all_pos, all_val), num_keys=1, is_stable=False
            )
            k = min(capacity, all_val.shape[0])
            out = emit_prefix_pallas(svals[:k], capacity,
                                     interpret=interpret)
            return out.astype(x.dtype), total

        def general_branch_f(xp, spos, sv, mids, mbase):
            from .scan_pallas import filter_pallas

            out, c = filter_pallas(
                xp[:n], threshold, capacity=capacity, interpret=interpret
            )
            return out.astype(x.dtype), c

        if assume_sparse:
            return sparse_branch_f(xp, spos_k, sval_k, mids_k, mbase_k)
        return jax.lax.cond(
            ok, sparse_branch_f, general_branch_f,
            xp, spos_k, sval_k, mids_k, mbase_k,
        )

    def sparse_branch(xp, base, sval, single, multi):
        if on_accel:
            from .compact_pallas import compact_mask_pallas

            def compact2(mask, vals, cap):
                out, _ = compact_mask_pallas(
                    mask, vals, capacity=cap, interpret=interpret
                )
                return out
        else:
            from .primitives import compact_multi

            def compact2(mask, vals, cap):
                out, _ = compact_multi(vals, mask, capacity=cap)
                return out

        spos, sv = compact2(single, (base, sval), cap_single)
        iota_s = jnp.arange(cap_single, dtype=jnp.int32)
        spos = jnp.where(iota_s < n_single, spos, _BIG)

        (mids,) = compact2(
            multi, (jnp.arange(nch, dtype=jnp.int32),), cap_mc
        )
        iota_m = jnp.arange(cap_mc, dtype=jnp.int32)
        valid_m = iota_m < n_multi
        midsafe = jnp.where(valid_m, mids, 0)
        rows = xp.reshape(nch, chunk)[midsafe]  # (cap_mc, chunk) row gather
        gm = (rows < threshold) & valid_m[:, None]
        grank = jnp.cumsum(gm.astype(jnp.int32), axis=1) - gm
        gpos = jnp.where(gm, base[midsafe][:, None] + grank, _BIG)

        # compact the ≤cap_melems real matches out of the gathered rows so
        # the ordering sort is over caps ~25x smaller than cap_mc * chunk
        mpos, mval = compact2(
            gm.reshape(-1),
            (gpos.reshape(-1), rows.reshape(-1).astype(jnp.int32)),
            cap_melems,
        )
        iota_e = jnp.arange(cap_melems, dtype=jnp.int32)
        mpos = jnp.where(iota_e < n_melems, mpos, _BIG)

        all_pos = jnp.concatenate([spos, mpos])
        all_val = jnp.concatenate([sv, mval])
        # valid positions are unique (one output slot each) and sentinel
        # rows are garbage, so the unstable network (~1.6x faster) is exact
        _, svals = jax.lax.sort(
            (all_pos, all_val), num_keys=1, is_stable=False
        )
        k = min(capacity, all_val.shape[0])
        if on_accel:
            from .compact_pallas import emit_prefix_pallas

            # leaves out[k:] untouched — garbage past count by contract,
            # saving the O(capacity) zero-fill
            out = emit_prefix_pallas(
                svals[:k], capacity, interpret=interpret
            )
        else:
            out = jnp.zeros((capacity,), jnp.int32).at[:k].set(svals[:k])
        return out.astype(x.dtype), total

    def general_branch(xp, base, sval, single, multi):
        if on_accel:
            from .scan_pallas import filter_pallas

            out, c = filter_pallas(
                xp[:n], threshold, capacity=capacity, interpret=interpret
            )
        else:
            out, c = filter_two_pass(xp[:n], threshold, capacity=capacity)
        return out.astype(x.dtype), c

    if assume_sparse:
        return sparse_branch(xp, base, sval, single, multi)
    return jax.lax.cond(
        ok, sparse_branch, general_branch, xp, base, sval, single, multi
    )


def filter_oracle(x, threshold=DEFAULT_THRESHOLD):
    """Host oracle: std::copy_if equivalent (scan/scan.cpp:12-17)."""
    import numpy as np

    x = np.asarray(x)
    return x[x < threshold]
