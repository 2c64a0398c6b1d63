"""Full sort of integer columns.

Reference: sort/radix.cpp:34 delegates to oneDPL ``std::sort`` on device (the
"Radix" name notwithstanding) and sort/tbbsort.cpp:22 to TBB parallel_sort on
host. Behavior: ascending full sort of an int32 column.

TPU engines, fastest applicable first:

  * ``sort_counting`` — keys-only distribution sort for columns whose value
    range spans < 2^14 after a min-shift (the benchmark's uniform [1, 10000]
    columns qualify, common/common.hpp:31-40). No comparison network and no
    data movement of the input at all: the sorted output is a pure function
    of the 16384-bin histogram, which rides the MXU as ONE one-hot matmul
    per tile (hi/lo 7-bit planes — counts[hi, lo] = onehot(hi)^T @
    onehot(lo)). Run expansion is a 16K-element scatter of bin boundaries
    plus one streaming cumsum over the output — O(n) HBM traffic versus the
    O(n log^2 n) lane shuffles of a sort network.
  * ``sort_xla`` — XLA's optimized variadic sort network; the general
    engine and the payload-carrying engine (primitives.sort_by_key).
  * ``sort_auto`` — runtime range check on device, ``lax.cond`` dispatch
    between the two (both branches compile once; only the taken branch
    executes per call).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_HIST_TILE = 8192  # per-tile counts <= 8192 << 2^24: f32 accumulation exact
_RANGE_BITS = 14  # 2 x 7-bit planes -> one (128, 128) count matrix


@jax.jit
def sort_xla(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.sort(x)


@partial(jax.jit, static_argnames=("hi_bins",))
def histogram_16k(k: jnp.ndarray, hi_bins: int = 128) -> jnp.ndarray:
    """Exact hi_bins*128-bin histogram of int32 keys in [0, hi_bins*128)
    via bf16 one-hot matmuls on the MXU (out-of-range keys, e.g. padding,
    count nowhere).

    counts[hi, lo] = #rows with k>>7 == hi and k&127 == lo, computed per
    8192-row tile as onehot_hi^T (hi_bins, T) @ onehot_lo (T, 128) — 0/1
    operands are exact in bf16 and per-tile partials < 2^24 are exact in
    the f32 accumulator; tile partials are summed in int32. Returns
    (hi_bins * 128,) int32, hi-major (bin b = counts[b >> 7, b & 127])."""
    n = k.shape[0]
    pad = (-n) % _HIST_TILE
    sentinel = np.int32(hi_bins << 7)
    kp = jnp.pad(k, (0, pad), constant_values=sentinel)
    kt = kp.reshape(-1, _HIST_TILE)
    cols_hi = jnp.arange(hi_bins, dtype=jnp.int32)
    cols = jnp.arange(128, dtype=jnp.int32)

    def tile_partial(kt_i):
        # uint32 >= hi_bins*128 routes hi past every one-hot column
        bad = kt_i.astype(jnp.uint32) >= jnp.uint32(int(sentinel))
        hi = jnp.where(bad, hi_bins, kt_i >> 7)
        oh_hi = (hi[:, None] == cols_hi[None, :]).astype(jnp.bfloat16)
        oh_lo = ((kt_i & 127)[:, None] == cols[None, :]).astype(jnp.bfloat16)
        c = jax.lax.dot_general(
            oh_hi, oh_lo,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return c.astype(jnp.int32)

    partials = jax.vmap(tile_partial)(kt)  # (tiles, hi_bins, 128)
    return jnp.sum(partials, axis=0, dtype=jnp.int32).reshape(-1)


@partial(jax.jit, static_argnames=("n", "force_pallas", "interpret"))
def _expand_runs(
    counts: jnp.ndarray, n: int, shift=0,
    force_pallas: bool = False, interpret: bool = False,
) -> jnp.ndarray:
    """Sorted bin-index column (plus ``shift``) from a histogram:
    out[i] = shift + the b such that C[b] <= i < C[b+1], C = exclusive
    cumsum of counts.

    Scatter-free-ish run expansion: out[i] = #{b : C[b] <= i} - 1.  s[j] =
    #{b : C[b] == j} is built by a K-element scatter-add (K = 16384 — tiny,
    so XLA's serialized scatter costs ~0.1 ms); the long inclusive cumsum
    streams once over the output (MXU Pallas kernel on accelerators — s
    sums to 16384 globally, far under its per-block 2^24 exactness bound —
    with the -1+shift folded into its carry). ``s`` stays int32: narrow
    indicator columns READ 2-4x fewer bytes but the sub-32-bit load+cast
    lowers as a relayout that measured 3x SLOWER overall (0.448 vs
    0.150 ms for the cumsum at 2^22 with int8 input —
    scripts/measure_r4.py g5)."""
    starts = jnp.cumsum(counts) - counts  # exclusive; sorted, C[0] = 0
    s = jnp.zeros((n,), jnp.int32).at[starts].add(1, mode="drop")
    shift = jnp.asarray(shift, jnp.int32)
    if jax.default_backend() == "cpu" and not force_pallas:
        # force_pallas + interpret lets CI exercise the accelerator
        # path's exactness on CPU — the 2026-08 bf16-truncation bug
        # lived exclusively here and the CPU-only test grid missed it
        return jnp.cumsum(s, dtype=jnp.int32) + (shift - 1)
    from .cumsum_pallas import cumsum_pallas

    # max boundary multiplicity = 1 + the longest internal zero-count
    # run (empty bins share their successor's start). Benchmark-scale
    # sorts have multiplicities ~1 and take the single-plane kernel;
    # small/degenerate sorts (where multiplicities exceed bf16's 256
    # exact-int limit — the small-grid sweep's 0/9-valid bug) take the
    # exact two-plane split. K-vector math, lax.cond dispatch.
    kb = counts.shape[0]
    idx = jnp.arange(kb, dtype=jnp.int32)
    nz = counts > 0
    last_nz = jax.lax.cummax(jnp.where(nz, idx, -1))
    prev_strict = jnp.concatenate(
        [jnp.full((1,), -1, jnp.int32), last_nz[:-1]]
    )
    maxmult = jnp.max(jnp.where(nz, idx - prev_strict, 0))
    return jax.lax.cond(
        maxmult > 255,
        lambda v: cumsum_pallas(v, carry_init=shift - 1,
                                interpret=interpret),
        lambda v: cumsum_pallas(v, carry_init=shift - 1,
                                two_plane=False, interpret=interpret),
        s,
    )


def histogram_dispatch(k: jnp.ndarray, hi_bins: int = 128) -> jnp.ndarray:
    """histogram_16k semantics; fused Pallas kernel on accelerators, the
    XLA one-hot formulation on CPU (trace-time choice). The accelerator
    engine is the SWAR one-hot kernel (round 3): 0.360 vs 0.604 ms at
    2^22/hi80 on v5e (scripts/measure_r4.py g2) — the bin-packed byte
    patterns replace the compare+cast per (element, bin)."""
    if jax.default_backend() == "cpu":
        return histogram_16k(k, hi_bins=hi_bins)
    from .hist_pallas import histogram_16k_swar_pallas

    return histogram_16k_swar_pallas(k, hi_bins=hi_bins)


def _sort_counting_shifted(
    x: jnp.ndarray, minv, hi_bins: int = 128
) -> jnp.ndarray:
    n = x.shape[0]
    k = (x - minv).astype(jnp.int32)
    counts = histogram_dispatch(k, hi_bins=hi_bins)
    return _expand_runs(
        counts, n, shift=minv.astype(jnp.int32)
    ).astype(x.dtype)


@jax.jit
def sort_counting(x: jnp.ndarray) -> jnp.ndarray:
    """Distribution sort of an int32 column. PRECONDITION: max(x) - min(x)
    < 2^14 (the benchmark's [1, 10000] columns). Use ``sort_auto`` when the
    range is not statically known."""
    return _sort_counting_shifted(x, jnp.min(x))


_NARROW_BINS = 80 * 128  # the benchmark's [1, 10000] spans land here


@partial(jax.jit, static_argnames=("force_dispatch",))
def sort_auto(x: jnp.ndarray, force_dispatch: bool = False) -> jnp.ndarray:
    """Range-adaptive sort: distribution sort when the value range fits
    2^14 bins (with a narrower 80*128-bin histogram when the span allows —
    the one-hot construction is the VPU floor, so fewer hi bins are
    proportionally cheaper: 0.61 vs 0.77 ms at 2^22, measure_r3b.py e2),
    XLA's comparison sort otherwise. The range check is one fused min/max
    pass; ``lax.cond`` executes only the taken branch per call.

    The CPU backend takes ``lax.sort`` unconditionally (trace-time
    dispatch, like every engine here): the one-hot-matmul counting sort
    is an MXU design — emulated matmuls made the CPU sweep's 2^25 size
    blow a 1-hour budget — and the reference's own CPU path is a
    comparison sort anyway (oneDPL std::sort, sort/radix.cpp:34).
    ``force_dispatch=True`` overrides the short-circuit so CI fuzz runs
    can exercise the shipped range-dispatch logic (uint32 span wrap, the
    80·128 / 2^14 cliffs, counting-sort composition) off-device."""
    if x.shape[0] == 0:
        return x
    if jax.default_backend() == "cpu" and not force_dispatch:
        return jax.lax.sort(x)
    minv = jnp.min(x)
    maxv = jnp.max(x)
    # max - min in uint32 is exact for any int32 pair (the true difference
    # is in [0, 2^32)); int64 is unavailable without x64 mode.
    diff = maxv.astype(jnp.uint32) - minv.astype(jnp.uint32)
    # Dispatch-construct cost (round-4 device-looped A/B at 2^22): the
    # raw counting pipeline runs 0.458 ms; the nested lax.cond form
    # ~0.505; a flattened lax.switch measured WORSE (0.537) — the
    # 3-branch output unification costs more than two conds here. The
    # nested conds stay; callers with host knowledge of the range
    # (bench.py, mirroring the join's dense_applicable convention) can
    # call the counting path directly.
    return jax.lax.cond(
        diff < jnp.uint32(_NARROW_BINS),
        lambda v: _sort_counting_shifted(v, minv, hi_bins=80),
        lambda v: jax.lax.cond(
            diff < jnp.uint32(1 << _RANGE_BITS),
            lambda w: _sort_counting_shifted(w, minv, hi_bins=128),
            lambda w: jax.lax.sort(w),
            v,
        ),
        x,
    )


def sort_host_dispatch(host_vals, platform: str | None = None):
    """HOST-side engine pick (round-5: the same host-knowledge convention
    as the join's ``dense_applicable`` and the reference's host-side
    ``count_distinct``, join_omnisci.cpp:55-69): the caller holds the host
    column (the dwarfs generate it, sort/radix.cpp:14-20), so the range
    check that ``sort_auto`` performs on device — paying 0.05-0.08 ms of
    ``lax.cond`` construct tax per call (docs/performance.md round 4) —
    can run once here and dispatch the counting pipeline directly.

    Returns a jitted engine with ``sort_auto`` semantics for this column's
    range class. CPU keeps ``sort_auto`` (which short-circuits to
    ``lax.sort`` — see its docstring). ``platform`` defaults to the
    default backend; dwarfs pass their resolved device's platform."""
    if (platform or jax.default_backend()) == "cpu":
        return sort_auto
    v = np.asarray(host_vals)
    if v.size == 0:
        return sort_auto
    span = int(v.astype(np.uint32).max()) - int(v.astype(np.uint32).min())
    if v.dtype == np.int32:  # span as the true int32 difference
        span = int(v.max()) - int(v.min())
    if span < _NARROW_BINS:
        return jax.jit(
            lambda x: _sort_counting_shifted(x, jnp.min(x), hi_bins=80)
        )
    if span < (1 << _RANGE_BITS):
        return jax.jit(
            lambda x: _sort_counting_shifted(x, jnp.min(x), hi_bins=128)
        )
    return sort_auto


def sort_oracle(x) -> np.ndarray:
    """std::sort oracle (sort/radix.cpp:8-13)."""
    return np.sort(np.asarray(x), kind="stable")
