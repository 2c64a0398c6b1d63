"""Core data-parallel primitives: scans, compaction, segments.

These replace the reference's vendor-algorithm layer
(common/dpcpp/dpl_wrapper/dpl_wrapper.hpp:18-39 — oneDPL exclusive_scan /
copy_if / sort) with XLA built-ins. On TPU there are no device-wide atomics
and no dynamic output shapes, so every "variable-size output" op follows the
fixed-capacity + count pattern: outputs are allocated at a static capacity
and accompanied by an element count.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def exclusive_cumsum(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Exclusive prefix sum (oneDPL exclusive_scan equivalent)."""
    inc = jnp.cumsum(x, axis=axis)
    return inc - x


def compact(
    values: jnp.ndarray,
    mask: jnp.ndarray,
    capacity: int | None = None,
    fill=0,
):
    """copy_if: gather ``values[mask]`` to the front of a fixed-capacity
    buffer, preserving order; returns ``(out, count)``.

    TPU-native replacement for oneDPL ``copy_if`` (dpl_wrapper.hpp:25-32):
    mask → exclusive prefix sum → scatter-to-rank. The scatter has unique
    indices so XLA lowers it without serialization concerns; out-of-capacity
    and unselected elements route to a dropped out-of-bounds index.
    """
    n = values.shape[0]
    if capacity is None:
        capacity = n
    mask = mask.astype(jnp.int32)
    pos = jnp.cumsum(mask) - mask  # exclusive positions among selected
    count = pos[-1] + mask[-1] if n > 0 else jnp.int32(0)
    idx = jnp.where((mask > 0) & (pos < capacity), pos, capacity)
    out = jnp.full((capacity,), fill, dtype=values.dtype)
    out = out.at[idx].set(values, mode="drop")
    return out, count.astype(jnp.int32)


def compact_multi(
    arrays,
    mask: jnp.ndarray,
    capacity: int | None = None,
    fill=0,
):
    """Compact several same-length columns by one mask (single shared
    position computation). Returns ``(tuple_of_outs, count)``."""
    n = mask.shape[0]
    if capacity is None:
        capacity = n
    m = mask.astype(jnp.int32)
    pos = jnp.cumsum(m) - m
    count = (pos[-1] + m[-1]).astype(jnp.int32) if n > 0 else jnp.int32(0)
    idx = jnp.where((m > 0) & (pos < capacity), pos, capacity)
    outs = []
    for a in arrays:
        o = jnp.full((capacity,), fill, dtype=a.dtype)
        outs.append(o.at[idx].set(a, mode="drop"))
    return tuple(outs), count


def segment_ids_from_sorted(sorted_keys: jnp.ndarray) -> jnp.ndarray:
    """For a sorted key column, the dense segment id of each row
    (0-based, increasing by 1 at every key change)."""
    n = sorted_keys.shape[0]
    if n == 0:
        return jnp.zeros((0,), jnp.int32)
    change = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         (sorted_keys[1:] != sorted_keys[:-1]).astype(jnp.int32)]
    )
    return jnp.cumsum(change)


def rank_in_segment(segment_ids: jnp.ndarray) -> jnp.ndarray:
    """Rank of each row within its (contiguous) segment: 0,1,2,…"""
    n = segment_ids.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    # First row index of each row's segment, propagated by a max-scan over
    # positions where the segment starts.
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), segment_ids[1:] != segment_ids[:-1]]
    )
    start_idx = jax.lax.cummax(jnp.where(is_start, idx, 0))
    return idx - start_idx


def sort_by_key(keys: jnp.ndarray, *values: jnp.ndarray, stable: bool = True):
    """Sort key column with payload columns (oneDPL sort equivalent —
    dpl_wrapper.hpp:34-39). Returns (sorted_keys, *sorted_values)."""
    res = jax.lax.sort((keys,) + values, num_keys=1, is_stable=stable)
    return res if len(values) else res[0]


def cummax(x: jnp.ndarray) -> jnp.ndarray:
    # lax.cummax is a single primitive with a native TPU lowering;
    # associative_scan would unroll a log-depth slice/concat graph that
    # compiles orders of magnitude slower.
    return jax.lax.cummax(x)
