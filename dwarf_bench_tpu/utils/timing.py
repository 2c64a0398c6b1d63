"""Execution-forcing sync and amortized kernel timing.

On some PJRT plugins (notably the tunneled TPU used here),
``block_until_ready()`` returns before the computation has executed, and
full-array device→host transfers are orders of magnitude slower than the
compute. The reliable way to observe completion is to fetch ONE scalar that
data-depends on the result: the runtime must finish the producing program
to materialize it, and the transfer is 4 bytes.

Kernel timing uses the queue-k pattern: enqueue ``k`` executions
back-to-back (the single TPU core runs them serially), sync once, and take
``(T_k − T_1) / (k − 1)`` — dispatch overhead and the sync roundtrip cancel
out. This is the event-profiling analog of the reference's OpenCL
CL_PROFILING_COMMAND_START/END (scan/scan.cpp:142-154).
"""

from __future__ import annotations

import time
from typing import Any, Callable

import jax
import numpy as np


@jax.jit
def _first_scalar(a):
    return a.ravel()[0]


def _first_leaf(tree: Any):
    for leaf in jax.tree_util.tree_leaves(tree):
        if isinstance(leaf, jax.Array):
            return leaf
    return None


def sync(tree: Any) -> Any:
    """Force execution of the computation producing ``tree`` (single-stream
    back-ends execute queued programs in order, so syncing the last output
    fences everything before it). Returns ``tree``."""
    leaf = _first_leaf(tree)
    if leaf is not None:
        np.asarray(_first_scalar(leaf))
    return tree


def timed(fn: Callable, *args, **kwargs):
    """(result, seconds) with a real execution fence."""
    t0 = time.perf_counter()
    res = fn(*args, **kwargs)
    sync(res)
    return res, time.perf_counter() - t0


def _queue_k(fn, args, k) -> float:
    t0 = time.perf_counter()
    out = None
    for _ in range(k):
        out = fn(*args)
    sync(out)
    return time.perf_counter() - t0


def time_amortized(fn: Callable, *args, k: int = 8, warmup: int = 1) -> float:
    """Per-execution seconds via the queue-k pattern (see module docstring):
    the slope between two queue depths cancels dispatch and the sync
    roundtrip even for kernels far below the roundtrip latency.
    ``fn(*args)`` must be jitted and shape-stable."""
    for _ in range(max(warmup, 1)):
        sync(fn(*args))  # compile + warm
    k1, k2 = k, 5 * k
    # Robustness: network jitter on the tunnel can make T_k1 ≈ T_k2 and the
    # slope collapse to ~0 (observed once as a 4e15 rows/s reading). A
    # degenerate slope (< 0.1 µs/exec — physically impossible at benchmark
    # sizes) triggers a re-measure; after three strikes, the deep-queue
    # average (true time + one sync roundtrip / k2) is the safe answer.
    for _ in range(3):
        t1 = min(_queue_k(fn, args, k1) for _ in range(2))
        t2 = min(_queue_k(fn, args, k2) for _ in range(2))
        slope = (t2 - t1) / (k2 - k1)
        if slope >= 1e-7:
            return slope
    return max(t2 / k2, 1e-9)
