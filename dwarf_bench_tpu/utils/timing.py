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

import os
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


_MIN_DIFF_S = 0.2  # exec-time spread between depths must dwarf jitter
_MAX_DEPTH = 100_000


def time_device_looped_inplace(fn, *args, update, fold, k: int = 16,
                               repeats: int = 2) -> float:
    """``time_device_looped`` with O(1)-cost iteration coupling: the
    argument arrays ride the fori carry and ``update(args, s)`` pokes a
    SINGLE element in place (XLA aliases loop-carried buffers), so the
    per-iteration overhead is ~zero even for 2^24-element inputs.

    The elementwise-perturbation form below is only overhead-free when
    XLA can fuse the perturbation into the consumer; Pallas kernels
    materialize their operands, so ``x + (c & 1)`` there costs a full
    array write (+re-read) per iteration — ~0.08 ms at 2^24, a 30-50%
    error on the fastest kernels. ``update`` must keep the poked value
    VALID for the op (e.g. a key within the benchmark range) and must
    depend on ``s`` (the folded output) so iterations chain."""
    import jax
    import jax.numpy as jnp

    def make(kk):
        @jax.jit
        def g(*a):
            def body(i, carry):
                s, ca = carry
                out = fn(*ca)
                s2 = fold(out)
                return s2, update(ca, s2)
            s, _ = jax.lax.fori_loop(0, kk, body, (jnp.int32(0), a))
            return s
        return g

    g1, gk = make(1), make(k + 1)
    t1 = min(time_amortized(g1, *args) for _ in range(repeats))
    tk = min(time_amortized(gk, *args) for _ in range(repeats))
    return max((tk - t1) / k, 1e-9)


def time_device_looped(fn, *args, perturb, fold, k: int = 16,
                       repeats: int = 2) -> float:
    """TRUE per-execution device seconds: run ``fn`` k times inside ONE
    jit via ``lax.fori_loop`` with a data-dependence chain, and take the
    (T_k − T_1)/(k−1)... slope between loop lengths.

    Round 4 measured the host's per-jit-call dispatch at 0.13–0.30 ms
    (variable with host state) — for sub-ms kernels the queue-k pattern
    therefore measures DISPATCH, not the device (structurally different
    kernels all "converged" to ~0.23–0.31 ms, and the same binary moved
    30% between sessions; scripts/measure_r5.py d1). Device-looping
    removes the per-call dispatch entirely, which is exactly the
    reference's kernel-time semantics: OpenCL event profiling
    (CL_PROFILING_COMMAND_START/END, scan/scan.cpp:142-154) also
    excludes enqueue/dispatch.

    ``perturb(args_tuple, carry)`` must return new args with a REAL data
    dependence on the int32 ``carry`` (or XLA hoists the loop-invariant
    body and the measurement collapses); ``fold(out)`` must reduce the
    output to an int32 scalar that feeds the next carry (keeps every
    iteration live). The outer calls still use the queue-k harness, so
    per-call dispatch cancels in the subtraction."""
    import jax
    import jax.numpy as jnp

    def make(kk):
        @jax.jit
        def g(*a):
            def body(i, carry):
                return fold(fn(*perturb(a, carry)))
            return jax.lax.fori_loop(0, kk, body, jnp.int32(0))
        return g

    g1, gk = make(1), make(k + 1)
    t1 = min(time_amortized(g1, *args) for _ in range(repeats))
    tk = min(time_amortized(gk, *args) for _ in range(repeats))
    return max((tk - t1) / k, 1e-9)


def time_amortized(fn: Callable, *args, k: int = 8, warmup: int = 1) -> float:
    """Per-execution seconds via the queue-k pattern (see module docstring):
    the slope between two queue depths cancels dispatch and the sync
    roundtrip even for kernels far below the roundtrip latency.
    ``fn(*args)`` must be jitted and shape-stable.

    Robustness: the tunnel's sync roundtrip jitters by milliseconds run to
    run, and the jitter divides only by (k2 - k1) — with shallow queues a
    sub-ms kernel can read 5-10x fast OR slow (round-2 bench once printed
    a 310 Grows/s scan, above the HBM read bound). The loop therefore
    DEEPENS the queues until the implied pure-execution spread between the
    two depths is >= 0.2 s (>= ~50x the observed jitter); the reading's
    jitter error is then a few percent. Kernels slower than ~25 ms meet
    the bar on the first pass; ~0.3 ms kernels settle around depth ~1000
    (~1 s of measurement)."""
    for _ in range(max(warmup, 1)):
        sync(fn(*args))  # compile + warm
    # CPU backends have microsecond-level sync jitter: a 2 ms spread
    # suffices and keeps the (cached-per-size) test-suite measurements fast
    min_diff = 0.002 if jax.default_backend() == "cpu" else _MIN_DIFF_S
    # wall-clock budget: at µs-level kernels the jitter bar needs queue
    # depths whose ENQUEUE cost (Python dispatch × depth) dominates; past
    # the budget the deep-queue average is already dispatch-dominated and
    # more depth cannot improve it — return best effort instead of stalling
    # a sweep for minutes per size
    t_budget = float(os.environ.get("DBT_TIMING_BUDGET_S", "6"))
    t_begin = time.perf_counter()
    k1, k2 = k, 5 * k
    slope = None
    for _ in range(6):
        t1 = min(_queue_k(fn, args, k1) for _ in range(2))
        t2 = min(_queue_k(fn, args, k2) for _ in range(2))
        slope = (t2 - t1) / (k2 - k1)
        if slope >= 1e-7 and slope * (k2 - k1) >= min_diff:
            return slope
        if k2 >= _MAX_DEPTH:
            break
        if time.perf_counter() - t_begin > t_budget:
            break
        # estimate per-exec time to size the next depths; t2/k2 bounds it
        # from above (includes one roundtrip / k2), a degenerate slope
        # from below — use the larger to avoid overshooting the depth
        est = max(slope, t2 / k2 / 4, 1e-6)
        diff = min(int(min_diff / est) + 1, _MAX_DEPTH)
        k1 = max(k, diff // 4)
        k2 = min(k1 + diff, _MAX_DEPTH)
    return max(slope if slope and slope > 0 else t2 / k2, 1e-9)
