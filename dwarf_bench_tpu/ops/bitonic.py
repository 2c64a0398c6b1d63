"""Hand-built bitonic MERGE network (round 5).

The bulk hash probe's wall is ``lax.sort`` over the [table ‖ queries]
concatenation: XLA's comparison sort runs the full O(n log^2 n) network
(~200+ compare-exchange passes at 2^24-2^25, each a read+write of every
operand column — the measured 219-296 ms of BENCH_r04's 2^24 probes).
But the table side is ALREADY SORTED at build time, and the query side
needs only ONE pair sort — after which combining the two is a MERGE, and
Batcher's bitonic merger does it obliviously in exactly log2(N) stages:
O(n log n), a ~10x pass-count reduction over re-sorting the concat.

``merge_bitonic`` sorts a BITONIC input (ascending prefix, descending
suffix — e.g. [A asc ‖ pad-peak ‖ flip(B asc)]) under the lexicographic
(key, aux) comparator. Each stage is a stride-halving compare-exchange:
reshape to (-1, 2, s), one vectorized predicate, one select per column —
XLA fuses each stage into a single streaming pass, so the network is
~log2(N) full-array passes. No gathers, no scatters, shape-static.

Correctness: an oblivious comparator network sorts every input the
comparator totally orders, provided the input is bitonic UNDER THAT
ORDER — callers must therefore make the suffix monotone in the composite
(key, aux) order, not just in key (ties mixed in aux would break
bitonicity: the 0-1 principle maps an intra-key-mixed run to >2 runs).
merge_lookup feeds (key, tiebreak-unique aux), so the order is total and
the output deterministic.

Reference probes being replaced: cuckoo_hashtable.hpp:29-41 (2-probe
lookup), slab_hash.hpp:264-294 (bucket scan) — O(1) random access that
serializes on TPU (~0.1 Gelem/s gathers).
"""

from __future__ import annotations

import jax.numpy as jnp


def _less(ka, aa, kb, ab, num_cmp):
    """(ka, aa) < (kb, ab) lexicographically (aux ignored if num_cmp==1)."""
    if num_cmp >= 2:
        return (ka < kb) | ((ka == kb) & (aa < ab))
    return ka < kb


def merge_bitonic(cols, num_cmp: int = 2):
    """Sort a BITONIC sequence ascending under the lexicographic order of
    the first ``num_cmp`` columns (1 or 2). ``cols``: tuple of same-length
    (N,) arrays, N a power of two; every column rides the exchanges.
    Returns the columns fully sorted. log2(N) vectorized stages.

    Lowering shape discipline (the round-5 OOM lesson): the natural
    ``reshape(-1, 2, s)`` compare-exchange creates, for s < 128, 3-D
    arrays whose minor dim pads to a full 128-lane tile — a 32x HBM
    expansion (4 GB per temp at 2^25, measured compile-time OOM). Large
    strides (s >= 128, lane-tile aligned) keep the reshape form; small
    strides switch to a flat double-roll exchange: partner values arrive
    by ±s rolls and each element keeps min or max by its pair-side bit,
    so every temp stays a cleanly-tiled 1-D array."""
    n = cols[0].shape[0]
    assert n & (n - 1) == 0, "bitonic merge needs a power-of-two length"
    cols = list(cols)
    s = n // 2
    while s >= 128:
        shaped = [c.reshape(-1, 2, s) for c in cols]
        k_lo, k_hi = shaped[0][:, 0], shaped[0][:, 1]
        if num_cmp >= 2:
            a_lo, a_hi = shaped[1][:, 0], shaped[1][:, 1]
        else:
            a_lo = a_hi = None
        swap = _less(k_hi, a_hi, k_lo, a_lo, num_cmp)
        out = []
        for c in shaped:
            lo, hi = c[:, 0], c[:, 1]
            nlo = jnp.where(swap, hi, lo)
            nhi = jnp.where(swap, lo, hi)
            out.append(jnp.stack([nlo, nhi], axis=1).reshape(n))
        cols = out
        s //= 2
    idx = jnp.arange(n, dtype=jnp.int32)
    while s >= 1:
        is_lo = (idx & s) == 0
        fwd = [jnp.roll(c, -s) for c in cols]  # partner of a lo element
        bwd = [jnp.roll(c, s) for c in cols]  # partner of a hi element
        pk = jnp.where(is_lo, fwd[0], bwd[0])
        pa = jnp.where(is_lo, fwd[1], bwd[1]) if num_cmp >= 2 else None
        aux = cols[1] if num_cmp >= 2 else None
        p_less = _less(pk, pa, cols[0], aux, num_cmp)
        # lo keeps min (take partner iff partner < me); hi keeps max
        # (take partner iff me < partner) — consistent at equality
        # (neither takes), so no element is duplicated or lost
        take = jnp.where(is_lo, p_less,
                         _less(cols[0], aux, pk, pa, num_cmp))
        cols = [
            jnp.where(take, jnp.where(is_lo, f, b), c)
            for c, f, b in zip(cols, fwd, bwd)
        ]
        s //= 2
    return tuple(cols)
