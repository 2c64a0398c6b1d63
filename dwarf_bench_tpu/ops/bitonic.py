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


def merge_bitonic(cols, num_cmp: int = 2):
    """Sort a BITONIC sequence ascending under the lexicographic order of
    the first ``num_cmp`` columns (1 or 2). ``cols``: tuple of same-length
    (N,) arrays, N a power of two; every column rides the exchanges.
    Returns the columns fully sorted. log2(N) vectorized stages."""
    n = cols[0].shape[0]
    assert n & (n - 1) == 0, "bitonic merge needs a power-of-two length"
    cols = list(cols)
    s = n // 2
    while s >= 1:
        shaped = [c.reshape(-1, 2, s) for c in cols]
        k_lo, k_hi = shaped[0][:, 0], shaped[0][:, 1]
        swap = k_lo > k_hi
        if num_cmp >= 2:
            a_lo, a_hi = shaped[1][:, 0], shaped[1][:, 1]
            swap = swap | ((k_lo == k_hi) & (a_lo > a_hi))
        out = []
        for c in shaped:
            lo, hi = c[:, 0], c[:, 1]
            nlo = jnp.where(swap, hi, lo)
            nhi = jnp.where(swap, lo, hi)
            out.append(jnp.stack([nlo, nhi], axis=1).reshape(n))
        cols = out
        s //= 2
    return tuple(cols)
