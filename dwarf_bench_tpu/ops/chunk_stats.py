"""Phase-A chunk statistics for the sparsity-adaptive filter.

One pass over ``x`` viewed as (nch, 128) chunk rows computes, per chunk, what
the sparse filter needs to classify it (the TPU analog of TwoPassScan's
pass-1 counting, scan/scan.cl:3-22):

  * ``cnt``  — number of matches (x < threshold) in the chunk;
  * ``vsum`` — sum of window-clipped match encodings (see below), clamped
    to 511: a chunk with exactly ONE match whose value lies in the 255-wide
    window below the threshold is fully described by (cnt == 1, vsum) — the
    match's value is ``threshold - vsum`` — so its extraction needs no
    second read of x at all;
  * ``base`` — exclusive cumsum of cnt (each chunk's global output offset).

Window encoding: d = clip(threshold - max(x, threshold - 512), 0, 256).
Non-matches contribute 0; a match in (threshold-256, threshold) contributes
its distance 1..255; any match at or below threshold-256 contributes 256,
which makes a single-match chunk's vsum == 256 — detectably out-of-window,
so the caller reroutes that chunk to the general (gather) path. Values are
never misdecoded; the window only decides which path extracts them.
(Callers must also route thresholds <= INT32_MIN + 512 away from this
encoding: there ``threshold - 512`` wraps and the classification is
garbage — still only a routing error, but the cheap guard keeps it exact.)

Returns ``stat = cnt * 512 + min(vsum, 511)`` and ``base``, both (nch,)
int32.

This is a pure-XLA formulation on every backend: XLA:TPU lowers the
(nch, 128) row reductions as a fused streaming pass that measured FASTER
than a hand-written Pallas kernel with MXU matvec reductions (0.16 ms vs
0.56 ms at 2^24 on v5e — grid-step and matvec latency dominated the
kernel), so the Pallas variant was deleted. See docs/performance.md.
"""

from __future__ import annotations

import jax.numpy as jnp


def chunk_stats_xla(x2: jnp.ndarray, threshold):
    """x2: (nch, 128) int32. Returns (stat, base): (nch,) int32 each.

    Keep the two separate row reductions: XLA multi-output fusion already
    computes both in one pass, and packing them into ONE reduction via
    per-element ``(m << 16) + vclip`` measured 7x SLOWER standalone and
    regressed the full filter 0.28 -> 0.31 ms at 2^24 on v5e
    (scripts/measure_stats_fusion.py) — the wide-constant add defeats the
    cheap mask-sum lowering.
    """
    thr = jnp.asarray(threshold, jnp.int32)
    m = x2 < thr
    cnt = jnp.sum(m.astype(jnp.int32), axis=1)
    d = thr - jnp.maximum(x2, thr - 512)
    vclip = jnp.clip(d, 0, 256)
    vs = jnp.minimum(jnp.sum(vclip, axis=1), 511)
    stat = cnt * 512 + vs
    base = jnp.cumsum(cnt) - cnt
    return stat, base
