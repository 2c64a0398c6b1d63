"""Dump the Mosaic (vector-dialect MLIR) module of the G=64 group-by
kernel and count the per-block vector ops (round-5 verdict item 5: the
operand-staging wall needs instruction-level evidence, not behavioral
A/Bs).

The Mosaic lowering happens CLIENT-side at jit-lower time (only the
Mosaic→LLO compile is remote), so this costs no device time: we patch
``pl.pallas_call`` to set debug=True (which prints the Mosaic module
during lowering), lower the kernel for the TPU backend, and histogram
the op names inside the kernel body.

Usage: python scripts/dump_mosaic.py [> /tmp/mosaic_groupby.txt]
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

_orig = pl.pallas_call


def _patched(*a, **kw):
    kw["debug"] = True
    return _orig(*a, **kw)


pl.pallas_call = _patched


def main():
    from dwarf_bench_tpu.ops.groupby_pallas import groupby_small_pallas

    n, G = 1 << 22, 64
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.integers(0, G, n).astype(np.uint32))
    v = jnp.asarray(rng.integers(1, 10000, n).astype(np.uint32))

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        jax.jit(
            lambda kk, vv: groupby_small_pallas(kk, vv, G)
        ).lower(k, v)
    text = buf.getvalue()
    sys.stdout.write(text)

    # histogram op names in the module (lines like "%12 = arith.muli ...")
    ops = Counter()
    for line in text.splitlines():
        m = re.search(r"=\s+\"?([a-z_]+\.[a-z_0-9]+)", line)
        if m:
            ops[m.group(1)] += 1
        else:
            m2 = re.match(r"\s*\"?([a-z_]+\.[a-z_0-9]+)\"?[( ]", line)
            if m2 and "." in m2.group(1):
                ops[m2.group(1)] += 1
    print("\n==== op histogram ====", file=sys.stderr)
    for name, cnt in ops.most_common(40):
        print(f"{cnt:6d}  {name}", file=sys.stderr)


if __name__ == "__main__":
    main()
