#!/usr/bin/env python
"""Report post-processing — the equivalent of the reference's
scripts/report-sample.ipynb: per (size, device), drop the max-time iteration
(warmup/JIT) and mean the rest; print a table and optionally plot.

Usage: python scripts/report.py report.csv [--column host_time_ms] [--plot out.png]
"""

from __future__ import annotations

import argparse
import csv
import sys
from collections import defaultdict


def load(path: str):
    with open(path) as f:
        rows = list(csv.DictReader(f))
    return rows


def summarize(rows, column: str):
    groups = defaultdict(list)
    for r in rows:
        key = (r["device_type"], int(r["buf_size_bytes"]))
        groups[key].append(float(r[column]))
    out = []
    for (dev, size), vals in sorted(groups.items()):
        # drop the slowest iteration (warmup convention, notebook cells 6-7)
        if len(vals) > 1:
            vals = sorted(vals)[:-1]
        out.append((dev, size, sum(vals) / len(vals), len(vals)))
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("csv_path")
    p.add_argument("--column", default="host_time_ms")
    p.add_argument("--plot", default="")
    args = p.parse_args(argv)

    rows = load(args.csv_path)
    if not rows:
        print("empty report", file=sys.stderr)
        return 1
    summary = summarize(rows, args.column)
    print(f"{'device':8s} {'buf_size_bytes':>16s} {'mean_' + args.column:>20s} {'n':>4s}")
    for dev, size, mean, n in summary:
        print(f"{dev:8s} {size:16d} {mean:20.3f} {n:4d}")

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        devices = sorted({d for d, _, _, _ in summary})
        fig, ax = plt.subplots(figsize=(8, 5))
        for dev in devices:
            pts = [(s, m) for d, s, m, _ in summary if d == dev]
            ax.plot([p[0] for p in pts], [p[1] for p in pts],
                    marker="o", label=dev)
        ax.set_xscale("log")
        ax.set_yscale("log")
        ax.set_xlabel("buffer size (bytes)")
        ax.set_ylabel(f"mean {args.column}")
        ax.legend()
        fig.tight_layout()
        fig.savefig(args.plot, dpi=120)
        print(f"wrote {args.plot}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
