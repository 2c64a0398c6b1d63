#!/usr/bin/env python
"""Release packager — the equivalent of the reference's scripts/release.py
(cmake Release build → install → tar.gz): builds the native oracle library
and packages a source+binary tarball.

Usage: python scripts/release.py [--out dist/]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tarfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=os.path.join(ROOT, "dist"))
    args = p.parse_args(argv)

    subprocess.run(["make", "-C", os.path.join(ROOT, "native")], check=True)

    sys.path.insert(0, ROOT)
    from dwarf_bench_tpu import __version__

    os.makedirs(args.out, exist_ok=True)
    name = f"dwarf_bench_tpu-{__version__}"
    tar_path = os.path.join(args.out, f"{name}.tar.gz")

    include = [
        "dwarf_bench_tpu",
        "native/oracles.cpp",
        "native/Makefile",
        "native/liboracles.so",
        "scripts",
        "examples",
        "docs",
        "README.md",
        "pyproject.toml",
    ]
    with tarfile.open(tar_path, "w:gz") as tf:
        for rel in include:
            full = os.path.join(ROOT, rel)
            if os.path.exists(full):
                tf.add(
                    full,
                    arcname=os.path.join(name, rel),
                    filter=lambda ti: None
                    if "__pycache__" in ti.name
                    else ti,
                )
    print(f"wrote {tar_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
