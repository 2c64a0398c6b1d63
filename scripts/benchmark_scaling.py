#!/usr/bin/env python
"""Scaling-efficiency harness: distributed group-by and CSR join over
meshes of 1..N devices (BASELINE.json: ≥80% rows/s scaling efficiency).

On real multi-chip hardware this measures ICI scaling directly. Without it,
run on the virtual CPU mesh to validate the methodology and the sharding
(numbers then reflect host parallelism, not ICI):

  JAX_PLATFORM_NAME=cpu JAX_PLATFORMS=cpu \\
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
  python scripts/benchmark_scaling.py --rows_per_chip 262144

Prints one JSON line per (op, mesh size) plus efficiency summaries.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--rows_per_chip", type=int, default=1 << 18)
    p.add_argument("--groups", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax

    from dwarf_bench_tpu.parallel import (
        dist_csr_join,
        dist_filter,
        dist_groupby_dense,
        dist_sort,
        make_mesh,
        shard_rows,
    )
    from dwarf_bench_tpu.utils.roofline import scaling_efficiency
    from dwarf_bench_tpu.utils.timing import time_amortized

    n_dev = len(jax.devices())
    mesh_sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_dev]
    rng = np.random.default_rng(args.seed)

    results = {"groupby": {}, "join": {}, "join_ring": {}, "filter": {},
               "sort": {}}
    for n_chips in mesh_sizes:
        mesh = make_mesh(n_chips)
        n = n_chips * args.rows_per_chip
        keys = rng.integers(0, args.groups, n).astype(np.uint32)
        vals = rng.integers(1, 10000, n, endpoint=True).astype(np.uint32)
        dk, dv = shard_rows(mesh, keys, vals)
        gfn = dist_groupby_dense(mesh, args.groups)
        t = time_amortized(gfn, dk, dv, k=4)
        rps = n / t
        results["groupby"][n_chips] = rps
        print(json.dumps({"op": "dist_groupby", "chips": n_chips,
                          "rows": n, "rows_per_s": round(rps)}))

        A = rng.integers(1, 10000, n, endpoint=True).astype(np.uint32)
        B = rng.integers(1, 10000, n, endpoint=True).astype(np.uint32)
        cap = max(256, (args.rows_per_chip // max(n_chips, 1)) * 4)
        from dwarf_bench_tpu.ops.csr_join import dense_applicable

        jfn = dist_csr_join(
            mesh,
            rows_per_chip=args.rows_per_chip,
            distinct_cap=n_chips * cap,
            ht_size=2 * n_chips * cap,
            shuffle_capacity=cap,
            dense=dense_applicable(A, B),
        )
        da, db = shard_rows(mesh, A, B)
        counts, local_totals, total, overflow = jfn(da, db)
        assert int(np.sum(np.asarray(overflow))) == 0, "shuffle overflow"
        t = time_amortized(jfn, da, db, k=4)
        rps = n / t
        results["join"][n_chips] = rps
        print(json.dumps({"op": "dist_csr_join", "chips": n_chips,
                          "rows": n, "rows_per_s": round(rps)}))

        x = rng.integers(1, 10000, n, endpoint=True).astype(np.int32)
        ffn = dist_filter(mesh, 5000, args.rows_per_chip)
        dx = shard_rows(mesh, x)
        t = time_amortized(ffn, dx, k=4)
        rps = n / t
        results["filter"][n_chips] = rps
        print(json.dumps({"op": "dist_filter", "chips": n_chips,
                          "rows": n, "rows_per_s": round(rps)}))

        from dwarf_bench_tpu.parallel import dist_csr_join_ring

        rfn = dist_csr_join_ring(
            mesh,
            rows_per_chip=args.rows_per_chip,
            distinct_cap=args.rows_per_chip,
            ht_size=2 * args.rows_per_chip + 2,
            dense=dense_applicable(A, B),
        )
        t = time_amortized(rfn, da, db, k=4)
        rps = n / t
        results["join_ring"][n_chips] = rps
        print(json.dumps({"op": "dist_csr_join_ring", "chips": n_chips,
                          "rows": n, "rows_per_s": round(rps)}))

        xs = rng.integers(1, 1 << 30, n).astype(np.uint32)
        sfn = dist_sort(mesh, args.rows_per_chip * 2)
        dxs = shard_rows(mesh, xs)
        _, _, ov_s = sfn(dxs)
        assert int(np.sum(np.asarray(ov_s))) == 0, "sort partition overflow"
        t = time_amortized(sfn, dxs, k=4)
        rps = n / t
        results["sort"][n_chips] = rps
        print(json.dumps({"op": "dist_sort", "chips": n_chips,
                          "rows": n, "rows_per_s": round(rps)}))

    for op, by_n in results.items():
        if len(by_n) > 1:
            eff = scaling_efficiency(by_n)
            print(json.dumps({"op": op, "scaling_efficiency": {
                str(k): round(v, 3) for k, v in eff.items()}}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
