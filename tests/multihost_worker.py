"""Worker process for tests/test_multihost.py — NOT a pytest module.

Runs as one of N processes of a virtual "multi-host" CPU pod
(jax.distributed over localhost + ``--xla_force_host_platform_device_count``
local devices per process — the multi-process analog of the 8-device
virtual mesh convention in conftest.py). Exercises the real multi-host
paths (SURVEY.md §5.8 north star):

  * parallel.init_multihost → jax.distributed runtime, global device list;
  * 1-D global mesh: dist_groupby_dense vs the host oracle (replicated
    output — addressable from every process);
  * 2-D (dcn=hosts, ici=local chips) mesh via make_mesh_2d():
    dist_csr_join_2d with the hierarchical two-hop shuffle, total vs the
    pair-count oracle; each process asserts overflow == 0 on ITS shards.

Prints ``MULTIHOST_OK`` on success; any assertion kills the process with a
nonzero exit the spawning test detects.

Usage: multihost_worker.py <process_id> <num_processes> <port>
"""

from __future__ import annotations

import sys

import numpy as np


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    import jax

    jax.config.update("jax_platforms", "cpu")

    from dwarf_bench_tpu.parallel import (
        dist_csr_join_2d,
        dist_groupby_dense,
        init_multihost,
        make_mesh,
        make_mesh_2d,
        row_sharding,
    )

    init_multihost(
        f"localhost:{port}", num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc, jax.process_count()
    n_dev = len(jax.devices())
    local = jax.local_device_count()
    assert n_dev == nproc * local

    rng = np.random.default_rng(7)  # identical data in every process
    per_proc = n_dev * 512 // nproc

    def shard(mesh, host_full):
        sh = row_sharding(mesh)
        lo = pid * per_proc
        return jax.make_array_from_process_local_data(
            sh, host_full[lo : lo + per_proc], host_full.shape
        )

    # ---- 1-D global mesh: distributed group-by --------------------------
    n = n_dev * 512
    G = 64
    keys = rng.integers(0, G, n).astype(np.uint32)
    vals = rng.integers(1, 10000, n, endpoint=True).astype(np.uint32)
    mesh1 = make_mesh()
    gb = dist_groupby_dense(mesh1, G)
    out = np.asarray(gb(shard(mesh1, keys), shard(mesh1, vals)))
    expected = np.zeros(G, np.uint32)
    np.add.at(expected, keys.astype(np.int64), vals)
    assert np.array_equal(out, expected), "multihost groupby mismatch"

    # ---- 2-D (hosts x local chips) mesh: hierarchical join --------------
    A = rng.integers(1, 2000, n, endpoint=True).astype(np.uint32)
    B = rng.integers(1, 2000, n, endpoint=True).astype(np.uint32)
    from collections import Counter

    ca, cb = Counter(A.tolist()), Counter(B.tolist())
    exp_total = sum(ca[k] * cb.get(k, 0) for k in ca)

    mesh2 = make_mesh_2d()  # n_hosts = process_count, all devices
    assert mesh2.shape["dcn"] == nproc
    per_chip = n // n_dev
    cap_ici = (per_chip // local) * 2
    cap_dcn = (per_chip // nproc) * 2
    join = dist_csr_join_2d(
        mesh2, rows_per_chip=per_chip, distinct_cap=2 * cap_dcn,
        ht_size=4 * cap_dcn + 2, cap_ici=cap_ici, cap_dcn=cap_dcn,
    )
    counts, local_totals, total, ov = join(shard(mesh2, A), shard(mesh2, B))
    for s in ov.addressable_shards:  # this process's chips only
        assert int(np.asarray(s.data).sum()) == 0, "shuffle overflow"
    got = int(np.asarray(total).ravel()[0])
    assert got == exp_total, f"multihost join total {got} != {exp_total}"

    print("MULTIHOST_OK", flush=True)


if __name__ == "__main__":
    main()
