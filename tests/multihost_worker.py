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
        dist_csr_join_skew,
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

    # ---- 1-D global mesh: SKEW join across the process boundary ---------
    # BASELINE config #5: distributed shuffle + skewed keys across N >= 2
    # hosts. The heavy-key candidate-election protocol (local top-k sort →
    # all_gather → psum of exact global counts) and the heavy-row
    # broadcast all cross real process boundaries here; per-row uint64
    # exactness mirrors TestDistJoinAtScale::test_skew_join_at_scale.
    As = rng.integers(1, 5000, n, endpoint=True).astype(np.uint32)
    Bs = rng.integers(1, 5000, n, endpoint=True).astype(np.uint32)
    hot = rng.random(n) < 0.20  # one key holds 20% of both sides
    As[hot] = np.uint32(7)
    hot_b = rng.random(n) < 0.20
    Bs[hot_b] = np.uint32(7)
    per_chip = n // n_dev
    cap = (per_chip // n_dev) * 2  # uniform-sized slots: the plain hash
    # shuffle would overflow the heavy key's chip at >2x expectation
    skew = dist_csr_join_skew(
        mesh1, rows_per_chip=per_chip, distinct_cap=n_dev * cap,
        ht_size=2 * n_dev * cap + 2, shuffle_capacity=cap,
    )
    light, heavy, total_s, ov = skew(shard(mesh1, As), shard(mesh1, Bs))
    for s in ov.addressable_shards:
        assert int(np.asarray(s.data).sum()) == 0, "skew shuffle overflow"
    ca = np.zeros(5001, np.uint64)
    np.add.at(ca, As.astype(np.int64), 1)
    cbs = np.zeros(5001, np.uint64)
    np.add.at(cbs, Bs.astype(np.int64), 1)
    exp_total_s = int(np.sum(ca * cbs))
    assert exp_total_s < 2**31  # int32 device total is exact at this size
    got_s = int(np.asarray(total_s).ravel()[0])
    assert got_s == exp_total_s, f"skew total {got_s} != {exp_total_s}"
    # heavy counts are per LOCAL B row in original order: each process
    # checks exact per-row values on ITS shards (chip c owns global B
    # rows [c*per_chip, (c+1)*per_chip))
    exp_heavy = np.where(Bs == 7, ca[7], 0).astype(np.uint64)
    checked = 0
    for s in heavy.addressable_shards:
        c = s.index[0].start  # global chip row of this (1, per_chip) shard
        rows = np.asarray(s.data).reshape(-1).astype(np.uint64)
        lo = c * per_chip
        assert np.array_equal(rows, exp_heavy[lo : lo + per_chip]), (
            "skew heavy rows", c
        )
        checked += 1
    assert checked == local, checked

    print("MULTIHOST_OK", flush=True)


if __name__ == "__main__":
    main()
