"""Join dwarfs: Join, NestedLoopJoin, JoinOmnisci (+Cuda alias), SlabJoin.

Reference:
  * Join (join/join.cpp): 1:1 hash join over unique keys; build/probe time
    split (join.cpp:111-113); order-insensitive compare vs. seq_join oracle.
  * NestedLoopJoin (join/nested_join.cpp): O(n²) dense compare.
  * JoinOmnisci (join/join_omnisci.cpp): one-to-many CSR-index join over
    duplicate keys; build = table + id buffer, probe = lookup views.
  * SlabJoin (join/slab_join.cpp): hash join through the slab (bucketized)
    table; unique keys; build/probe split.
"""

from __future__ import annotations

import time

import numpy as np

from ..common.datagen import derive_seed, make_random, make_unique_random
from ..common.options import DeviceType
from ..common.result import HashJoinResult
from .. import native
from ..ops import bucket_hash, csr_join
from ..ops import join as join_ops
from ..ops.primitives import compact_multi
from .base import TpuDwarf, block, rows_equal_on_device

import jax
import jax.numpy as jnp


class Join(TpuDwarf):
    def __init__(self):
        super().__init__("Join")

    def _run(self, buf_size: int, meter) -> None:
        opts = meter.opts
        s = lambda i: derive_seed(opts.seed, buf_size, i)
        a_keys = make_unique_random(buf_size, seed=s(0))
        a_vals = make_unique_random(buf_size, seed=s(1))
        b_keys = make_unique_random(buf_size, seed=s(2))
        b_vals = make_unique_random(buf_size, seed=s(3))
        expected = native.seq_join_sorted(a_keys, a_vals, b_keys, b_vals)
        device = self.device(opts)
        ht_size = 2 * buf_size  # join.cpp:28
        hseed = derive_seed(opts.seed, buf_size, 4) & 0xFFFFFFFF

        for _ in range(opts.iterations):
            t0 = time.perf_counter()
            da_k, da_v, db_k, db_v = self.put(
                device, a_keys, a_vals, b_keys, b_vals
            )
            table = block(
                join_ops.hash_join_build(da_k, da_v, ht_size, np.uint32(hseed))
            )
            t_build = time.perf_counter()
            res = block(
                join_ops.hash_join_probe(table, db_k, db_v, np.uint32(hseed))
            )
            t_end = time.perf_counter()
            result = HashJoinResult(
                host_time=t_end - t0,
                build_time=t_build - t0,
                probe_time=t_end - t_build,
            )
            result.valid = rows_equal_on_device(
                (res.keys, res.a_vals, res.b_vals), res.count, expected
            )
            meter.add_result({"buf_size": str(buf_size)}, result)


class NestedLoopJoin(TpuDwarf):
    def __init__(self):
        super().__init__("NestedLoopJoin")

    def _run(self, buf_size: int, meter) -> None:
        opts = meter.opts
        s = lambda i: derive_seed(opts.seed, buf_size, i)
        a_keys = make_unique_random(buf_size, seed=s(0))
        a_vals = make_unique_random(buf_size, seed=s(1))
        b_keys = make_unique_random(buf_size, seed=s(2))
        b_vals = make_unique_random(buf_size, seed=s(3))
        expected = native.seq_join_sorted(a_keys, a_vals, b_keys, b_vals)
        device = self.device(opts)

        for _ in range(opts.iterations):
            res, dev, host_time = self.timed_with_transfer(
                device, join_ops.nested_loop_join,
                (a_keys, a_vals, b_keys, b_vals),
            )
            _, kernel_time = self.kernel_timed(
                buf_size, join_ops.nested_loop_join, *dev
            )
            result = HashJoinResult(
                host_time=host_time, kernel_time=kernel_time
            )
            result.valid = rows_equal_on_device(
                (res.keys, res.a_vals, res.b_vals), res.count, expected
            )
            meter.add_result({"buf_size": str(buf_size)}, result)


def _validate_csr_join_large(a_keys, b_keys, da_k, table, res) -> bool:
    """CSR-join oracle for sizes where full readbacks are impractical over
    the tunneled chip (the reference's id-set oracle, join_omnisci.cpp:15-45,
    reads the whole table back — on this link that is minutes per run).

    Three checks, together equivalent to the id-set oracle up to checksum
    collision odds: (1) id_buffer is a permutation of [0, n) — device-side
    multiset checksums; (2) id_buffer is grouped by key — A[id_buffer] is
    non-decreasing (device gather + reduction); (3) per-probe (found, pos,
    count) match exact host-computable oracles at 8192 sampled queries
    (count = A's key histogram at the query key; pos = #A keys below the
    query key — both paths construct pos exactly so)."""
    import jax.numpy as jnp

    n = len(a_keys)
    idb = table.id_buffer.astype(jnp.uint32)
    got = np.asarray(
        jnp.stack([jnp.sum(idb), jnp.sum(idb * idb), jnp.sum(idb * idb * idb)])
    )
    e = np.arange(n, dtype=np.uint32)
    want = np.stack(
        [
            np.sum(e, dtype=np.uint32),
            np.sum(e * e, dtype=np.uint32),
            np.sum(e * e * e, dtype=np.uint32),
        ]
    )
    if not np.array_equal(got, want):
        return False
    gk = da_k.astype(jnp.uint32)[table.id_buffer.astype(jnp.int32)]
    if not bool(np.asarray(jnp.all(gk[1:] >= gk[:-1]))):
        return False

    srng = np.random.default_rng(12345)
    idx = srng.choice(len(b_keys), size=min(8192, len(b_keys)),
                      replace=False)
    didx = jnp.asarray(idx.astype(np.int32))
    s_found = np.asarray(res.found[didx])
    s_pos = np.asarray(res.pos[didx])
    s_cnt = np.asarray(res.counts[didx])
    qs = b_keys[idx]
    ak_sorted = np.sort(a_keys.astype(np.uint64))
    lo = np.searchsorted(ak_sorted, qs.astype(np.uint64), side="left")
    hi = np.searchsorted(ak_sorted, qs.astype(np.uint64), side="right")
    exp_cnt = (hi - lo).astype(np.int64)
    exp_found = exp_cnt > 0
    if not np.array_equal(s_found, exp_found):
        return False
    m = exp_found
    return bool(
        np.array_equal(s_cnt[m], exp_cnt[m])
        and np.array_equal(s_pos[m].astype(np.int64), lo[m])
    )


class JoinOmnisci(TpuDwarf):
    def __init__(self, name: str = "JoinOmnisci"):
        super().__init__(name)

    def _run(self, buf_size: int, meter) -> None:
        opts = meter.opts
        s = lambda i: derive_seed(opts.seed, buf_size, i)
        a_keys = make_random(buf_size, seed=s(0), dtype=np.uint32)
        b_keys = make_random(buf_size, seed=s(1), dtype=np.uint32)
        # host-side distinct count sizes the table (join_omnisci.cpp:55-69);
        # the same host knowledge picks the dense (narrow-key) engine when
        # both columns fit one 2^14 window — true for the [1, 10000] datagen
        unique_keys = len(np.unique(a_keys))
        ht_size = unique_keys * 2
        distinct_cap = unique_keys
        dense = csr_join.dense_applicable(a_keys, b_keys)
        # hi_rows pinned to 128: the range-aware variant measured slower
        # (the MXU pads skinny tables to 128 sublanes; measure_r4.py g6)
        hi_rows = 128
        device = self.device(opts)

        for _ in range(opts.iterations):
            t0 = time.perf_counter()
            da_k, db_k = self.put(device, a_keys, b_keys)
            if dense:
                table = block(csr_join.build_dense(da_k))
            else:
                table = block(csr_join.build(da_k, distinct_cap, ht_size))
            t_build = time.perf_counter()
            if dense:
                res = block(csr_join.probe_dense(table, db_k,
                                                 hi_rows=hi_rows))
            else:
                res = block(csr_join.probe_merge(table, db_k))
            t_end = time.perf_counter()
            result = HashJoinResult(
                host_time=t_end - t0,
                build_time=t_build - t0,
                probe_time=t_end - t_build,
            )
            if buf_size <= (1 << 16):
                result.valid = native.validate_csr_join(
                    a_keys,
                    b_keys,
                    np.asarray(res.pos),
                    np.where(
                        np.asarray(res.found), np.asarray(res.counts), 0
                    ),
                    np.asarray(table.id_buffer),
                )
            else:
                # O(n) device→host readbacks take minutes over the tunnel
                # at benchmark sizes; validate structurally on device plus
                # exact sampled probes against host oracles instead
                result.valid = _validate_csr_join_large(
                    a_keys, b_keys, da_k, table, res
                )
            meter.add_result({"buf_size": str(buf_size)}, result)


class JoinOmnisciCuda(JoinOmnisci):
    """Accelerator-pinned alias (join/join_omnisci_cuda.cpp)."""

    def __init__(self):
        super().__init__("JoinOmnisciCuda")

    def device(self, opts):
        from ..common.device import resolve_device

        return resolve_device(DeviceType.TPU)


@jax.jit
def _slab_probe_join(table, b_keys, b_vals):
    found, a_val = bucket_hash.find(table, b_keys)
    (k, av, bv), count = compact_multi(
        (b_keys.astype(jnp.uint32), a_val.astype(jnp.uint32),
         b_vals.astype(jnp.uint32)),
        found,
    )
    return join_ops.JoinResult(k, av, bv, count)


class SlabJoin(TpuDwarf):
    def __init__(self):
        super().__init__("SlabJoin")

    def _run(self, buf_size: int, meter) -> None:
        opts = meter.opts
        s = lambda i: derive_seed(opts.seed, buf_size, i)
        a_keys = make_unique_random(buf_size, seed=s(0))
        a_vals = make_unique_random(buf_size, seed=s(1))
        b_keys = make_unique_random(buf_size, seed=s(2))
        b_vals = make_unique_random(buf_size, seed=s(3))
        expected = native.seq_join_sorted(a_keys, a_vals, b_keys, b_vals)
        device = self.device(opts)
        # fixed bucket count like the reference's BUCKETS_COUNT=1024
        # (slab_hash.hpp:24-26)
        nb = 1024

        for _ in range(opts.iterations):
            t0 = time.perf_counter()
            da_k, da_v, db_k, db_v = self.put(
                device, a_keys, a_vals, b_keys, b_vals
            )
            table = block(bucket_hash.build(da_k, da_v, nb))
            t_build = time.perf_counter()
            res = block(_slab_probe_join(table, db_k, db_v))
            t_end = time.perf_counter()
            result = HashJoinResult(
                host_time=t_end - t0,
                build_time=t_build - t0,
                probe_time=t_end - t_build,
            )
            result.valid = rows_equal_on_device(
                (res.keys, res.a_vals, res.b_vals), res.count, expected
            )
            meter.add_result({"buf_size": str(buf_size)}, result)
