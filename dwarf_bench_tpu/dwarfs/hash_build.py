"""Hash-table build dwarfs: HashBuild, HashBuildNonBitmask, CuckooHashBuild,
SlabHashBuild.

Reference pipelines (hash/*.cpp): generate keys, build the table on device
(one insert per work-item with atomics), then a probe-all pass; validation
asserts every inserted key is found. Here builds are the sort+scan parking
construction / batched cuckoo rounds / bucketized sort (ops/), probes are
vectorized chain walks or 2-probe gathers.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..common.datagen import derive_seed, make_random, make_unique_random
from ..common.result import Result
from ..ops import bucket_hash, cuckoo, hashtable
from ..ops.hashing import murmur3_32, simple_hash
from .base import TpuDwarf, block, all_true_on_device


@partial(jax.jit, static_argnames=("ht_size",))
def _murmur_build_probe(keys, ht_size: int, seed):
    """HashBuild pipeline: murmur homes, parking build, probe-all
    (hash/hash_build.cpp:43-75; ht_size = 2×input, hash_build.cpp:18)."""
    home = murmur3_32(keys, seed, ht_size)
    table = hashtable.build(keys, home, ht_size)
    found, _ = hashtable.probe(table, keys, home)
    return found


@partial(jax.jit, static_argnames=("ht_size",))
def _simple_build_probe(keys, ht_size: int):
    """HashBuildNonBitmask pipeline: SimpleHasher homes, ht_size = input
    size (hash_build_non_bitmask.cpp:18-44). The reference's ``insert``
    dedups equal keys into one slot (CAS probe stops on key match,
    hashtable.hpp:155-172), so build over the distinct keys."""
    n = keys.shape[0]
    k = keys.astype(jnp.uint32)
    sk = jax.lax.sort(k)
    is_first = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])
    home = simple_hash(sk, ht_size)
    home = jnp.where(is_first, home, jnp.uint32(ht_size))  # dup → masked out
    table = hashtable.build(sk, home, ht_size, valid=is_first)
    found, _ = hashtable.probe(table, k, simple_hash(k, ht_size))
    return found


class HashBuild(TpuDwarf):
    def __init__(self):
        super().__init__("HashBuild")

    def _run(self, buf_size: int, meter) -> None:
        opts = meter.opts
        keys = make_random(
            buf_size, seed=derive_seed(opts.seed, buf_size, 0), dtype=np.uint32
        )
        # hasher seeded once per size, used for all iterations
        # (hash_build.cpp:20)
        hseed = derive_seed(opts.seed, buf_size, 1) & 0xFFFFFFFF
        device = self.device(opts)
        ht_size = 2 * buf_size
        fn = lambda k: _murmur_build_probe(k, ht_size, np.uint32(hseed))

        for _ in range(opts.iterations):
            found, dev, host_time = self.timed_with_transfer(
                device, fn, (keys,)
            )
            _, kernel_time = self.kernel_timed(buf_size, fn, *dev)
            result = Result(host_time=host_time, kernel_time=kernel_time)
            result.valid = all_true_on_device(found)
            meter.add_result({"buf_size": str(buf_size)}, result)


class HashBuildNonBitmask(TpuDwarf):
    def __init__(self):
        super().__init__("HashBuildNonBitmask")

    def _run(self, buf_size: int, meter) -> None:
        opts = meter.opts
        keys = make_random(
            buf_size, seed=derive_seed(opts.seed, buf_size, 0), dtype=np.uint32
        )
        device = self.device(opts)
        fn = lambda k: _simple_build_probe(k, buf_size)

        for _ in range(opts.iterations):
            found, dev, host_time = self.timed_with_transfer(
                device, fn, (keys,)
            )
            _, kernel_time = self.kernel_timed(buf_size, fn, *dev)
            result = Result(host_time=host_time, kernel_time=kernel_time)
            result.valid = all_true_on_device(found)
            meter.add_result({"buf_size": str(buf_size)}, result)


class CuckooHashBuild(TpuDwarf):
    """Host-controlled retry loop: build with two seeded murmur hashers;
    on non-convergence re-randomize both seeds and rebuild — timing covers
    all attempts (cuckoo_hash_build.cpp:41-93)."""

    def __init__(self):
        super().__init__("CuckooHashBuild")

    def _run(self, buf_size: int, meter) -> None:
        import time

        opts = meter.opts
        keys = make_unique_random(buf_size, seed=derive_seed(opts.seed, buf_size, 0))
        device = self.device(opts)
        ht_size = 4 * buf_size  # cuckoo_hash_build.cpp:14
        # The reference bounds each key's EVICTION CHAIN at
        # min(input, 1e5) steps (cuckoo_hashtable.hpp:45). In the
        # bulk-synchronous re-derivation one ROUND advances every
        # unresident key's chain by one step, so rounds ≈ the longest
        # chain — but a round costs O(n) device work, and an unlucky
        # seed pair spinning toward 1e5 rounds runs a quasi-infinite
        # device program (the TPU worker kills it: the round-4 "worker
        # crashed" fault at 2^22+). 256 rounds is far past convergence
        # at 4x slots (measured ~18-20 at 2^22-2^24); non-convergence
        # reports success=False and the host loop re-seeds, exactly the
        # reference's failure-detection semantics.
        max_iters = min(buf_size, 256)

        for it in range(opts.iterations):
            dev_keys = self.put(device, keys)
            t0 = time.perf_counter()
            attempt = 0
            while True:
                s1 = derive_seed(opts.seed, buf_size, 1, it, attempt) & 0xFFFFFFFF
                s2 = derive_seed(opts.seed, buf_size, 2, it, attempt) & 0xFFFFFFFF
                table = block(
                    cuckoo.build(
                        dev_keys, ht_size, np.uint32(s1), np.uint32(s2),
                        max_iters,
                    )
                )
                if bool(table.success):
                    break
                attempt += 1
            host_time = time.perf_counter() - t0
            found, kernel_time = self.kernel_timed(
                buf_size, cuckoo.has, table, dev_keys
            )
            result = Result(host_time=host_time, kernel_time=kernel_time)
            result.valid = all_true_on_device(found)
            meter.add_result({"buf_size": str(buf_size)}, result)


class SlabHashBuild(TpuDwarf):
    """Bucketized build over possibly-duplicate keys
    (slab_hash_build.cpp:17, bucket heuristic slab_hash.hpp:30-58);
    validated by a find-all pass (slab_hash_build.cpp:78-95)."""

    def __init__(self, name: str = "SlabHashBuild"):
        super().__init__(name)

    mem_util = 60

    def _make_keys(self, buf_size: int, seed: int) -> np.ndarray:
        return make_random(buf_size, seed=seed, dtype=np.uint32)

    def _run(self, buf_size: int, meter) -> None:
        opts = meter.opts
        keys = self._make_keys(buf_size, derive_seed(opts.seed, buf_size, 0))
        device = self.device(opts)
        nb = bucket_hash.calculate_buckets_count(buf_size, self.mem_util)
        build = lambda k: bucket_hash.build(k, k, nb)

        for _ in range(opts.iterations):
            table, dev, host_time = self.timed_with_transfer(
                device, build, (keys,)
            )
            _, kernel_time = self.kernel_timed(buf_size, build, *dev)
            found, _ = block(bucket_hash.find(table, dev[0]))
            result = Result(host_time=host_time, kernel_time=kernel_time)
            result.valid = all_true_on_device(found)
            meter.add_result({"buf_size": str(buf_size)}, result)
