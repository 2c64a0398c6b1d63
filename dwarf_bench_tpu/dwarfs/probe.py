"""SlabProbe: times ONLY the probe phase of the bucketized hash table
(build happens outside the timer — probe/slab_probe.cpp:40-63); keys are
unique (slab_probe.cpp:16)."""

from __future__ import annotations

import numpy as np

from ..common.datagen import derive_seed, make_unique_random
from ..common.result import Result
from ..ops import bucket_hash
from .base import TpuDwarf, block, all_true_on_device


class SlabProbe(TpuDwarf):
    def __init__(self):
        super().__init__("SlabProbe")

    mem_util = 60

    def _run(self, buf_size: int, meter) -> None:
        opts = meter.opts
        keys = make_unique_random(
            buf_size, seed=derive_seed(opts.seed, buf_size, 0)
        )
        device = self.device(opts)
        nb = bucket_hash.calculate_buckets_count(buf_size, self.mem_util)
        dev_keys = self.put(device, keys)
        table = block(bucket_hash.build(dev_keys, dev_keys, nb))  # untimed

        for _ in range(opts.iterations):
            (found, _), host_time = self.timed(
                bucket_hash.find, table, dev_keys
            )
            _, kernel_time = self.kernel_timed(
                buf_size, bucket_hash.find, table, dev_keys
            )
            result = Result(host_time=host_time, kernel_time=kernel_time)
            result.valid = all_true_on_device(found)
            meter.add_result({"buf_size": str(buf_size)}, result)
