"""Scan/filter dwarfs: TwoPassScan, DPLScan (+ accelerator-pinned alias).

Reference: scan/scan.{hpp,cpp} + scan/scan.cl (two-pass OpenCL kernel),
scan/dplscan.cpp + scan/dplscan_cuda.cpp (oneDPL copy_if). Both filter
``x < 5`` over ints in [1, 10000] (selectivity ≈ 4/10000).
"""

from __future__ import annotations

import numpy as np

from ..common.datagen import derive_seed, make_random
from ..common.options import DeviceType
from ..common.result import Result
from ..ops.scan import (
    filter_oracle,
    filter_sparse,
    filter_two_pass,
    filter_xla,
)
from .base import TpuDwarf


class _ScanBase(TpuDwarf):
    filter_fn = staticmethod(filter_xla)

    def _run(self, buf_size: int, meter) -> None:
        opts = meter.opts
        host_src = make_random(
            buf_size, seed=derive_seed(opts.seed, buf_size, 0), dtype=np.int32
        )
        expected = filter_oracle(host_src)
        device = self.device(opts)
        fn = self.filter_fn

        for _ in range(opts.iterations):
            (out, cnt), dev, host_time = self.timed_with_transfer(
                device, fn, (host_src,)
            )
            _, kernel_time = self.timed(fn, *dev)
            result = Result(host_time=host_time, kernel_time=kernel_time)
            c = int(cnt)
            result.valid = c == len(expected) and np.array_equal(
                np.asarray(out)[:c], expected
            )
            meter.add_result({"buf_size": str(buf_size)}, result)


class TwoPassScan(_ScanBase):
    """Explicit two-pass filter (kernel structure of scan/scan.cl:3-42:
    per-chunk counts → prefix over chunk counts → placement). On TPU this
    runs the sparsity-adaptive two-phase engine (ops/scan.filter_sparse) —
    the SAME per-chunk-count/prefix/place structure as the reference
    kernel, with the Pallas streaming butterfly (ops/scan_pallas.py) as
    its any-selectivity fallback; on CPU the XLA two-pass formulation."""

    def __init__(self):
        super().__init__("TwoPassScan")

    def _run(self, buf_size: int, meter) -> None:
        device = self.device(meter.opts)
        if device.platform != "cpu":
            self.filter_fn = filter_sparse
        else:
            self.filter_fn = filter_two_pass
        super()._run(buf_size, meter)


class DPLScan(_ScanBase):
    """Vendor-algorithm filter (oneDPL copy_if, dplscan.cpp:43-44) → the
    best available engine: the sparsity-adaptive filter (ops/scan.
    filter_sparse — near read-bound at the benchmark's 0.04% selectivity,
    general-kernel fallback otherwise)."""

    filter_fn = staticmethod(filter_sparse)

    def __init__(self, name: str = "DPLScan"):
        super().__init__(name)


class DPLScanCuda(DPLScan):
    """Accelerator-pinned registry alias (reference: dplscan_cuda.cpp —
    same dwarf steered to the CUDA backend; here: always the TPU chip)."""

    def __init__(self):
        super().__init__("DPLScanCuda")

    def device(self, opts):
        from ..common.device import resolve_device

        return resolve_device(DeviceType.TPU)
