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
from functools import partial

from ..ops.scan import (
    filter_oracle,
    filter_sparse,
    filter_two_pass,
    filter_xla,
    sparse_caps_ok,
)
from .base import TpuDwarf


def _sparse_engine(host_src, device):
    """Host-checked engine pick (round-5 verdict item 2, the radix
    host-range-check convention): when the host data verifiably fits the
    sparse pipeline's caps, drop filter_sparse's on-device ``lax.cond``
    fallback construct (0.043 ms of the 0.263 ms 2^24 filter); data that
    could trip a cap keeps the runtime dispatch."""
    if device.platform != "cpu" and sparse_caps_ok(host_src):
        return partial(filter_sparse, assume_sparse=True)
    return filter_sparse


def _outputs_equal(out, expected, c: int, device) -> bool:
    """Oracle compare (scan.cpp:157-164). Device→host transfers over the
    tunneled chip run at ~MB/s, so for large outputs the exact readback is
    replaced by device-side position-weighted checksums (sum, sum·(i+1),
    sum·(i+1)² — all mod 2^32), which detect any value or ordering
    difference with overwhelming probability; small outputs (and CPU runs)
    keep the exact element-wise compare."""
    if c <= (1 << 16) or device.platform == "cpu":
        # slice ON DEVICE so only c elements cross the tunnel, not the
        # whole capacity-sized buffer
        return bool(np.array_equal(np.asarray(out[:c]), expected))
    import jax.numpy as jnp

    o = out[:c].astype(jnp.uint32)
    w = jnp.arange(1, c + 1, dtype=jnp.uint32)
    got = np.asarray(
        jnp.stack([jnp.sum(o), jnp.sum(o * w), jnp.sum(o * w * w)])
    )
    e = expected.astype(np.uint32)
    we = np.arange(1, c + 1, dtype=np.uint32)
    want = np.stack(
        [
            np.sum(e, dtype=np.uint32),
            np.sum(e * we, dtype=np.uint32),
            np.sum(e * we * we, dtype=np.uint32),
        ]
    )
    return bool(np.array_equal(got, want))


class _ScanBase(TpuDwarf):
    filter_fn = staticmethod(filter_xla)

    def pick_engine(self, host_src, device):
        return self.filter_fn

    def _run(self, buf_size: int, meter) -> None:
        opts = meter.opts
        host_src = make_random(
            buf_size, seed=derive_seed(opts.seed, buf_size, 0), dtype=np.int32
        )
        expected = filter_oracle(host_src)
        device = self.device(opts)
        fn = self.pick_engine(host_src, device)

        for _ in range(opts.iterations):
            (out, cnt), dev, host_time = self.timed_with_transfer(
                device, fn, (host_src,)
            )
            _, kernel_time = self.kernel_timed(buf_size, fn, *dev)
            result = Result(host_time=host_time, kernel_time=kernel_time)
            c = int(cnt)
            result.valid = c == len(expected) and _outputs_equal(
                out, expected, c, device
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

    def pick_engine(self, host_src, device):
        if device.platform != "cpu":
            return _sparse_engine(host_src, device)
        return filter_two_pass


class DPLScan(_ScanBase):
    """Vendor-algorithm filter (oneDPL copy_if, dplscan.cpp:43-44) → the
    best available engine: the sparsity-adaptive filter (ops/scan.
    filter_sparse — near read-bound at the benchmark's 0.04% selectivity,
    general-kernel fallback otherwise)."""

    filter_fn = staticmethod(filter_sparse)

    def __init__(self, name: str = "DPLScan"):
        super().__init__(name)

    def pick_engine(self, host_src, device):
        return _sparse_engine(host_src, device)


class DPLScanCuda(DPLScan):
    """Accelerator-pinned registry alias (reference: dplscan_cuda.cpp —
    same dwarf steered to the CUDA backend; here: always the TPU chip)."""

    def __init__(self):
        super().__init__("DPLScanCuda")

    def device(self, opts):
        from ..common.device import resolve_device

        return resolve_device(DeviceType.TPU)
