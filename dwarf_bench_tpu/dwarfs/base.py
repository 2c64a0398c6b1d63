"""Shared dwarf machinery: device placement, timing, size iteration.

Timing methodology mirrors the reference (BASELINE.md "Timing methodology"):
``host_time`` is wall time from submission of device inputs to completion
(steady_clock around submit→wait, e.g. sort/radix.cpp:33-35), including the
host→device transfer that SYCL buffers perform lazily inside the timed
region and — on iteration 0 — the JIT compile, exactly like SYCL's kernel
JIT (the analysis convention drops the slowest iteration,
scripts/report-sample.ipynb). ``kernel_time`` is a compute-only re-run with
device-resident inputs (the analog of OpenCL event profiling,
scan/scan.cpp:142-154), populated for every dwarf here rather than only
TwoPassScan.
"""

from __future__ import annotations

import time
from typing import Callable

import jax

from ..common.dwarf import Dwarf
from ..common.device import resolve_device
from ..common.options import RunOptions, to_string
from ..utils.timing import sync


def block(tree):
    """Force execution. NOTE: not plain block_until_ready — some PJRT
    plugins return from it before execution; utils.timing.sync fetches a
    data-dependent scalar instead, which is a real fence."""
    return sync(tree)


class TpuDwarf(Dwarf):
    """Base for all dwarfs: standard init (meter params) and the per-size
    run loop (e.g. sort/radix.cpp:71-81)."""

    def init(self, opts: RunOptions) -> None:
        self.meter().set_opts(opts)
        self.meter().set_params({"device_type": to_string(opts.device_ty)})

    def run(self, opts: RunOptions) -> None:
        # reference dwarfs announce the device per run (e.g. join.cpp:24-25)
        print(f"Selected device: {self.device(opts)}")
        profile_dir = getattr(opts, "profile_dir", "")
        if profile_dir:
            with jax.profiler.trace(profile_dir):
                for size in opts.input_size:
                    self._run(int(size), self.meter())
            return
        for size in opts.input_size:
            self._run(int(size), self.meter())

    def _run(self, buf_size: int, meter) -> None:  # pragma: no cover
        raise NotImplementedError

    # -- helpers -------------------------------------------------------

    def device(self, opts: RunOptions) -> jax.Device:
        return resolve_device(opts.device_ty)

    @staticmethod
    def put(device: jax.Device, *arrays):
        out = tuple(jax.device_put(a, device) for a in arrays)
        return out if len(out) != 1 else out[0]

    @staticmethod
    def timed(fn: Callable, *args):
        """Run fn(*args), fence, return (result, seconds)."""
        t0 = time.perf_counter()
        res = sync(fn(*args))
        return res, time.perf_counter() - t0

    @staticmethod
    def timed_with_transfer(device: jax.Device, fn: Callable, host_arrays):
        """Timed region includes the host→device transfer of the inputs,
        mirroring lazy SYCL buffer movement inside the reference's timer."""
        t0 = time.perf_counter()
        dev = tuple(jax.device_put(a, device) for a in host_arrays)
        res = sync(fn(*dev))
        return res, dev, time.perf_counter() - t0
