"""Shared dwarf machinery: device placement, timing, size iteration.

Timing methodology mirrors the reference (BASELINE.md "Timing methodology"):
``host_time`` is wall time from submission of device inputs to completion
(steady_clock around submit→wait, e.g. sort/radix.cpp:33-35), including the
host→device transfer that SYCL buffers perform lazily inside the timed
region and — on iteration 0 — the JIT compile, exactly like SYCL's kernel
JIT (the analysis convention drops the slowest iteration,
scripts/report-sample.ipynb). ``kernel_time`` is a compute-only measurement
with device-resident inputs (the analog of OpenCL event profiling,
scan/scan.cpp:142-154), populated for every dwarf here rather than only
TwoPassScan. It uses queue-k amortized timing (utils/timing.time_amortized):
a single timed call includes one dispatch plus the scalar-fence roundtrip,
which at small sizes measures tunnel latency, not the kernel. The amortized
number is measured once per (dwarf, size) and reported on every iteration
row — the kernel time of a fixed program on fixed shapes is
iteration-invariant.
"""

from __future__ import annotations

import time
from typing import Callable

import jax

from ..common.dwarf import Dwarf
from ..common.device import resolve_device
from ..common.options import RunOptions, to_string
from ..utils.timing import sync, time_amortized


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

    def kernel_timed(self, cache_key, fn: Callable, *args):
        """(result, amortized device seconds) for the CSV kernel_time
        column. Queue-k timing (utils/timing.time_amortized) — at small
        sizes a single fenced call measures the tunnel roundtrip, not the
        kernel. Measured once per (dwarf instance, cache_key) and reused
        across iterations; the result is re-executed each call so callers
        that consume it (e.g. cuckoo's has-check) stay per-iteration."""
        res = sync(fn(*args))
        cache = getattr(self, "_kt_cache", None)
        if cache is None:
            cache = self._kt_cache = {}
        if cache_key not in cache:
            cache[cache_key] = time_amortized(fn, *args, k=4, warmup=0)
        return res, cache[cache_key]

    @staticmethod
    def timed_with_transfer(device: jax.Device, fn: Callable, host_arrays):
        """Timed region includes the host→device transfer of the inputs,
        mirroring lazy SYCL buffer movement inside the reference's timer."""
        t0 = time.perf_counter()
        dev = tuple(jax.device_put(a, device) for a in host_arrays)
        res = sync(fn(*dev))
        return res, dev, time.perf_counter() - t0


# -- tunnel-friendly validation helpers ---------------------------------
#
# Device→host transfers on the tunneled chip run at ~MB/s, so validations
# must never ship O(n) arrays to the host at benchmark sizes. Reductions
# happen on device; large array compares go through position-weighted /
# multiset checksums (mod-2^32 sums that detect any difference with
# overwhelming probability). CPU runs and small outputs keep exact
# element-wise compares — the CPU test suite therefore always exercises
# the exact path, and tests/test_dwarfs_e2e covers the checksum helpers
# directly.

_EXACT_LIMIT = 1 << 16


def all_true_on_device(flags) -> bool:
    """all(flags) with only a scalar crossing the device boundary."""
    import jax.numpy as jnp
    import numpy as np

    return bool(np.asarray(jnp.all(flags)))


def _multiset_sums_host(e):
    import numpy as np

    e = np.asarray(e, np.uint32)
    return np.stack(
        [
            np.uint32(len(e) & 0xFFFFFFFF),
            np.sum(e, dtype=np.uint32),
            np.sum(e * e, dtype=np.uint32),
            np.sum(e * e * e, dtype=np.uint32),
        ]
    )


def sorted_equal_on_device(out, expected, force_checksum=False) -> bool:
    """out (device) == expected (host, sorted ascending): exact readback for
    small/CPU outputs; otherwise device-side sortedness + order-independent
    multiset checksums (count, Σx, Σx², Σx³ mod 2^32)."""
    import jax.numpy as jnp
    import numpy as np

    n = out.shape[0]
    if not force_checksum and (
        n <= _EXACT_LIMIT or out.devices().pop().platform == "cpu"
    ):
        return bool(np.array_equal(np.asarray(out), expected))
    o = out.astype(jnp.uint32)
    nondec = jnp.all(out[1:] >= out[:-1])
    sums = jnp.stack(
        [
            jnp.uint32(n & 0xFFFFFFFF),
            jnp.sum(o),
            jnp.sum(o * o),
            jnp.sum(o * o * o),
        ]
    )
    if not bool(np.asarray(nondec)):
        return False
    return bool(np.array_equal(np.asarray(sums), _multiset_sums_host(expected)))


def rows_equal_on_device(cols, count, expected_rows,
                         force_checksum=False) -> bool:
    """Order-insensitive compare of a device row set (tuple of columns +
    valid count) against host ``expected_rows`` (r, ncols) — the TPU analog
    of the reference's sorted row compare (join/join_helpers.hpp:86-125).
    Small/CPU: exact via host sort. Large: multiset checksum over a mixed
    row hash (mod-2^32), order-free on both sides."""
    import jax.numpy as jnp
    import numpy as np

    c = int(count)
    expected_rows = np.asarray(expected_rows, np.uint64)
    if c != len(expected_rows):
        return False
    n = cols[0].shape[0]
    on_cpu = cols[0].devices().pop().platform == "cpu"
    if not force_checksum and (c <= _EXACT_LIMIT or on_cpu):
        got = np.stack(
            [np.asarray(col[:c]).astype(np.uint64) for col in cols], axis=1
        )
        order = np.lexsort(got.T[::-1])
        eorder = np.lexsort(expected_rows.T[::-1])
        return bool(np.array_equal(got[order], expected_rows[eorder]))

    # mixing constants (odd -> bijective mod 2^32 per column term)
    mix = (2654435761, 2246822519, 3266489917, 668265263)
    valid = jnp.arange(n) < count

    h = jnp.zeros((n,), jnp.uint32)
    for j, col in enumerate(cols):
        v = col.astype(jnp.uint32)
        h = h + v * jnp.uint32(mix[j % 4]) + (v ^ (v >> 7))
    hv = jnp.where(valid, h, 0)
    sums = jnp.stack([jnp.sum(hv), jnp.sum(hv * hv)])

    eh = np.zeros((len(expected_rows),), np.uint32)
    for j in range(expected_rows.shape[1]):
        v = expected_rows[:, j].astype(np.uint32)
        eh = eh + v * np.uint32(mix[j % 4]) + (v ^ (v >> np.uint32(7)))
    esums = np.stack(
        [np.sum(eh, dtype=np.uint32), np.sum(eh * eh, dtype=np.uint32)]
    )
    return bool(np.array_equal(np.asarray(sums), esums))
