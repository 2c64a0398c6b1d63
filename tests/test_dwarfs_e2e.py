"""End-to-end dwarf suites — the equivalent of
tests/dwarf_tests/dwarf_tests.cpp:25-88: for each dwarf × size grid, run
init/run and assert every Result.valid. The oracle validation inside each
dwarf run IS the test assertion, exactly like the reference. GroupBy
variants use groups_count=64, executors=1024 (utils.cpp:39-47).
"""

import contextlib
import io

import pytest

from dwarf_bench_tpu import (
    DeviceType,
    GroupByRunOptions,
    RunOptions,
    populate_registry,
)

SIZES = [128, 256, 512, 1024, 2048, 4096]  # dwarf_tests.cpp:44-58
ITERATIONS = 2  # fast tier: trimmed for CI speed
SLOW_ITERATIONS = 10  # slow tier: the reference's convention (utils.cpp:19)

PLAIN_DWARFS = [
    "TwoPassScan",
    "DPLScan",
    "Radix",
    "TBBSort",
    "ReduceDPCPP",
    "HashBuild",
    "HashBuildNonBitmask",
    "CuckooHashBuild",
    "SlabHashBuild",
    "SlabProbe",
    "Join",
    "NestedLoopJoin",
    "JoinOmnisci",
    "SlabJoin",
]
GROUPBY_DWARFS = ["GroupBy", "GroupByLocal"]


def _run(name: str, sizes, groups_count=64, executors=1024,
         iterations=ITERATIONS):
    reg = populate_registry()
    dwarf = reg.find(name)
    assert dwarf is not None
    opts = RunOptions(
        device_ty=DeviceType.CPU,
        input_size=list(sizes),
        iterations=iterations,
        seed=42,
    )
    if "GroupBy" in name:
        opts = GroupByRunOptions.from_options(opts, groups_count, executors)
    dwarf.clear_results()
    with contextlib.redirect_stdout(io.StringIO()):
        dwarf.init(opts)
        dwarf.run(opts)
    results = list(dwarf.get_results())
    assert len(results) == len(sizes) * iterations
    for rec in results:
        assert rec.result.valid, (name, rec.params)
    return results


@pytest.mark.parametrize("name", PLAIN_DWARFS)
def test_dwarf_valid_small_sizes(name):
    _run(name, SIZES[:3])


@pytest.mark.parametrize("name", PLAIN_DWARFS)
@pytest.mark.slow
def test_dwarf_valid_large_sizes(name):
    _run(name, SIZES[3:], iterations=SLOW_ITERATIONS)


@pytest.mark.parametrize("name", GROUPBY_DWARFS)
@pytest.mark.parametrize("size", SIZES)
def test_groupby_valid(name, size):
    _run(name, [size])


def test_host_time_populated():
    results = _run("DPLScan", [128])
    for rec in results:
        assert rec.result.host_time > 0


def test_join_phase_split():
    results = _run("Join", [128])
    for rec in results:
        r = rec.result
        assert r.build_time > 0 and r.probe_time > 0
        assert abs((r.build_time + r.probe_time) - r.host_time) < 1e-6


def test_groupby_local_phase_split():
    results = _run("GroupByLocal", [256])
    for rec in results:
        r = rec.result
        assert r.group_by_time > 0 and r.reduction_time > 0
