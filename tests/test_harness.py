"""Harness-layer tests: options, results/CSV, meter, registry, datagen."""

import os

import numpy as np
import pytest

from dwarf_bench_tpu.common import (
    DeviceType,
    GroupByRunOptions,
    MeasureResults,
    Meter,
    Registry,
    Result,
    GroupByAggResult,
    HashJoinResult,
    RunOptions,
    make_random,
    make_random_uniform_binary,
    make_unique_random,
    parse_device_type,
    to_string,
)


class TestOptions:
    def test_parse_device(self):
        assert parse_device_type("cpu") == DeviceType.CPU
        assert parse_device_type("CPU") == DeviceType.CPU
        assert parse_device_type("tpu") == DeviceType.TPU
        assert parse_device_type("gpu") == DeviceType.TPU  # alias
        assert parse_device_type("igpu") == DeviceType.TPU  # alias
        assert parse_device_type("banana") == DeviceType.DEFAULT

    def test_to_string(self):
        assert to_string(DeviceType.CPU) == "CPU"
        assert to_string(DeviceType.TPU) == "TPU"
        # Default prints as the accelerator (options.cpp:26-28)
        assert to_string(DeviceType.DEFAULT) == "TPU"

    def test_groupby_options_from_options(self):
        o = RunOptions(input_size=[4, 8], iterations=3)
        g = GroupByRunOptions.from_options(o, 20, 1024)
        assert g.groups_count == 20 and g.executors == 1024
        assert g.input_size == [4, 8] and g.iterations == 3


class TestCsv:
    def test_schema_and_append(self, tmp_path):
        """CSV: header only on creation, append mode, buf_size_bytes =
        buf_size*4, ms values (result.cpp:59-91)."""
        path = str(tmp_path / "r.csv")
        mr = MeasureResults("X")
        mr.add_result(
            {"device_type": "CPU", "buf_size": "1024"},
            Result(host_time=0.0015, kernel_time=0.0005),
        )
        mr.write_csv(path)
        mr.write_csv(path)  # append, no second header
        lines = open(path).read().strip().split("\n")
        assert lines[0] == "device_type,buf_size_bytes,host_time_ms,kernel_time_ms"
        assert lines[1] == "CPU,4096,1.5,0.5"
        assert lines[2] == lines[1]
        assert len(lines) == 3

    def test_groupby_header(self, tmp_path):
        path = str(tmp_path / "g.csv")
        mr = MeasureResults("G")
        mr.set_report_header("total_time,group_by_time,reduction_time")
        mr.add_result(
            {"device_type": "TPU", "buf_size": "2"},
            GroupByAggResult(
                host_time=0.003, group_by_time=0.002, reduction_time=0.001
            ),
        )
        mr.write_csv(path)
        lines = open(path).read().strip().split("\n")
        assert lines[0] == (
            "device_type,buf_size_bytes,total_time,group_by_time,reduction_time"
        )
        assert lines[1] == "TPU,8,3,2,1"

    def test_hash_join_result_reports_default_timings(self, tmp_path):
        """HashJoinResult does NOT add build/probe to the CSV
        (no get_reported_timings_list override, result.cpp:20-27)."""
        r = HashJoinResult(
            host_time=0.004, kernel_time=0.0, build_time=0.003,
            probe_time=0.001,
        )
        assert len(r.get_reported_timings_list()) == 2


class TestMeter:
    def test_stable_params_win(self):
        mr = MeasureResults("m")
        m = Meter("m", mr)
        m.set_params({"device_type": "CPU"})
        m.add_result({"buf_size": "8", "device_type": "SHOULD_LOSE"}, Result())
        rec = list(mr)[0]
        # std::map::insert does not overwrite (meter.cpp:3-8)
        assert rec.params["device_type"] == "CPU"
        assert rec.params["buf_size"] == "8"


class TestRegistry:
    def test_populate_and_find(self):
        from dwarf_bench_tpu import populate_registry

        reg = populate_registry()
        for name in (
            "TwoPassScan", "DPLScan", "Radix", "TBBSort", "ReduceDPCPP",
            "HashBuild", "HashBuildNonBitmask", "CuckooHashBuild",
            "SlabHashBuild", "SlabProbe", "Join", "NestedLoopJoin",
            "JoinOmnisci", "SlabJoin", "GroupBy", "GroupByLocal",
            "ConstantExample", "ConstantExampleCAPI", "ConstantExampleDPCPP",
            "DPLScanCuda", "RadixCuda", "JoinOmnisciCuda", "GroupByCuda",
            "ConstantExampleDPCPPCuda",
        ):
            assert reg.find(name) is not None, name
        assert reg.find("NoSuchDwarf") is None
        assert len(reg) == 24


class TestDatagen:
    def test_make_random_range_and_determinism(self):
        a = make_random(10000, seed=7)
        b = make_random(10000, seed=7)
        c = make_random(10000, seed=8)
        assert np.array_equal(a, b)
        assert not np.array_equal(a, c)
        assert a.min() >= 1 and a.max() <= 10000

    def test_make_unique_random_sorted_distinct(self):
        v = make_unique_random(5000, seed=3)
        assert len(v) == 5000
        assert len(np.unique(v)) == 5000
        assert np.array_equal(v, np.sort(v))  # std::set iteration order
        assert v.min() >= 1 and v.max() <= 50000

    def test_binary(self):
        v = make_random_uniform_binary(1000, seed=1)
        assert set(np.unique(v)).issubset({0, 1})


class TestExtendedCsv:
    def test_rows_per_s_column(self, tmp_path):
        path = str(tmp_path / "e.csv")
        mr = MeasureResults("X")
        mr.add_result(
            {"device_type": "TPU", "buf_size": "1000"},
            Result(host_time=0.001, kernel_time=0.0005),
        )
        mr.write_csv(path, extended=True)
        lines = open(path).read().strip().split("\n")
        assert lines[0].endswith(",rows_per_s")
        assert lines[1].endswith(",1000000")  # 1000 rows / 1ms


class TestCompileCache:
    def test_disabled_on_cpu_backend(self):
        # XLA:CPU AOT cache entries are host-feature-keyed and warn/risk
        # SIGILL across plugin configs; the helper must refuse on CPU
        from dwarf_bench_tpu.common.device import (
            enable_persistent_compile_cache,
        )

        assert enable_persistent_compile_cache() is None
