"""Library API + CLI tests (bench.hpp facade, main.cpp flags)."""

import contextlib
import io
import os

import pytest

from dwarf_bench_tpu import (
    ApiDeviceType,
    DwarfBench,
    DwarfBenchException,
    DwarfKind,
    RunConfig,
)
from dwarf_bench_tpu.cli import is_groupby, main


class TestLibraryApi:
    @pytest.mark.parametrize(
        "kind", [DwarfKind.Scan, DwarfKind.Sort, DwarfKind.GroupBy,
                 DwarfKind.Join]
    )
    def test_make_measurements(self, kind):
        db = DwarfBench()
        conf = RunConfig(
            device=ApiDeviceType.CPU, input_size=256, iterations=2, dwarf=kind
        )
        with contextlib.redirect_stdout(io.StringIO()):
            ms = db.make_measurements(conf)
        assert len(ms) == 2
        for m in ms:
            # data_size quirk preserved: element count, not bytes
            # (bench.cpp:96-98)
            assert m.data_size == 256
            assert m.microseconds >= 0

    def test_gpu_alias_is_tpu(self):
        assert ApiDeviceType.GPU is ApiDeviceType.TPU


class TestCli:
    def test_is_groupby(self):
        assert is_groupby("GroupBy") and is_groupby("GroupByLocal")
        assert not is_groupby("Radix")

    def test_list(self, capsys):
        assert main(["list"]) == 0
        out = capsys.readouterr().out
        assert "Radix" in out and "JoinOmnisci" in out

    def test_unknown_dwarf(self):
        assert main(["NoSuchDwarf"]) == 1

    def test_run_with_report(self, tmp_path, capsys):
        path = str(tmp_path / "report.csv")
        rc = main(
            [
                "Radix",
                "--device=cpu",
                "--input_size", "128", "256",
                "--iterations=2",
                f"--report_path={path}",
            ]
        )
        assert rc == 0
        lines = open(path).read().strip().split("\n")
        assert lines[0] == "device_type,buf_size_bytes,host_time_ms,kernel_time_ms"
        assert len(lines) == 1 + 2 * 2  # sizes × iterations
        assert lines[1].startswith("CPU,512,")
        assert lines[3].startswith("CPU,1024,")

    def test_groupby_flags(self, tmp_path, capsys):
        path = str(tmp_path / "g.csv")
        rc = main(
            [
                "GroupByLocal",
                "--device=cpu",
                "--input_size", "256",
                "--iterations=1",
                "--groups_count=16",
                "--executors=8",
                f"--report_path={path}",
            ]
        )
        assert rc == 0
        lines = open(path).read().strip().split("\n")
        assert lines[0] == (
            "device_type,buf_size_bytes,total_time,group_by_time,reduction_time"
        )
