"""Library usage demo — the equivalent of example/bench_usage/main.cpp:19-33:
run two dwarfs through the public facade and print per-run measurements."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from dwarf_bench_tpu import ApiDeviceType, DwarfBench, DwarfKind, RunConfig


def main() -> None:
    db = DwarfBench()
    for kind in (DwarfKind.Sort, DwarfKind.GroupBy):
        conf = RunConfig(
            device=ApiDeviceType.CPU,
            input_size=1024,
            iterations=10,
            dwarf=kind,
        )
        for m in db.make_measurements(conf):
            print(f"{kind.value}: dataSize={m.data_size} "
                  f"microseconds={m.microseconds}")


if __name__ == "__main__":
    main()
