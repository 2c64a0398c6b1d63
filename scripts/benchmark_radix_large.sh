#!/usr/bin/env bash
# Mirrors reference scripts/benchmark_radix_large.sh (25600 .. 134217728).
SIZES="25600 262144 524288 1048576 2097152 4194304 8388608 16777216 33554432 67108864 134217728"
python -m dwarf_bench_tpu Radix --device=tpu --input_size $SIZES --report_path="report_radix.csv" --iterations=9
python -m dwarf_bench_tpu Radix --device=cpu --input_size $SIZES --report_path="report_radix.csv" --iterations=9
