#!/usr/bin/env bash
# Sweep config mirrors the reference scripts/benchmark_twopassscan.sh:
# 100kib, 1mb, 2mb, 4mb, ... 512mb; 9 iterations; append CSV.
SIZES="25600 262144 524288 1048576 2097152 4194304 8388608 16777216 33554432 67108864 134217728"
python -m dwarf_bench_tpu TwoPassScan --device=tpu --input_size $SIZES --report_path="report.csv" --iterations=9
python -m dwarf_bench_tpu TwoPassScan --device=cpu --input_size $SIZES --report_path="report.csv" --iterations=9
