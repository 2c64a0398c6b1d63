#!/usr/bin/env bash
# Mirrors reference scripts/benchmark_radix_small.sh (256 .. 65536, 9 iters).
SIZES="256 512 1024 2048 4096 8192 16384 32768 65536"
python -m dwarf_bench_tpu Radix --device=tpu --input_size $SIZES --report_path="report_radix_small.csv" --iterations=9
python -m dwarf_bench_tpu Radix --device=cpu --input_size $SIZES --report_path="report_radix_small.csv" --iterations=9
