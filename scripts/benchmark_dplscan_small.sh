#!/usr/bin/env bash
# Mirrors reference scripts/benchmark_dplscan_small.sh.
SIZES="256 512 1024 2048 4096 8192 16384 32768 65536"
python -m dwarf_bench_tpu DPLScan --device=tpu --input_size $SIZES --report_path="report_dpl_scan_small.csv" --iterations=9
python -m dwarf_bench_tpu DPLScan --device=cpu --input_size $SIZES --report_path="report_dpl_scan_small.csv" --iterations=9
