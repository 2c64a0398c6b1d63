#!/usr/bin/env bash
# Mirrors reference scripts/benchmark_dplscan_large_cuda.sh: the accelerator-pinned alias sweep.
# The reference pins SYCL to CUDA via SYCL_DEVICE_FILTER + the *Cuda
# registry name; here the *Cuda dwarfs pin the TPU device the same way.
python -m dwarf_bench_tpu DPLScanCuda --device=tpu --input_size 25600 262144 524288 1048576 2097152 4194304 8388608 16777216 33554432 67108864 134217728 --report_path="report_dpl_scan.csv" --iterations=9
