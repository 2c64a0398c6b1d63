#!/usr/bin/env bash
# Mirrors reference scripts/benchmark_radix_small_cuda.sh: the accelerator-pinned alias sweep.
# The reference pins SYCL to CUDA via SYCL_DEVICE_FILTER + the *Cuda
# registry name; here the *Cuda dwarfs pin the TPU device the same way.
python -m dwarf_bench_tpu RadixCuda --device=tpu --input_size 256 512 1024 2048 4096 8192 16384 32768 65536 --report_path="report_radix_small.csv" --iterations=9
