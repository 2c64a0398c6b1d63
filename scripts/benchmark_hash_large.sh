#!/usr/bin/env bash
# BASELINE config #4 sweep: hash build + probe at 2^24 build keys
# (cuckoo + slab variants), reference methodology (9 iterations,
# append-mode reference-schema CSV, one CLI invocation per size via
# run_sweeps_tpu.sh so restarts skip recorded sizes).
#
# Smaller sizes ride along for the scaling context; the 2^24 point is
# the config-#4 evidence (round-3 verdict item 5). The 50%-hit-rate
# probe variant (also config #4) is scripts/benchmark_hash_hit50.py —
# the registered dwarfs mirror the reference's probe-all-inserted-keys
# semantics (hash/cuckoo_hash_build.cpp:101-119, probe/slab_probe.cpp:
# 78-95), so the 50% config gets its own harness.
set -u
cd "$(dirname "$0")/.."
SIZES="${SIZES:-1048576 4194304 16777216}"
ITER="${ITER:-9}"
for D in CuckooHashBuild SlabHashBuild SlabProbe; do
  scripts/run_sweeps_tpu.sh "$D" "results/sweeps/report_${D,,}.csv" \
    "$ITER" $SIZES
done
