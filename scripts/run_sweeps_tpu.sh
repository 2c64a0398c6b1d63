#!/usr/bin/env bash
# Driver for the reference sweeps on the tunneled TPU: one CLI invocation
# per (dwarf, size) so every completed size appends its rows to the CSV
# immediately (the report is written at process exit — a single multi-size
# run that dies loses everything through the tunnel). The persistent
# compile cache (.jax_cache) makes restarts cheap: already-compiled sizes
# re-run at execution speed.
#
# Usage: scripts/run_sweeps_tpu.sh <dwarf> <csv> <iterations> <size...>
set -u
DWARF="$1"; CSV="$2"; ITER="$3"; shift 3
# the skip check must match the DEVICE too: report CSVs may mix CPU and
# TPU halves of a grid (e.g. report.csv), and a device-blind grep would
# skip every size that has a CPU row, so the TPU half could never fill in
DEVICE="${SWEEP_DEVICE:-TPU}"
for SZ in "$@"; do
  # skip sizes already recorded (restart-friendly); the CSV's second
  # column is buf_size_BYTES = elements * sizeof(int)
  BYTES=$((SZ * 4))
  if [ -f "$CSV" ] && grep -q "^${DEVICE},${BYTES}," "$CSV"; then
    echo "skip ${DWARF} ${SZ} (already in ${CSV})"; continue
  fi
  LOG="${CSV%.csv}.log"
  echo "=== ${DWARF} size ${SZ} ===" | tee -a "$LOG"
  # generous last-resort timeout: killing a client MID-COMPILE wedges
  # the remote device claim for ~25-30 min (every later size then blocks
  # and gets killed in turn) — compile waits of 20+ min are normal when
  # the compile server is loaded, so only a truly hung size may die
  timeout "${SWEEP_TIMEOUT:-3600}" python -m dwarf_bench_tpu "$DWARF" --device="${DEVICE,,}" \
    --input_size "$SZ" --report_path="$CSV" --iterations="$ITER" \
    2> >(grep -v "xla_bridge" | tee -a "$LOG" >&2) \
    || echo "FAILED ${DWARF} ${SZ} (rc $?)" | tee -a "$LOG"
done
