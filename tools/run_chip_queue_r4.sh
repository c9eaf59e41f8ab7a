#!/bin/bash
# Round-4 chip-bound measurement queue (run unattended after the detector
# retrain frees the chip). Each item logs under $OUT; generous timeouts —
# first compiles through the axon remote compiler are slow.
#
# Usage: bash tools/run_chip_queue_r4.sh [outdir]
set -u
OUT=${1:-/tmp/chipq4}
mkdir -p "$OUT"
cd /root/repo

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date -u +%FT%TZ)) ==="
  if [ -f "$OUT/$name.ok" ]; then echo "skip (done)"; return; fi
  timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  if [ $rc -eq 0 ]; then touch "$OUT/$name.ok"; fi
  echo "rc=$rc  tail:"; tail -6 "$OUT/$name.log"
}

# 1. Alignment ladder incl. the fused Pallas dense warp (decides the
#    align_by_landmarks TPU kernel default).
run try_align 3600 python tools/try_align.py 64

# 2. Cascade re-measure after the stacked-crop fix: throughput batch and
#    the latency batch.
run cascade64 2400 python tools/profile_cascade.py 64
run cascade16 2400 python tools/profile_cascade.py 16

# 3. e2e detection + aligned-embedding chains (crop vs warp).
run detect_e2e 3600 python tools/bench_detect_e2e.py

# 4. Detector gate levels for the retrained bundles (re-pin test floors).
run gates 2400 python tools/measure_detector_gates.py

echo "=== queue done ($(date -u +%FT%TZ)) ==="
