#!/bin/bash
# Run the round-3 chip-bound measurement queue unattended, in priority order
# (memory: round3-open-threads). Each item gets its own log under
# $OUT and a generous timeout — first compiles through the axon remote
# compiler are slow (20-80 s/shape; Pallas kernels can take minutes).
#
# Usage: bash tools/run_chip_queue.sh [outdir]
set -u
OUT=${1:-/tmp/chipq}
mkdir -p "$OUT"
cd /root/repo

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date -u +%FT%TZ)) ==="
  if [ -f "$OUT/$name.ok" ]; then echo "skip (done)"; return; fi
  timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  if [ $rc -eq 0 ]; then touch "$OUT/$name.ok"; fi
  echo "rc=$rc  tail:"; tail -4 "$OUT/$name.log"
}

# 1. Cascade P-Net backend A/B: flax vs flat (decides the TPU default).
run cascade_ab 2400 python tools/time_cascade_ab.py

# 2a. Kernel-level stem timing (Pallas vs XLA prefix).
run stem_flat 2400 python tools/try_stem_flat.py

# 2b. Serving-level 4-way (bf16/int8 x xla/pallas) — decides FastEmbedder
#     default + bench.py headline path.
run stem_serving 3600 python tools/time_stem_serving.py

# 3. Cascade stage decomposition (R/O stages, crop24 f32 vs bf16).
run profile_cascade 2400 python tools/profile_cascade.py

# 4. e2e detection re-measure (scaled decode + flat P-Net + bf16 crops +
#    fixed-point letterbox resize).
run detect_e2e 2400 python tools/bench_detect_e2e.py

# 5. Headline re-runs.
run bench 1800 python bench.py
run bench_train 2400 python bench_train.py

echo "=== queue done ($(date -u +%FT%TZ)) ==="
