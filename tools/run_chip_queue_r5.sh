#!/bin/bash
# Round-5 chip-bound measurement queue (run after the LFW protocol run
# frees the chip). Each item logs under $OUT; generous timeouts — first
# compiles through the axon remote compiler are slow.
#
# Usage: bash tools/run_chip_queue_r5.sh [outdir]
set -u
OUT=${1:-/tmp/chipq5}
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

# 1. Cascade P-Net assembly A/B (VERDICT r4 next #7): does the v5
#    shifted-dots kernel win at batch 64? 'pyramid-skip' isolates the
#    assembly cost (timing probe, wrong numerics).
run cascade_ab64 3600 python tools/time_cascade_ab.py 64 \
    flax,pyramid,pyramid-dots,pyramid-skip
run cascade_ab16 3600 python tools/time_cascade_ab.py 16 \
    pyramid,pyramid-dots,pyramid-skip

# 2. Frozen-BN step time (VERDICT r4 next #5): how much of the +17.6 ms
#    train-BN floor the late-phase schedule claws back.
run profile_train 3600 python tools/profile_train.py \
    fwd_eval fwd_train full full_frozen_bn

# 3. bench.py under the new progressive protocol (fresh headline number
#    + proves the round-4 timeout fix on the real chip).
run bench 1800 python bench.py

echo "=== queue done ($(date -u +%FT%TZ)) ==="
