#!/bin/bash
# Round-4c queue: (1) e2e at SHIPPING DEFAULTS (device chains + staged
# contigs) with a warm budget big enough to finish banking the last
# pad-bucket compiles on the degraded tunnel (r4b banked ~16/18 groups;
# the split halved program size, commit 313c2c1), (2) the slot-fill
# anchor-collect A/B, (3) the r3g probe set.
# HARD_END_TS: no stage STARTS after this wall-clock epoch, so the chip
# is free for the driver's end-of-round BENCH_r04 run.
set -u
cd /root/repo
OUT=validation/results/bench_queue_r4c
mkdir -p "$OUT"
HARD_END_TS=${HARD_END_TS:-$(date -d '2026-08-20 13:10 UTC' +%s)}
probe() {
  python3 - <<'PYEOF' 2>/dev/null
import socket
s = socket.socket(); s.settimeout(2)
s.connect(("127.0.0.1", 8083))
PYEOF
}
past_end() { [ "$(date +%s)" -ge "$HARD_END_TS" ]; }
run_stage() {
  local name=$1 tmo=$2; shift 2
  if [ -s "$OUT/$name.json" ]; then
    echo "skip $name (already recorded)" | tee -a "$OUT/queue.log"
    return 0
  fi
  if past_end; then
    echo "=== $name SKIPPED: past hard end $(date -u +%F' '%T)" | tee -a "$OUT/queue.log"
    return 1
  fi
  # cap the stage timeout to the hard end
  local left=$((HARD_END_TS - $(date +%s)))
  [ "$tmo" -gt "$left" ] && tmo=$left
  [ "$tmo" -lt 300 ] && { echo "=== $name SKIPPED: <300s left" | tee -a "$OUT/queue.log"; return 1; }
  local waited=0
  until probe; do
    sleep 60; waited=$((waited + 60))
    past_end && { echo "=== $name ABANDONED: tunnel down at hard end" | tee -a "$OUT/queue.log"; return 1; }
  done
  echo "=== $name start $(date -u +%F' '%T) tmo=$tmo env: $*" | tee -a "$OUT/queue.log"
  env "$@" BENCH_CPU_FALLBACK=0 BENCH_DIAL_RETRIES=2 BENCH_DEADLINE_S=0 \
    timeout "$tmo" python3 bench.py >"$OUT/$name.json" 2>"$OUT/$name.err"
  local rc=$?
  echo "=== $name rc=$rc $(date -u +%F' '%T): $(cat "$OUT/$name.json")" | tee -a "$OUT/queue.log"
  [ -s "$OUT/$name.json" ] || rm -f "$OUT/$name.json"
  return $rc
}
run_probe() {
  local name=$1 tmo=$2 script=$3
  if [ -s "$OUT/$name.done" ]; then
    echo "skip $name (already recorded)" | tee -a "$OUT/queue.log"
    return 0
  fi
  past_end && { echo "=== $name SKIPPED: past hard end" | tee -a "$OUT/queue.log"; return 1; }
  local left=$((HARD_END_TS - $(date +%s)))
  [ "$tmo" -gt "$left" ] && tmo=$left
  [ "$tmo" -lt 300 ] && { echo "=== $name SKIPPED: <300s left" | tee -a "$OUT/queue.log"; return 1; }
  local waited=0
  until probe; do
    sleep 60; waited=$((waited + 60))
    past_end && { echo "=== $name ABANDONED: tunnel down at hard end" | tee -a "$OUT/queue.log"; return 1; }
  done
  echo "=== $name start $(date -u +%F' '%T) tmo=$tmo" | tee -a "$OUT/queue.log"
  BENCH_DEADLINE_S=0 timeout "$tmo" python3 -u "$script" >"$OUT/$name.log" 2>&1
  local rc=$?
  echo "=== $name rc=$rc $(date -u +%F' '%T)" | tee -a "$OUT/queue.log"
  [ $rc -eq 0 ] && touch "$OUT/$name.done"
  return $rc
}
# 1) shipping-defaults e2e (device chains + staging); warm child gets
#    the bulk of the stage budget to finish banking
run_stage e2e_device 10800 BENCH_WARM_TIMEOUT_S=7800
run_stage e2e_device_rep 5400 BENCH_WARM_TIMEOUT_S=3000
# 2) anchor-collect A/B: value-fill vs row-gather (attribution modes)
run_stage align_stages_base 5400 BENCH_MODE=align_stages
run_stage align_stages_fill 5400 BENCH_MODE=align_stages HYMET_SLOT_FILL=1
# 3) the r3g probe set (VPU op-rate, sized-cap screen re-measures)
run_probe sketch_probe 3600 validation/probe_sketch_hash.py
run_stage sketch_stages_sized 5400 BENCH_MODE=sketch_stages
run_stage sketch_sized 5400 BENCH_MODE=sketch
echo "=== queue r4c complete $(date -u +%F' '%T)" | tee -a "$OUT/queue.log"
