#!/bin/bash
# Round-3g queue: after the e2e align-shape compile grind (probe_align_
# compile) lands the device-chain programs in the persistent cache —
# (1) sketch stage/VPU probe, (2) screen benches with threshold-sized
# prefilter caps, (3) the e2e headline at shipping defaults (device
# chains, warmup watchdog active).
set -u
cd /root/repo
OUT=validation/results/bench_queue_r3g
mkdir -p "$OUT"
probe() {
  python3 - <<'PYEOF' 2>/dev/null
import socket
s = socket.socket(); s.settimeout(2)
s.connect(("127.0.0.1", 8083))
PYEOF
}
run_stage() {
  local name=$1 tmo=$2; shift 2
  if [ -s "$OUT/$name.json" ]; then
    echo "skip $name (already recorded)" | tee -a "$OUT/queue.log"
    return 0
  fi
  local waited=0
  until probe; do
    sleep 60; waited=$((waited + 60))
    if [ "$waited" -ge 21600 ]; then
      echo "=== $name ABANDONED: tunnel down 6h $(date -u +%F' '%T)" | tee -a "$OUT/queue.log"
      return 1
    fi
  done
  echo "=== $name start $(date -u +%F' '%T) env: $*" | tee -a "$OUT/queue.log"
  env "$@" BENCH_CPU_FALLBACK=0 BENCH_DIAL_RETRIES=2 \
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
  local waited=0
  until probe; do
    sleep 60; waited=$((waited + 60))
    if [ "$waited" -ge 21600 ]; then
      echo "=== $name ABANDONED: tunnel down 6h $(date -u +%F' '%T)" | tee -a "$OUT/queue.log"
      return 1
    fi
  done
  echo "=== $name start $(date -u +%F' '%T)" | tee -a "$OUT/queue.log"
  timeout "$tmo" python3 -u "$script" >"$OUT/$name.log" 2>&1
  local rc=$?
  echo "=== $name rc=$rc $(date -u +%F' '%T)" | tee -a "$OUT/queue.log"
  [ $rc -eq 0 ] && touch "$OUT/$name.done"
  return $rc
}
run_probe sketch_probe 3600 validation/probe_sketch_hash.py
run_stage sketch_stages_sized 7200 BENCH_MODE=sketch_stages
run_stage sketch_large_sized 7200 BENCH_MODE=sketch_large
run_stage sketch_sized 7200 BENCH_MODE=sketch
run_stage e2e_sized 10800
run_stage e2e_sized_rep 7200
run_stage align_rowmerge 7200 BENCH_MODE=align
run_stage align_stages_rowmerge 7200 BENCH_MODE=align_stages
echo "=== queue r3g complete $(date -u +%F' '%T)" | tee -a "$OUT/queue.log"
