#!/bin/bash
# Round-4b queue: (1) e2e at shipping defaults WITH upload-once contig
# staging (new screen pad-bucket programs compile + bank), (2) the
# slot-fill anchor-collect A/B, (3) the r3g probe set the round-3 window
# never ran (VPU op-rate probe, sized-cap screen re-measures).
# BENCH_DEADLINE_S=0: the queue manages its own timeouts; the in-bench
# watchdog is for driver runs.
set -u
cd /root/repo
OUT=validation/results/bench_queue_r4b
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
  local waited=0
  until probe; do
    sleep 60; waited=$((waited + 60))
    if [ "$waited" -ge 21600 ]; then
      echo "=== $name ABANDONED: tunnel down 6h $(date -u +%F' '%T)" | tee -a "$OUT/queue.log"
      return 1
    fi
  done
  echo "=== $name start $(date -u +%F' '%T)" | tee -a "$OUT/queue.log"
  BENCH_DEADLINE_S=0 timeout "$tmo" python3 -u "$script" >"$OUT/$name.log" 2>&1
  local rc=$?
  echo "=== $name rc=$rc $(date -u +%F' '%T)" | tee -a "$OUT/queue.log"
  [ $rc -eq 0 ] && touch "$OUT/$name.done"
  return $rc
}
# e2e with upload-once staging (the headline candidate for BENCH_r04)
run_stage e2e_staged 10800
run_stage e2e_staged_rep 5400
# anchor-collect A/B: value-fill vs row-gather
run_stage align_base 7200 BENCH_MODE=align
run_stage align_fill 7200 BENCH_MODE=align HYMET_SLOT_FILL=1
run_stage align_stages_base 7200 BENCH_MODE=align_stages
run_stage align_stages_fill 7200 BENCH_MODE=align_stages HYMET_SLOT_FILL=1
# the r3g probe set (VPU op-rate, sized-cap screen re-measures)
run_probe sketch_probe 3600 validation/probe_sketch_hash.py
run_stage sketch_stages_sized 7200 BENCH_MODE=sketch_stages
run_stage sketch_large_sized 7200 BENCH_MODE=sketch_large
run_stage sketch_sized 7200 BENCH_MODE=sketch
echo "=== queue r4b complete $(date -u +%F' '%T)" | tee -a "$OUT/queue.log"
