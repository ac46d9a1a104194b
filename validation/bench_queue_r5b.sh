#!/bin/bash
# Round-5b queue: final driver-conditions headline with the round-5
# bench.py (8 timed draws + link_excluded_contigs_per_s field), after
# the occ-budget default decision; then the CAMI-replica suite's TPU
# leg for on-chip runtime_memory provenance. Stages skip when already
# recorded so the queue re-runs safely on every healthy window.
set -u
cd /root/repo
OUT=validation/results/bench_queue_r5b
mkdir -p "$OUT"
HARD_END_TS=${HARD_END_TS:-$(date -d '+4 hours' +%s)}
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
run_script() {
  local name=$1 tmo=$2; shift 2
  if [ -s "$OUT/$name.log" ]; then
    echo "skip $name (already recorded)" | tee -a "$OUT/queue.log"
    return 0
  fi
  past_end && { echo "=== $name SKIPPED: past hard end" | tee -a "$OUT/queue.log"; return 1; }
  until probe; do
    sleep 60
    past_end && { echo "=== $name ABANDONED: tunnel down" | tee -a "$OUT/queue.log"; return 1; }
  done
  echo "=== $name start $(date -u +%F' '%T) tmo=$tmo: $*" | tee -a "$OUT/queue.log"
  timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  echo "=== $name rc=$rc $(date -u +%F' '%T)" | tee -a "$OUT/queue.log"
  [ "$rc" -eq 0 ] || [ -s "$OUT/$name.log" ] || rm -f "$OUT/$name.log"
  return $rc
}
# wait for r5a to finish (single TPU process at a time)
until grep -q "queue r5a complete" validation/results/bench_queue_r5a/queue.log 2>/dev/null; do
  past_end && { echo "r5b abandoned: r5a never completed" | tee -a "$OUT/queue.log"; exit 1; }
  sleep 60
done
# 1) final headline at shipping defaults, new bench.py
run_stage e2e_final 5400
# 2) stability rep
run_stage e2e_final_rep 3600
# 3) CAMI-replica suite on the real chip (runtime_memory provenance)
run_script cami_suite_tpu 5400 python3 validation/run_cami_suite.py --platform default
echo "=== queue r5b complete $(date -u +%F' '%T)" | tee -a "$OUT/queue.log"
