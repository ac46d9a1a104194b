#!/bin/bash
# Round-4d queue (chained after r4c): align-mode THROUGHPUT A/B for the
# slot-fill collect, at the headline batch shape. Same hard-end guard.
set -u
cd /root/repo
OUT=validation/results/bench_queue_r4d
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
run_stage align_base 5400 BENCH_MODE=align HYMET_SLOT_FILL=0
run_stage align_fill 5400 BENCH_MODE=align HYMET_SLOT_FILL=1
echo "=== queue r4d complete $(date -u +%F' '%T)" | tee -a "$OUT/queue.log"
