#!/bin/bash
# Round-5f queue: tight-upload e2e with the chunk-row-gather repack
# (the r5d scan repack cost ~1.2 s/run in the align leg) + per-row
# mask mixing: 26.3 MB staged for the bench sample. Waits for r5d.
#
set -u
cd /root/repo
OUT=validation/results/bench_queue_r5f
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
  until probe; do
    sleep 60
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
until grep -q "queue r5d complete" validation/results/bench_queue_r5d/queue.log 2>/dev/null; do
  past_end && { echo "r5f abandoned: r5d never completed" | tee -a "$OUT/queue.log"; exit 1; }
  sleep 60
done
# 1) tight-upload headline (repack programs compile here)
run_stage e2e_gather 5400
# 2) stability rep
run_stage e2e_gather_rep 3600
echo "=== queue r5d complete $(date -u +%F' '%T)" | tee -a "$OUT/queue.log"
