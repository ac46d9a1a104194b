#!/bin/bash
# Round-5i queue: pow2 partial-group row counts A/B (HYMET_ROW_POW2=1
# banks the small-rows collect shapes for trailing groups). Outcome:
# 72.33 contigs/s = 13.02x, gate 100%; default flipped ON afterwards.

set -u
cd /root/repo
OUT=validation/results/bench_queue_r5i
mkdir -p "$OUT"
HARD_END_TS=${HARD_END_TS:-$(date -d '+2 hours 30 minutes' +%s)}
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
  past_end && { echo "=== $name SKIPPED: past hard end" | tee -a "$OUT/queue.log"; return 1; }
  local left=$((HARD_END_TS - $(date +%s)))
  local t=$tmo; [ "$t" -gt "$left" ] && t=$left
  [ "$t" -lt 300 ] && { echo "=== $name SKIPPED: <300s left" | tee -a "$OUT/queue.log"; return 1; }
  until probe; do
    sleep 60
    past_end && { echo "=== $name ABANDONED: tunnel down" | tee -a "$OUT/queue.log"; return 1; }
  done
  echo "=== $name start $(date -u +%F' '%T) tmo=$t env: $*" | tee -a "$OUT/queue.log"
  env "$@" BENCH_CPU_FALLBACK=0 BENCH_DIAL_RETRIES=2 BENCH_DEADLINE_S=0 \
    timeout "$t" python3 bench.py >"$OUT/$name.json" 2>"$OUT/$name.err"
  local rc=$?
  echo "=== $name rc=$rc $(date -u +%F' '%T): $(cat "$OUT/$name.json")" | tee -a "$OUT/queue.log"
  [ -s "$OUT/$name.json" ] || rm -f "$OUT/$name.json"
  return $rc
}
run_stage e2e_rowp 5400 HYMET_ROW_POW2=1
run_stage e2e_rowp_rep 3600 HYMET_ROW_POW2=1
echo "=== queue r5h complete $(date -u +%F' '%T)" | tee -a "$OUT/queue.log"
