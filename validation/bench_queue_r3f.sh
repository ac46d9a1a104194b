#!/bin/bash
# Final round-3 e2e measurements at shipping defaults (device chains,
# prefilter screen, gather-lean search, scatter compaction, tight caps).
set -u
cd /root/repo
OUT=validation/results/bench_queue_r3f
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
# headline at shipping defaults (device chains now default)
# screen with the interleaved+bucketed survivor search
# e2e at shipping defaults WITH the conditional-donation fix (the
# donated-update -> new-compile deadlock mitigation)
run_stage e2e_final 7200
run_stage e2e_final_rep 7200
run_stage sketch_stages 7200 BENCH_MODE=sketch_stages
echo "=== queue r3f complete $(date -u +%F' '%T)" | tee -a "$OUT/queue.log"
