#!/bin/bash
# Round-4a queue: rebuild the world + bank every e2e compile into the
# persistent XLA cache (fresh container: ~/.cache/hymet_tpu/xla is empty),
# then land the e2e headline at shipping defaults (device chains).
set -u
cd /root/repo
OUT=validation/results/bench_queue_r4a
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
# warm_pipeline builds the world + runs the full e2e once at shipping
# defaults — every completed compile banks into the persistent cache
# even if a later stage stalls.
run_stage warm1 7200 BENCH_MODE=warm_pipeline BENCH_WARM_WATCHDOG=0
run_stage e2e_default 7200
run_stage e2e_default_rep 5400
echo "=== queue r4a complete $(date -u +%F' '%T)" | tee -a "$OUT/queue.log"
