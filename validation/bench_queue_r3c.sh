#!/bin/bash
# Round-3b queue: measures the gather-lean search redesign (unique-hash
# row-gather tables). Run AFTER bench_queue_r3.sh completes. Same
# resumable protocol.
set -u
cd /root/repo
OUT=validation/results/bench_queue_r3c
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
    sleep 60
    waited=$((waited + 60))
    if [ "$waited" -ge 21600 ]; then
      echo "=== $name ABANDONED: tunnel down 6h $(date -u +%F' '%T)" \
        | tee -a "$OUT/queue.log"
      return 1
    fi
  done
  echo "=== $name start $(date -u +%F' '%T) env: $*" | tee -a "$OUT/queue.log"
  env "$@" BENCH_CPU_FALLBACK=0 BENCH_DIAL_RETRIES=2 \
    timeout "$tmo" python3 bench.py >"$OUT/$name.json" 2>"$OUT/$name.err"
  local rc=$?
  echo "=== $name rc=$rc $(date -u +%F' '%T): $(cat "$OUT/$name.json")" \
    | tee -a "$OUT/queue.log"
  [ -s "$OUT/$name.json" ] || rm -f "$OUT/$name.json"
  return $rc
}

# new-search align measurement + its attribution
# collect-optimized align (scatter slot compaction + packed qmeta)
run_stage align_v3 5400 BENCH_MODE=align HYMET_HOST_CHAINS=0
run_stage align_stages_v3 9000 BENCH_MODE=align_stages
# screen: prefilter now the all-F TPU default; sketch_large re-measured
# with the realistic bottom-sketch hash distribution (bench-data fix)
run_stage sketch_default 4800 BENCH_MODE=sketch
run_stage sketch_large_v3 7200 BENCH_MODE=sketch_large
echo "=== queue r3c complete $(date -u +%F' '%T)" | tee -a "$OUT/queue.log"
