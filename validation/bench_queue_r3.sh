#!/bin/bash
# Sequential TPU bench queue, round 3 ("queue r3").
#
# Ordered for round-3 decision-making (VERDICT.md items 1/2/4):
#   1. device-vs-host chain A/B   -> decides the HYMET_HOST_CHAINS default flip
#   2. align_stages attribution   -> decides where the align optimization goes
#   3. sort-diet A/Bs             -> decide HYMET_MIN_BSEARCH / HYMET_FLAT_BAND
#   4. screen prefilter + F=1e8   -> decides the all-F prefilter default
# Same resumable protocol as bench_queue.sh: one TPU process at a time,
# tunnel probe before each stage, `timeout` bound, non-empty .json = done.
set -u
cd /root/repo
OUT=validation/results/bench_queue_r3
mkdir -p "$OUT"

probe() {
  python3 - <<'EOF' 2>/dev/null
import socket
s = socket.socket(); s.settimeout(2)
s.connect(("127.0.0.1", 8083))
EOF
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
  # an empty .json (failure) is retried on the next queue run
  [ -s "$OUT/$name.json" ] || rm -f "$OUT/$name.json"
  return $rc
}

# --- decision stages first --------------------------------------------
run_stage align_device 5400 BENCH_MODE=align HYMET_HOST_CHAINS=0
run_stage align_host 5400 BENCH_MODE=align HYMET_HOST_CHAINS=1
run_stage align_stages 9000 BENCH_MODE=align_stages
# --- sort-diet A/Bs (combine with device chains if those won) ---------
run_stage align_minb 5400 BENCH_MODE=align HYMET_MIN_BSEARCH=1
run_stage align_flat 5400 BENCH_MODE=align HYMET_FLAT_BAND=1
run_stage align_minb_flat 5400 BENCH_MODE=align HYMET_MIN_BSEARCH=1 HYMET_FLAT_BAND=1
# --- screen formulations ----------------------------------------------
run_stage sketch_pref 4800 BENCH_MODE=sketch HYMET_COUNT_PREFILTER=1
run_stage sketch_large 7200 BENCH_MODE=sketch_large
echo "=== queue r3 complete $(date -u +%F' '%T)" | tee -a "$OUT/queue.log"
