#!/bin/bash
# Sequential TPU bench queue (round 2 post-outage re-measurement, "queue v9").
#
# Runs one bench.py configuration at a time (the dev tunnel wedges if two
# TPU processes overlap — CLAUDE.md), waits for the tunnel before each
# stage, bounds each stage with `timeout`, and records every JSON result
# under validation/results/bench_queue_r2/. A stage that already has a
# non-empty .json is skipped, so the queue is resumable: rerun the script
# after an outage and it picks up where it stopped.
set -u
cd /root/repo
OUT=validation/results/bench_queue_r2
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

# --- essentials first -------------------------------------------------
# headline e2e with current defaults (host chains; programs cache-hot)
run_stage e2e_host 5400
# device-chain align A/B (the projected ~2x lever) and its e2e
run_stage align_device 5400 BENCH_MODE=align HYMET_HOST_CHAINS=0
run_stage align_host 5400 BENCH_MODE=align HYMET_HOST_CHAINS=1
run_stage e2e_device 5400 HYMET_HOST_CHAINS=0
# screen count formulations at bench F (32K)
run_stage sketch_pref 4800 BENCH_MODE=sketch HYMET_COUNT_PREFILTER=1
run_stage sketch_eqmm 4800 BENCH_MODE=sketch
# per-stage attribution of the fused align program (several compiles)
run_stage align_stages 9000 BENCH_MODE=align_stages
# F = 1e8 screen at the 45 GB RefSeq sketch scale
run_stage sketch_large 7200 BENCH_MODE=sketch_large
# --- sort-diet A/Bs ---------------------------------------------------
run_stage align_minb 5400 BENCH_MODE=align HYMET_MIN_BSEARCH=1
run_stage align_flat 5400 BENCH_MODE=align HYMET_FLAT_BAND=1
run_stage align_minb_flat 5400 BENCH_MODE=align HYMET_MIN_BSEARCH=1 HYMET_FLAT_BAND=1
run_stage align_gridsort 5400 BENCH_MODE=align HYMET_SLOT_BSEARCH=0
run_stage sketch_pref_topk 4800 BENCH_MODE=sketch HYMET_COUNT_PREFILTER=1 HYMET_PREF_TOPK=1
echo "=== queue complete $(date -u +%F' '%T)" | tee -a "$OUT/queue.log"
