#!/bin/bash
# Round-5a queue: re-bank the align programs after the chain-score change
# (the reduce program gained one segmented cumsum; collects unchanged),
# re-measure the e2e headline at shipping defaults, bound the sharded
# path's single-chip overhead, and fill the sketch-probe VPU cell.
# Stages skip when already recorded, so the queue can re-run on every
# healthy window (CLAUDE.md service-health guidance).
set -u
cd /root/repo
OUT=validation/results/bench_queue_r5a
mkdir -p "$OUT"
HARD_END_TS=${HARD_END_TS:-$(date -d '+6 hours' +%s)}
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
# 1) e2e at shipping defaults (score-change programs compile here; the
#    warm child + health probe bank them)
run_stage e2e_score 5400
# 2) repeat for stability / provenance
run_stage e2e_score_rep 3600
# 2b) occurrence-budget A/B (flag-gated seeding, VERDICT r5 #2): budget =
#     2x the minimizer cap caps anchors at ~2M/batch vs the 1.5-4M the
#     acap runs today; accuracy gate inside bench.py validates the run.
run_stage e2e_occ 5400 HYMET_OCC_BUDGET=2.0
# 3) sharded single-chip overhead bound (VERDICT r5 #6)
run_script sharded_overhead 5400 python3 validation/probe_sharded_overhead.py
# 4) sketch probe: row-tiled 256-row case + VPU op-rate cells (VERDICT r5 #7)
run_script sketch_probe 3600 python3 validation/probe_sketch_hash.py
echo "=== queue r5a complete $(date -u +%F' '%T)" | tee -a "$OUT/queue.log"
