#!/bin/bash
# Round-5e queue: REAL on-chip CAMI-replica suite run (the r5b attempt
# reused cached PAFs from the CPU run — 39.6 s wall, no device work).
# Clears the suite's out tree first so every cell maps on the TPU, then
# records the on-chip runtime/leaderboard tree separately from the CPU
# accuracy run. Waits for r5d.
set -u
cd /root/repo
OUT=validation/results/bench_queue_r5e
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
until grep -q "queue r5f complete" validation/results/bench_queue_r5f/queue.log 2>/dev/null; do
  past_end && { echo "r5e abandoned: r5f never completed" | tee -a "$OUT/queue.log"; exit 1; }
  sleep 60
done
if [ ! -s "$OUT/cami_suite_tpu.log" ]; then
  until probe; do
    past_end && { echo "abandoned: tunnel down" | tee -a "$OUT/queue.log"; exit 1; }
    sleep 60
  done
  echo "=== cami_suite_tpu start $(date -u +%F' '%T)" | tee -a "$OUT/queue.log"
  rm -rf validation/work_cami_suite/out
  timeout 7000 python3 validation/run_cami_suite.py --platform default \
    --results-name cami_suite_tpu >"$OUT/cami_suite_tpu.log" 2>&1
  rc=$?
  echo "=== cami_suite_tpu rc=$rc $(date -u +%F' '%T)" | tee -a "$OUT/queue.log"
fi
echo "=== queue r5e complete $(date -u +%F' '%T)" | tee -a "$OUT/queue.log"
