#!/bin/bash
# Round-5c queue: re-run the sharded-overhead probe with engines hoisted
# out of the timed region (the r5a cut charged one-time DB staging to
# every sharded call -> bogus +420% screen overhead). Waits for r5b.
set -u
cd /root/repo
OUT=validation/results/bench_queue_r5c
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
until grep -q "queue r5b complete" validation/results/bench_queue_r5b/queue.log 2>/dev/null; do
  past_end && { echo "r5c abandoned: r5b never completed" | tee -a "$OUT/queue.log"; exit 1; }
  sleep 60
done
if [ ! -s "$OUT/sharded_overhead.log" ]; then
  until probe; do
    past_end && { echo "abandoned: tunnel down" | tee -a "$OUT/queue.log"; exit 1; }
    sleep 60
  done
  echo "=== sharded_overhead start $(date -u +%F' '%T)" | tee -a "$OUT/queue.log"
  timeout 5400 python3 validation/probe_sharded_overhead.py >"$OUT/sharded_overhead.log" 2>&1
  echo "=== sharded_overhead rc=$? $(date -u +%F' '%T)" | tee -a "$OUT/queue.log"
fi
echo "=== queue r5c complete $(date -u +%F' '%T)" | tee -a "$OUT/queue.log"
