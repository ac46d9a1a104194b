#!/bin/bash
# Round-5g queue: re-measure the sharded single-chip overhead after the
# device-side valid-count fix (commit 00270b6), then one final headline
# for the record. Waits for r5e.
set -u
cd /root/repo
OUT=validation/results/bench_queue_r5g
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
until grep -q "queue r5e complete" validation/results/bench_queue_r5e/queue.log 2>/dev/null; do
  past_end && { echo "r5g abandoned: r5e never completed" | tee -a "$OUT/queue.log"; exit 1; }
  sleep 60
done
if [ ! -s "$OUT/sharded_overhead.log" ]; then
  until probe; do
    past_end && { echo "abandoned: tunnel down" | tee -a "$OUT/queue.log"; exit 1; }
    sleep 60
  done
  echo "=== sharded_overhead start $(date -u +%F' '%T)" | tee -a "$OUT/queue.log"
  timeout 3600 python3 validation/probe_sharded_overhead.py >"$OUT/sharded_overhead.log" 2>&1
  echo "=== sharded_overhead rc=$? $(date -u +%F' '%T)" | tee -a "$OUT/queue.log"
fi
if [ ! -s "$OUT/e2e_record.json" ] && ! past_end; then
  until probe; do
    past_end && { echo "abandoned: tunnel down" | tee -a "$OUT/queue.log"; exit 1; }
    sleep 60
  done
  left=$((HARD_END_TS - $(date +%s)))
  tmo=3600; [ "$tmo" -gt "$left" ] && tmo=$left
  if [ "$tmo" -ge 300 ]; then
    echo "=== e2e_record start $(date -u +%F' '%T) tmo=$tmo" | tee -a "$OUT/queue.log"
    env BENCH_CPU_FALLBACK=0 BENCH_DIAL_RETRIES=2 BENCH_DEADLINE_S=0 \
      timeout "$tmo" python3 bench.py >"$OUT/e2e_record.json" 2>"$OUT/e2e_record.err"
    echo "=== e2e_record rc=$? $(date -u +%F' '%T): $(cat "$OUT/e2e_record.json")" | tee -a "$OUT/queue.log"
    [ -s "$OUT/e2e_record.json" ] || rm -f "$OUT/e2e_record.json"
  fi
fi
echo "=== queue r5g complete $(date -u +%F' '%T)" | tee -a "$OUT/queue.log"
