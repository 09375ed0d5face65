#!/bin/bash
# Round-3 follow-on queue: wait for the ladder queue (tpu_queue_r3.sh),
# then take the TPU measurements the verdict asks for:
#   1. bench_pallas.py — Pallas v3 fused kernel vs XLA on the real chip
#      (decides the README "native tier" story, VERDICT item 7)
#   2. bench.py — headline JSON + perf-regression floors (item 5)
#   3. timed `timeout 300 python __graft_entry__.py 8` — the driver-visible
#      multichip dryrun criterion (item 1)
set -u
cd /root/repo
PREV_PID=${1:-0}
if [ "$PREV_PID" -gt 0 ]; then
  while kill -0 "$PREV_PID" 2>/dev/null; do sleep 60; done
fi
echo "=== R3B: bench_pallas (TPU) ==="
timeout 1200 python tools/bench_pallas.py 2>&1 | tee /tmp/bench_pallas_r3.log
echo "=== R3B: bench.py (TPU) ==="
timeout 1800 python bench.py 2>&1 | tee /tmp/bench_r3.log
echo "=== R3B: multichip dryrun (CPU, timed) ==="
START=$(date +%s)
timeout 300 python __graft_entry__.py 8 2>&1 | tee /tmp/dryrun_r3.log
RC=$?
echo "dryrun rc=$RC wall=$(( $(date +%s) - START ))s"
echo R3B_DONE
