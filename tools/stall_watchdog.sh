#!/bin/bash
# Kill a TPU training step that is wedged on a dead tunnel instead of
# letting it burn its full run2 timeout (45 min x2 per step).
#
# Trigger: a scripts/train.py (or gen_class_centers.py) process exists,
# /tmp/r5_queue.log has not grown for STALE_S seconds, AND the last two
# tools/tpu_probe.sh verdicts are DOWN (the probe executes a real matmul,
# so DOWN means the compile/execute RPC path is gone — a healthy trainer
# logs every ~20 s, and cold compiles never coincide with DOWN probes).
# The kill makes the queue's run2 wrapper retry / fail fast, and its
# pause_gate then holds at the next step boundary until the probe says UP.
# Usage: nohup bash tools/stall_watchdog.sh & (session-scoped, like the probe).
set -u
STALE_S=${STALE_S:-480}
LOG=/tmp/r5_queue.log
while true; do
  sleep 120
  pid=$(ps -eo pid,cmd | grep -E "[s]cripts/(train|gen_class_centers)\.py" \
        | awk 'NR==1{print $1}')
  [ -n "${pid:-}" ] || continue
  age=$(( $(date +%s) - $(stat -c %Y "$LOG" 2>/dev/null || date +%s) ))
  [ "$age" -ge "$STALE_S" ] || continue
  if [ "$(tail -2 /tmp/tpu_status | grep -c '^DOWN')" -eq 2 ]; then
    echo "[watchdog $(date +%H:%M:%S)] log stale ${age}s + probe DOWN x2: kill $pid" >> "$LOG"
    kill "$pid" 2>/dev/null
    sleep 30
  fi
done
