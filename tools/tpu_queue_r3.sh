#!/bin/bash
# Round-3 TPU work queue: wait for the running probe, then the two ladders.
set -u
cd /root/repo
PROBE_BASH_PID=${1:-0}
if [ "$PROBE_BASH_PID" -gt 0 ]; then
  while kill -0 "$PROBE_BASH_PID" 2>/dev/null; do sleep 30; done
fi
echo "=== QUEUE: mpscl ladder3 ==="
bash tools/mpscl_protocol.sh # (formerly ladder3/4 — collapsed r4)
echo "=== QUEUE: rain eps-clip ladder ==="
bash tools/rain_eps_ladder.sh
echo QUEUE_DONE
