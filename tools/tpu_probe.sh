#!/bin/bash
# Background TPU-tunnel liveness probe. Appends "UP <epoch>" / "DOWN <epoch>"
# to /tmp/tpu_status every 5 min; tools/r5_queue.sh's pause_gate holds the
# queue BETWEEN steps while the last line says DOWN (the 2026-08-20 tunnel
# outage burned one full step timeout per attempt without this).
# Deliberately cheap (one python+jax import per probe, 5-min period): the
# host has a single CPU core shared with TPU training's host side.
# Usage: nohup bash tools/tpu_probe.sh & (lost on host migration — restart).
set -u
while true; do
  if timeout 150 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "UP $(date +%s)" >> /tmp/tpu_status
  else
    echo "DOWN $(date +%s)" >> /tmp/tpu_status
  fi
  tail -50 /tmp/tpu_status > /tmp/tpu_status.tmp 2>/dev/null \
    && mv /tmp/tpu_status.tmp /tmp/tpu_status
  sleep 300
done
