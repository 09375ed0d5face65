#!/bin/bash
# Background TPU-tunnel liveness probe. Appends "UP <epoch>" / "DOWN <epoch>"
# to /tmp/tpu_status every 5 min (2 min while down, so recovery is seen
# quickly); tools/r5_queue*.sh's pause_gate holds the queue BETWEEN steps
# while the last line says DOWN (the 2026-08-20 tunnel outages burned one
# full step timeout per attempt without this).
# The probe must EXECUTE a computation, not just enumerate devices: the
# 10:06 outage kept `jax.devices()` answering while every compile/execute
# RPC hung forever, so a devices()-only probe reported UP and the queue
# launched steps that stalled at their first device op. The scalar float()
# readback forces a round-trip (jax.block_until_ready can return early on
# the tunneled TPU — see CLAUDE.md).
# Deliberately cheap (one python+jax import per probe; the 8x8 matmul is
# microseconds of TPU time): the host has a single CPU core shared with TPU
# training's host side.
# Usage: nohup bash tools/tpu_probe.sh & (lost on host migration — restart).
set -u
while true; do
  if timeout 150 python -c "
import jax, jax.numpy as jnp
assert jax.devices()
x = jnp.ones((8, 8))
assert float((x @ x).sum()) == 512.0" >/dev/null 2>&1; then
    echo "UP $(date +%s)" >> /tmp/tpu_status
    slp=300
  else
    echo "DOWN $(date +%s)" >> /tmp/tpu_status
    slp=120
  fi
  tail -50 /tmp/tpu_status > /tmp/tpu_status.tmp 2>/dev/null \
    && mv /tmp/tpu_status.tmp /tmp/tpu_status
  sleep $slp
done
