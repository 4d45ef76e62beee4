#!/bin/bash
# Wait for the TPU tunnel to recover, then run the round-4 work queue.
# Probes are process-isolated and bounded (a hung transfer cannot wedge
# this loop); the queue itself is tools/tpu_queue.sh (resumable).
# Usage: bash tools/tpu_wait_and_run.sh [logdir] [max_wait_s] [queue_sh]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/tpu_r4}
MAX_WAIT=${2:-39600}   # 11 h
QUEUE=${3:-tools/tpu_queue.sh}
mkdir -p "$LOG"
START=$(date +%s)

while :; do
  now=$(date +%s)
  if [ $((now - START)) -ge "$MAX_WAIT" ]; then
    echo "$(date +%H:%M:%S) giving up after ${MAX_WAIT}s" | tee -a "$LOG/wait.log"
    exit 1
  fi
  timeout 300 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((256,256)) @ jnp.ones((256,256))
assert float(np.asarray(x)[0,0]) == 256.0
print('ok', jax.default_backend())
" >>"$LOG/wait.log" 2>&1
  rc=$?
  if [ $rc -eq 0 ]; then
    echo "$(date +%H:%M:%S) tunnel up; starting queue" | tee -a "$LOG/wait.log"
    break
  fi
  echo "$(date +%H:%M:%S) probe rc=$rc; retry in 240s" >>"$LOG/wait.log"
  sleep 240
done

# This successful probe IS the queue's probe (a second back-to-back
# probe process has been observed to time out on the flappy tunnel).
touch "$LOG/probe.ok"
bash "$QUEUE" "$LOG"
rc=$?
if [ $rc -ne 0 ]; then
  # Queue died mid-way (tunnel flap): go back to waiting and resume,
  # a bounded number of times (a genuinely-broken step must not spin).
  RESTARTS=${TPU_QUEUE_RESTARTS:-0}
  if [ "$RESTARTS" -ge 6 ]; then
    echo "$(date +%H:%M:%S) queue rc=$rc after $RESTARTS restarts; stop" \
      | tee -a "$LOG/wait.log"
    exit "$rc"
  fi
  echo "$(date +%H:%M:%S) queue rc=$rc; re-entering wait loop" >>"$LOG/wait.log"
  rm -f "$LOG/probe.ok"
  export TPU_QUEUE_RESTARTS=$((RESTARTS + 1))
  exec bash "$0" "$LOG" "$MAX_WAIT" "$QUEUE"
fi
echo "$(date +%H:%M:%S) queue complete" | tee -a "$LOG/wait.log"
