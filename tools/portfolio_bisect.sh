#!/bin/bash
# Run the portfolio-crash bisect probes in order, tolerating TPU-worker
# crashes: after each failed probe, wait for the tunnel to recover
# before the next one. Results land in $LOG/bisect_results.txt.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/tpu_bisect}
mkdir -p "$LOG"
RES="$LOG/bisect_results.txt"

wait_tunnel() {
  local tries=0
  while :; do
    timeout 300 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((256,256)) @ jnp.ones((256,256))
assert float(np.asarray(x)[0,0]) == 256.0
print('ok', jax.default_backend())
" >>"$LOG/wait.log" 2>&1 && return 0
    tries=$((tries + 1))
    if [ $tries -ge 12 ]; then
      echo "$(date +%H:%M:%S) tunnel did not recover" | tee -a "$RES"
      exit 1
    fi
    echo "$(date +%H:%M:%S) tunnel down; retry in 180s" >>"$LOG/wait.log"
    sleep 180
  done
}

PROBES=${PROBES:-kern_g8 kern_g7 kern_g4 k8s1 k8ref k4s1}
FAILED_FAMILY=""
for probe in $PROBES; do
  if grep -q "^$probe " "$RES" 2>/dev/null; then continue; fi
  fam=$(printf '%s' "$probe" | sed 's/[0-9]*$//')  # strip trailing digits only
  if [ -n "$FAILED_FAMILY" ] && [ "$fam" = "$FAILED_FAMILY" ]; then
    echo "$probe skipped (family $fam already crashed)" | tee -a "$RES"
    continue
  fi
  wait_tunnel
  echo "=== $probe ($(date +%H:%M:%S))" | tee -a "$RES"
  timeout 1200 python tools/portfolio_bisect.py "$probe" \
    >"$LOG/$probe.log" 2>&1
  rc=$?
  line=$(grep "PROBE" "$LOG/$probe.log" | tail -1)
  echo "$probe rc=$rc $line" | tee -a "$RES"
  if [ $rc -ne 0 ]; then FAILED_FAMILY=$fam; fi
done
echo "bisect done ($(date +%H:%M:%S))" | tee -a "$RES"
