#!/bin/bash
# Hands-off TPU work queue for tunnel recovery (round 4). Run ONE at a
# time (a second TPU client contends on the tunnel); each step bounded.
# Usage: bash tools/tpu_queue.sh [logdir]   (default /tmp/tpu_r4)
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/tpu_r4}
mkdir -p "$LOG"

run() { # name timeout cmd...
  local name=$1 to=$2; shift 2
  if [ -e "$LOG/$name.ok" ]; then echo "skip $name (done)"; return 0; fi
  echo "=== $name ($(date +%H:%M:%S), timeout ${to}s)"
  timeout "$to" "$@" >"$LOG/$name.log" 2>&1
  local rc=$?
  echo "rc=$rc" >>"$LOG/$name.log"
  if [ $rc -eq 0 ]; then echo done >"$LOG/$name.ok"; else echo "FAIL $name rc=$rc"; fi
  return $rc
}

# 0. trivial probe: bail early if the pool is down (don't wedge it).
run probe 120 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((256,256)) @ jnp.ones((256,256))
assert float(np.asarray(x)[0,0]) == 256.0
print('ok', jax.default_backend())
" || exit 1

# 1. headline bench (gate config; populates the compile cache).
run bench 2400 python bench.py

# 2. three-level timing rows, fast config first (decides bench config).
run pre_fast 3600 python tools/prescreen_pre_exp.py fast

# 3. all five BASELINE configs.
run benchmarks 5400 python benchmarks.py --steps 2 --batch 64 --chunk 16

# 3b. BASELINE config 5 at its literal 256-image scale.
run benchmarks256 5400 python benchmarks.py --steps 2 --batch 256 --chunk 16 --only c5

# 4. three-level on the explore/quality config (VERDICT item 2 target).
run pre_quality 5400 python tools/prescreen_pre_exp.py quality

# 4b. hybrid two-phase timing (round-4 CPU quality: gradient 112.53 —
# beats the reference band; this measures the TPU wall-clock).
run hybrid 3600 python tools/hybrid_exp.py

# 5. batch + portfolio on-chip validation (VERDICT item 3).
run batch_portfolio 3600 python tools/batch_portfolio_tpu.py

# 6. dither-proxy timing (round 4: wavefront only for the top-K
# proxy-ranked candidates; the wavefront dominates dithered visits).
run dither_proxy 3600 python tools/dither_proxy_exp.py 0 8 --contents=gradient

echo "queue done ($(date +%H:%M:%S)); logs in $LOG"
