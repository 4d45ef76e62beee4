#!/bin/bash
# Round-4 session-4 TPU queue: only the measurements BENCHMARKS.md still
# marks pending, highest-value first (hybrid = VERDICT item 2 headline).
# bench.py runs first to warm the persistent compile cache on this
# migrated host so the driver's end-of-round BENCH_r04 capture is fast.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/tpu_s4}
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

run probe 420 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((256,256)) @ jnp.ones((256,256))
assert float(np.asarray(x)[0,0]) == 256.0
print('ok', jax.default_backend())
" || exit 1

# 1. headline bench: warms the compile cache + re-verifies on this host.
run bench 1800 python bench.py

# 2. hybrid two-phase timing (VERDICT item 2: >=100x at reference-band
# quality; CPU quality 112.53 already beats the band).
run hybrid 3600 python tools/hybrid_exp.py

# 3. batch + portfolio on-chip validation (VERDICT item 3).
run batch_portfolio 3600 python tools/batch_portfolio_tpu.py

# 4. dither-proxy timing (round-4 feature, untimed on chip).
run dither_proxy 3600 python tools/dither_proxy_exp.py 0 8 --contents=gradient

# 5. BASELINE config 5 at its literal 256-image scale.
run benchmarks256 5400 python benchmarks.py --steps 2 --batch 256 --chunk 16 --only c5

# 6. three-level on the explore/quality config.
run pre_quality 5400 python tools/prescreen_pre_exp.py quality

echo "queue done ($(date +%H:%M:%S)); logs in $LOG"
