#!/bin/bash
# Round-5 TPU queue: the chip measurements VERDICT r4 asks for, highest
# value first. Item 1 (the only substantive gap): chip-confirm a config
# that satisfies the BASELINE conjunction — reference-band quality
# (final error <= 115.8 on the bench image) AND >= 100x (<= 1.8 s).
# The hybrid profile (CPU final 112.53) is the primary candidate.
#
# ADVICE r4 fixes vs tpu_queue_s4.sh:
#  - failures are COUNTED and the queue exits nonzero so the
#    wait-and-run recovery loop actually resumes flap-killed steps;
#  - the bench step timeout (3000 s) exceeds bench.py's own internal
#    worst case (~960 s probe budget + 1800 s run child) so a cold-cache
#    run cannot be SIGKILLed mid-compile;
#  - markers are namespaced s5_* and the queue refuses a logdir holding
#    another queue's markers (silent step-skipping is impossible).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/tpu_s5}
mkdir -p "$LOG"

# Refuse a logdir seeded by a different queue's markers (ADVICE r4 low).
for f in "$LOG"/*.ok; do
  [ -e "$f" ] || continue
  case "$(basename "$f")" in
    probe.ok|s5_*.ok) ;;  # probe.ok is pre-touched by tpu_wait_and_run.sh
    *) echo "foreign marker $f in $LOG — use a fresh logdir"; exit 1 ;;
  esac
done

FAILS=0
run() { # name timeout cmd...
  local name=$1 to=$2; shift 2
  if [ -e "$LOG/$name.ok" ]; then echo "skip $name (done)"; return 0; fi
  echo "=== $name ($(date +%H:%M:%S), timeout ${to}s)"
  timeout "$to" "$@" >"$LOG/$name.log" 2>&1
  local rc=$?
  echo "rc=$rc" >>"$LOG/$name.log"
  if [ $rc -eq 0 ]; then
    echo done >"$LOG/$name.ok"
  else
    echo "FAIL $name rc=$rc"
    FAILS=$((FAILS + 1))
  fi
  return $rc
}

run probe 420 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((256,256)) @ jnp.ones((256,256))
assert float(np.asarray(x)[0,0]) == 256.0
print('ok', jax.default_backend())
" || exit 1

# 1. headline bench: warms the persistent compile cache + re-verifies.
# Timeout covers bench.py's full internal budget (ADVICE r4 medium #2).
run s5_bench 3000 python bench.py

# 2. THE round-5 decision: hybrid two-phase timing on the bench image
# (CPU final 112.53, in-band). <=1.8 s => conjunction met.
run s5_hybrid_gradient 3600 python tools/hybrid_exp.py gradient

# 3. faster in-band candidates toward the literal <1 s north star
# (phase-2 cap sweep; tool added this round).
run s5_hybrid_frontier 3600 python tools/hybrid_frontier.py --time

# 4. hybrid on the remaining contents (quality already CPU-measured).
run s5_hybrid_rest 3600 python tools/hybrid_exp.py photo poster text-ui

# 5. batch + portfolio on-chip validation (VERDICT r3 item 3, still open).
run s5_batch_portfolio 3600 python tools/batch_portfolio_tpu.py

# 6. BASELINE config 5 at its literal 256-image scale on current code.
run s5_benchmarks256 5400 python benchmarks.py --steps 2 --batch 256 --chunk 16 --only c5

# 7. dither-proxy chip timing (VERDICT r4 item 3; quality table is CPU).
run s5_dither_proxy 3600 python tools/dither_proxy_exp.py 0 8 --contents=gradient

# 8. three-level on the explore/quality config (last stale queue item).
run s5_pre_quality 5400 python tools/prescreen_pre_exp.py quality

echo "queue done ($(date +%H:%M:%S)), fails=$FAILS; logs in $LOG"
exit $((FAILS > 0))
