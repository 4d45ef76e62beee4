#!/bin/bash
# Round-5 queue, revision B (after the in-band/hybrid chip findings):
# the hybrid timing steps are moot (hybrid measured not transferring to
# the chip — BENCHMARKS.md "north star" section); what remains is the
# new two-config bench validation plus the stale round-3/-4 queue items.
# Same failure-counting/namespacing discipline as tpu_queue_s5.sh.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/tpu_s5b}
mkdir -p "$LOG"

for f in "$LOG"/*.ok; do
  [ -e "$f" ] || continue
  case "$(basename "$f")" in
    probe.ok|s5b_*.ok) ;;
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

# 1. the new two-config bench (balanced headline + fast secondary).
run s5b_bench 3000 python bench.py

# 2. dither-proxy quality+timing across contents (VERDICT r4 item 3).
run s5b_dither_proxy 5400 python tools/dither_proxy_exp.py 0 8 12

# 3. batch + portfolio on-chip validation (VERDICT r3 item 3; portfolio
# path re-measured after the per-seed explore-key fix).
run s5b_batch_portfolio 3600 python tools/batch_portfolio_tpu.py

# 4. BASELINE config 5 at its literal 256-image scale on current code.
run s5b_benchmarks256 5400 python benchmarks.py --steps 2 --batch 256 --chunk 16 --only c5

# 5. three-level on the explore/quality config (last stale queue item).
run s5b_pre_quality 5400 python tools/prescreen_pre_exp.py quality

echo "queue done ($(date +%H:%M:%S)), fails=$FAILS; logs in $LOG"
exit $((FAILS > 0))
