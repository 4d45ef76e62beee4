"""Hybrid two-phase schedule experiment (round 4, VERDICT item 2).

Phase 1 = the headline fast config (gated channel descent, tol 0.5) run
to its plateau; phase 2 = the explore/quality config (channel-explore
16, accept-margin 0.005, tol 0.1) POLISHING phase-1's state. Rationale:
the quality config's early sweeps pay explore-candidate cost for work
the gated fast sweeps do cheaper; chaining configs should land in the
same quality basin (<= 115.8 on the bench image, the reference
schedule's seed band) at a fraction of the quality config's wall-clock
(CPU run decides QUALITY; the TPU queue times it).

Both phases run as chained fused programs with ONE host sync at the end
(phase 2 consumes phase 1's on-device step count as its dynamic RNG
start_step, so no fetch is needed between phases).

Controls (same contents, quality config alone, CPU):
gradient 115.04 / photo 87.95 / poster 26.06 / text-ui 18.77
(/tmp/gate_explore.log gate=0.0 rows, = BENCHMARKS.md round-4 re-test).

Usage: python tools/hybrid_exp.py [content ...]   (default: all four)
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax.numpy as jnp
import numpy as np

from margin_exp import CONTENTS
from snesimage_tpu.config import QuantConfig
from snesimage_tpu.core import pipeline
from snesimage_tpu.core.state import new_state
from snesimage_tpu.utils.cache import enable_compile_cache

FAST = dict(
    subpalette_count=8, subpalette_size=15, max_steps=10, converge_tol=0.5,
    seed=0, schedule="channel", prescreen=8, prescreen_full=2,
    gate_margin=0.01,
)
QUALITY = dict(
    subpalette_count=8, subpalette_size=15, max_steps=14, converge_tol=0.1,
    seed=0, schedule="channel", prescreen=8, prescreen_full=2,
    channel_explore=16, accept_margin=0.005,
)


def hybrid(img: np.ndarray):
    cfg_f = QuantConfig(**FAST)
    cfg_q = QuantConfig(**QUALITY)
    t0 = time.perf_counter()
    state = new_state(img, cfg_f)
    state, refp = pipeline._prep_fused(state, cfg_f)
    cap1 = cfg_f.max_steps
    state, s1 = pipeline._optimize_fused_summary(
        state, cfg_f, refp, cap1, 0, cap1
    )
    # Phase 2 starts its RNG stream after phase 1's (dynamic, on-device)
    # step count — no host sync between the phases.
    n1 = s1[cap1].astype(jnp.int32)
    cap2 = cfg_q.max_steps
    state, s2 = pipeline._optimize_fused_summary(
        state, cfg_q, refp, cap2, n1, cap2
    )
    a1 = np.asarray(s1)
    a2 = np.asarray(s2)  # the one host sync
    sec = time.perf_counter() - t0
    k1, k2 = int(a1[cap1]), int(a2[cap2])
    return {
        "sec": round(sec, 1),
        "final": round(float(a2[cap2 + 1]), 4),
        "steps1": k1,
        "steps2": k2,
        "phase1_errors": [round(float(e), 3) for e in a1[:k1]],
        "phase2_errors": [round(float(e), 3) for e in a2[:k2]],
    }


def main():
    enable_compile_cache()
    names = sys.argv[1:] or list(CONTENTS)
    for name in names:
        row = {"exp": "hybrid", "content": name}
        row.update(hybrid(CONTENTS[name]))
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
