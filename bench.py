"""Benchmark: 256x256 image optimized on the flagship SNES BG workload.

Measures wall-clock for the full pipeline (k-means init + clustering +
candidate-batched refinement sweeps over all 8x15 slots — the
'balanced' profile: 8 fixed channel-descent sweeps with 16 explore
candidates per visit, reaching the reference schedule's quality band)
on one chip, and reports images/sec-to-converged; the 'fast' gated
recipe is also timed and reported as a secondary field. The baseline
is the reference's serial CPU loop, which "generally stops improving
within a few minutes" (README.md:52-54) — anchored at ~180 s, see
BASELINE.md.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Outage-proofing (round 4; VERDICT r3 weak #2): the axon TPU tunnel can
hang *indefinitely* on backend init or on the first dispatch when the
pool is down (observed 5+ h outages; round 3's official BENCH artifact
was 580 s of silence, rc=1). Signals cannot interrupt a C call blocked
inside the tunnel client, so the bounds are enforced across a PROCESS
boundary: a parent that never imports jax spawns (a) a tiny probe child
(backend init + one real dispatch + fetch), retried with backoff, then
(b) the benchmark child, each under a subprocess timeout the parent can
enforce with SIGKILL. Every failure path prints ONE diagnostic JSON line
and exits 1 — fast, never a silent hang.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

REFERENCE_SECONDS = 180.0  # "a few minutes" (README.md:52-54), lower bound

PROBE_ATTEMPTS = int(os.environ.get("BENCH_PROBE_ATTEMPTS", "3"))
PROBE_TIMEOUT_S = int(os.environ.get("BENCH_PROBE_TIMEOUT_S", "300"))
# 120 s proved too tight on a single-core host behind a slow tunnel: a
# HEALTHY probe measured 139 s there (round 4, 2026-08-19). 300 s still
# fails a dead tunnel in ~16 min total (3 attempts + backoffs).
PROBE_BACKOFFS_S = (15, 45)  # between attempts 1->2 and 2->3
RUN_TIMEOUT_S = int(
    os.environ.get("BENCH_RUN_TIMEOUT_S", "1800")
)  # degraded-tunnel compiles can take ~15-20 min


def _fail(stage: str, detail: str) -> None:
    print(
        json.dumps(
            {
                "metric": "256x256_images_per_sec_to_converged_ssimulacra2",
                "value": None,
                "unit": "images/sec",
                "vs_baseline": None,
                "error": f"TPU unavailable at stage '{stage}': {detail[-400:]}",
            }
        )
    )
    sys.exit(1)


def _parent() -> None:
    """Probe the TPU (bounded, retried), then run the benchmark child."""
    me = os.path.abspath(__file__)
    last = "unknown"
    for attempt in range(PROBE_ATTEMPTS):
        try:
            proc = subprocess.run(
                [sys.executable, me, "--probe"],
                capture_output=True,
                text=True,
                timeout=PROBE_TIMEOUT_S,
            )
            if proc.returncode == 0:
                break
            last = (
                f"probe rc={proc.returncode} "
                f"(attempt {attempt + 1}/{PROBE_ATTEMPTS}): "
                + proc.stderr.strip().replace("\n", " | ")[-300:]
            )
        except subprocess.TimeoutExpired:
            last = f"probe hung >{PROBE_TIMEOUT_S}s (attempt {attempt + 1}/{PROBE_ATTEMPTS})"
        if attempt < PROBE_ATTEMPTS - 1:
            time.sleep(PROBE_BACKOFFS_S[attempt])
    else:
        _fail("probe", last)

    try:
        proc = subprocess.run(
            [sys.executable, me, "--run"],
            capture_output=True,
            text=True,
            timeout=RUN_TIMEOUT_S,
        )
    except subprocess.TimeoutExpired as e:
        _fail(
            "run",
            f"benchmark child hung >{RUN_TIMEOUT_S}s; stderr tail: "
            + str((e.stderr or ""))[-300:],
        )
    sys.stderr.write(proc.stderr)
    if proc.returncode != 0:
        _fail(
            "run",
            f"benchmark child rc={proc.returncode}: "
            + proc.stderr.strip().replace("\n", " | ")[-300:],
        )
    # Forward exactly the child's JSON line (last non-empty stdout line).
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    if not lines:
        _fail("run", "benchmark child produced no output")
    print(lines[-1])


def _probe() -> None:
    """Child: init the backend and force one compile+execute+fetch."""
    import jax.numpy as jnp

    x = jnp.ones((128, 128), jnp.float32)
    np.asarray(x @ x)  # fence: block_until_ready is a no-op on axon


def _test_image(seed: int = 0) -> np.ndarray:
    """Deterministic natural-ish 256x256 RGBA image (gradients + shapes)."""
    rng = np.random.default_rng(seed)
    h = w = 256
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.zeros((h, w, 4), dtype=np.uint8)
    img[..., 0] = (128 + 90 * np.sin(x / 17) + 30 * np.cos(y / 31)).clip(0, 255)
    img[..., 1] = (128 + 80 * np.cos((x + y) / 23)).clip(0, 255)
    img[..., 2] = (128 + 100 * np.sin(y / 13) * np.cos(x / 41)).clip(0, 255)
    img[..., 3] = 255
    blob = rng.integers(0, 256, (8, 8, 3))
    for _ in range(24):
        cy, cx = rng.integers(0, h - 32), rng.integers(0, w - 32)
        img[cy : cy + 32, cx : cx + 32, :3] = (
            img[cy : cy + 32, cx : cx + 32, :3] // 2
            + np.kron(blob, np.ones((4, 4, 1), dtype=np.uint8)) // 2
        )
    return img


def main() -> None:
    import jax

    from snesimage_tpu.config import QuantConfig
    from snesimage_tpu.core import pipeline
    from snesimage_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()  # warm-up compiles persist across invocations

    # HEADLINE (round 5) = the 'balanced' profile: channel descent +
    # two-level prescreen + 16 explore candidates + exact accept
    # threshold 0.005 on a FIXED 8-step budget. This is the first
    # configuration whose ONE chip-measured run satisfies BOTH BASELINE
    # criteria — final error inside the reference schedule's seed band
    # (113.4-115.8; here 115.11) AND >= 100x the 180 s anchor (1.75 s =
    # 103x, tools/inband_exp.py; re-measured on the corrected
    # cross-backend-deterministic init, BENCHMARKS.md "init-precision
    # fix"). The previous headline (the 'fast' gated recipe: ~1.46 s =
    # ~123x at error ~117.7, OUTSIDE the band) is still measured and
    # reported in the 'fast_config' field so the speed frontier stays
    # visible across rounds.
    config = QuantConfig(
        subpalette_count=8, subpalette_size=15, max_steps=8,
        converge_tol=0.0, seed=0, schedule="channel", prescreen=8,
        prescreen_full=2, channel_explore=16, accept_margin=0.005,
    )
    # 'fast' recipe (rank1 gate 0.01, tol 0.5): validated across content
    # types (BENCHMARKS.md "Rank1 visit gating").
    config_fast = QuantConfig(
        subpalette_count=8, subpalette_size=15, max_steps=10,
        converge_tol=0.5, seed=0, schedule="channel", prescreen=8,
        prescreen_full=2, gate_margin=0.01,
    )
    img = _test_image()

    # Warm-up: compile the fused programs on throwaway full runs.
    pipeline.run_fused(img, config)
    pipeline.run_fused(img, config_fast)

    # Timed: full pipeline (each sweep = 120 slot visits, ~10k candidate
    # frame evaluations with full SSIMULACRA2 each), as ONE dispatched
    # XLA program with ONE host sync (run_fused fences on the packed
    # summary fetch). Best of 3 repetitions: the tunnel to the TPU adds
    # 10-300 ms of per-sync jitter unrelated to device time, so the
    # minimum is the steady-state number (all runs reported).
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        state, errors, info = pipeline.run_fused(img, config)
        runs.append(time.perf_counter() - t0)
    elapsed = min(runs)

    fast_runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        _, _, fast_info = pipeline.run_fused(img, config_fast)
        fast_runs.append(time.perf_counter() - t0)
    fast_elapsed = min(fast_runs)

    final_error = info["final_error"]
    images_per_sec = 1.0 / elapsed

    print(
        json.dumps(
            {
                "metric": "256x256_images_per_sec_to_converged_ssimulacra2",
                "value": round(images_per_sec, 5),
                "unit": "images/sec (8x15 palettes, balanced profile: channel descent + explore 16, 8 sweeps, 1 chip)",
                "vs_baseline": round(images_per_sec * REFERENCE_SECONDS, 2),
                "elapsed_seconds": round(elapsed, 3),
                "all_runs_seconds": [round(t, 3) for t in runs],
                "final_error": round(final_error, 4),
                "reference_band": [113.37, 115.78],
                "in_band": bool(final_error <= 115.8),
                "step_errors": [round(e, 4) for e in errors],
                "fast_config": {
                    "elapsed_seconds": round(fast_elapsed, 3),
                    "vs_baseline": round(REFERENCE_SECONDS / fast_elapsed, 2),
                    "final_error": round(fast_info["final_error"], 4),
                },
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--probe":
        _probe()
    elif len(sys.argv) > 1 and sys.argv[1] == "--run":
        main()
    else:
        _parent()
