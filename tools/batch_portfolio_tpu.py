"""On-chip validation of the batched + portfolio paths (VERDICT r3 item 3
/ round-2 advisor's vmap-of-pallas finding): a 16-image batched NES run
and an 8-seed dithered portfolio run on the real TPU, with the Pallas
prescreen path asserted active. Prints one JSON line per workload with
wall-clock and per-image/per-seed errors for BENCHMARKS.md.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np

from bench import _test_image
from snesimage_tpu.config import QuantConfig
from snesimage_tpu.ops.pallas_prescreen import use_pallas_prescreen
from snesimage_tpu.parallel import batch as pb
from snesimage_tpu.utils.cache import enable_compile_cache


def main():
    enable_compile_cache()
    assert use_pallas_prescreen(), (
        "Pallas prescreen path inactive — not running on a TPU backend"
    )

    # Batched NES (BASELINE config 5 shape, 16 images on one chip).
    imgs = np.stack([_test_image(seed) for seed in range(16)])
    config = QuantConfig(
        subpalette_count=4, subpalette_size=3, nes=True, max_steps=4,
        schedule="channel", prescreen=8, prescreen_full=2,
    )
    mesh = pb.make_mesh()
    pb.batched_run(imgs[:2], config, mesh=mesh, max_steps=1)  # compile
    t0 = time.perf_counter()
    states, errors = pb.batched_run(imgs, config, mesh=mesh, n_real=16)
    elapsed = time.perf_counter() - t0
    print(json.dumps({
        "workload": "batched_nes_16",
        "sec": round(elapsed, 3),
        "images_per_sec": round(16 / elapsed, 3),
        "mean_error_per_step": [round(e, 4) for e in errors],
        "devices": mesh.devices.size,
    }), flush=True)

    # Portfolio: 8 RNG seeds of one dithered flagship image, keep best.
    # Reference schedule: its random visits draw per-seed keys, so the
    # trajectories genuinely diverge (the plain channel schedule is
    # deterministic — K identical copies; portfolio_seeds_degenerate).
    # Round-3 measured the same shape at 44.2 s warm.
    config_p = QuantConfig(
        subpalette_count=8, subpalette_size=15, dither=True, max_steps=6,
        converge_tol=0.5, schedule="reference", prescreen=8, prescreen_full=2,
    )
    img = _test_image()
    pb.portfolio_run(img, config_p, 2)  # compile
    t0 = time.perf_counter()
    best, seed_errs, steps = pb.portfolio_run(img, config_p, 8)
    elapsed = time.perf_counter() - t0
    print(json.dumps({
        "workload": "portfolio_8_dithered",
        "sec": round(elapsed, 3),
        "per_seed_final": [round(float(e), 4) for e in np.asarray(seed_errs)],
        "kept": round(float(np.asarray(seed_errs).min()), 4),
    }), flush=True)


if __name__ == "__main__":
    main()
