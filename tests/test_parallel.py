"""Multi-chip batch sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from snesimage_tpu.config import QuantConfig
from snesimage_tpu.parallel import batch as pb


def _images(rng, b=8, h=64, w=64):
    imgs = rng.integers(0, 256, (b, h, w, 4)).astype(np.uint8)
    imgs[..., 3] = 255
    return imgs


def test_mesh_has_8_devices():
    mesh = pb.make_mesh()
    assert mesh.devices.size == 8


def test_batched_run_sharded(rng):
    imgs = _images(rng)
    cfg = QuantConfig(subpalette_count=2, subpalette_size=3, width=64, height=64,
                      max_steps=1)
    mesh = pb.make_mesh()
    states, errors = pb.batched_run(imgs, cfg, mesh=mesh, max_steps=1)
    assert states.palette.shape == (8, 2, 3, 3)
    assert len(errors) == 1
    assert np.isfinite(errors[0])


def test_batched_matches_single(rng):
    """Sharded batched execution must produce the same result as running
    each image through the single-image pipeline."""
    from snesimage_tpu.core import pipeline
    from snesimage_tpu.core.state import new_state

    imgs = _images(rng, b=2)
    cfg = QuantConfig(subpalette_count=1, subpalette_size=3, width=64, height=64,
                      max_steps=1)

    states = pb.make_batched_states(imgs, cfg)
    states = pb.binit(states, cfg)
    states = pb.bcluster(states, cfg)

    for b in range(2):
        st = new_state(imgs[b], cfg)
        st = pipeline.initialize(st, cfg)
        st = pipeline.cluster(st, cfg)
        np.testing.assert_array_equal(
            np.asarray(states.palette[b]), np.asarray(st.palette)
        )
        np.testing.assert_array_equal(
            np.asarray(states.palette_map[b]), np.asarray(st.palette_map)
        )


def test_sharding_actually_partitions(rng):
    imgs = _images(rng)
    cfg = QuantConfig(subpalette_count=1, subpalette_size=3, width=64, height=64)
    mesh = pb.make_mesh()
    states = pb.make_batched_states(imgs, cfg)
    states = pb.shard_states(states, mesh)
    shards = states.original.addressable_shards
    assert len(shards) == 8
    assert shards[0].data.shape[0] == 1  # 8 images over 8 devices


def test_batched_pad_replicas_excluded_from_mean(rng):
    """n_real excludes mesh-padding replicas from the reported per-step
    mean error: a batch of [A, B] with n_real=1 must report A's errors,
    not the A/B mean."""
    imgs = _images(rng, b=2)
    cfg = QuantConfig(subpalette_count=2, subpalette_size=3, width=64,
                      height=64, max_steps=1)
    _, errs_real1 = pb.batched_run(imgs, cfg, max_steps=1, n_real=1)
    _, errs_a_alone = pb.batched_run(imgs[:1], cfg, max_steps=1)
    _, errs_both = pb.batched_run(imgs, cfg, max_steps=1)
    assert abs(errs_real1[0] - errs_a_alone[0]) < 1e-3
    assert abs(errs_both[0] - errs_real1[0]) > 1e-3  # B actually differs


def test_batched_converge_tol_stops_early(rng):
    """The batched fused loop's plateau rule: with a huge tol the run
    stops after cycle+1 sweeps instead of burning the full budget."""
    imgs = _images(rng, b=2)
    cfg = QuantConfig(subpalette_count=2, subpalette_size=3, width=64,
                      height=64, max_steps=6, schedule="channel",
                      converge_tol=1e9)
    _, errors = pb.batched_run(imgs, cfg)
    # channel schedule: cycle=1, so the stop can fire at step 2.
    assert len(errors) == 2, errors
    cfg0 = QuantConfig(subpalette_count=2, subpalette_size=3, width=64,
                       height=64, max_steps=6, schedule="channel")
    _, errors0 = pb.batched_run(imgs, cfg0)
    assert len(errors0) == 6


def test_batched_channel_explore_draws_keys(rng):
    """channel_explore in the batched loop draws per-image keys: the
    explore run's trajectory must diverge from the deterministic sweep
    while never ending worse (strict-less-than acceptance)."""
    imgs = _images(rng, b=2)
    base = dict(subpalette_count=2, subpalette_size=3, width=64, height=64,
                max_steps=2, schedule="channel")
    _, errs_det = pb.batched_run(imgs, QuantConfig(**base))
    _, errs_exp = pb.batched_run(
        imgs, QuantConfig(**base, channel_explore=8)
    )
    assert errs_exp[-1] <= errs_det[-1] + 1e-3


def test_portfolio_keeps_best_seed(rng):
    """portfolio_run optimizes K RNG trajectories of one image and returns
    the one with the minimum final error."""
    from snesimage_tpu.core.refine import error_of, make_reference_pyramid

    img = _images(rng, b=1)[0]
    cfg = QuantConfig(
        subpalette_count=2, subpalette_size=3, width=64, height=64,
        max_steps=1, dither=True,
    )
    best, seed_errs, steps = pb.portfolio_run(img, cfg, 3)
    assert seed_errs.shape == (3,)
    # trajectories actually diverged (random steps draw per-seed keys)
    assert len(set(np.round(seed_errs, 4))) > 1
    refp = make_reference_pyramid(best)
    got = float(error_of(best, cfg, refp))
    assert abs(got - float(seed_errs.min())) < 1e-3
