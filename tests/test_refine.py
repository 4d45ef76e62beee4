"""Tests for the candidate-batched refine loop (core/refine.py)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from snesimage_tpu.config import QuantConfig
from snesimage_tpu.constants import NES_PALETTE_5BIT
from snesimage_tpu.core import pipeline
from snesimage_tpu.core.refine import (
    candidate_errors,
    error_of,
    full_remap,
    make_reference_pyramid,
    refine_slot_channel,
    refine_slot_nes,
    refine_slot_random,
)
from snesimage_tpu.core.state import new_state


def _prepped(small_image, **kw):
    cfg = QuantConfig(
        subpalette_count=2, subpalette_size=4, width=64, height=64, **kw
    )
    st = new_state(small_image, cfg)
    st = pipeline.initialize(st, cfg)
    st = pipeline.cluster(st, cfg)
    return st, cfg


@pytest.mark.slow
def test_incremental_matches_full_remap(small_image, rng):
    """The incremental undithered candidate evaluation must equal scoring a
    full remap+render with the modified palette."""
    st, cfg = _prepped(small_image)
    refp = make_reference_pyramid(st)
    cands = jnp.asarray(rng.integers(0, 32, (8, 3)), dtype=jnp.int32)
    p, i = 1, 2
    fast = np.asarray(candidate_errors(st, cfg, refp, p, i, cands))

    # Tolerances here and below: batched vs single-frame scoring
    # reassociates f32 sums; the upstream weight table carries weights up
    # to 225, amplifying ~1e-7 feature noise to ~2e-3 score noise.
    # Genuine logic errors show up as O(1) differences.
    slow = []
    for c in np.asarray(cands):
        pal = st.palette.at[p, i].set(jnp.asarray(c))
        st2 = full_remap(st._replace(palette=pal), cfg)
        slow.append(float(error_of(st2, cfg, refp)))
    np.testing.assert_allclose(fast, np.asarray(slow), atol=1e-2)


@pytest.mark.slow
def test_incremental_matches_full_remap_perceptual(small_image, rng):
    st, cfg = _prepped(small_image, perceptual_palettes=True)
    refp = make_reference_pyramid(st)
    cands = jnp.asarray(rng.integers(0, 32, (4, 3)), dtype=jnp.int32)
    p, i = 0, 1
    fast = np.asarray(candidate_errors(st, cfg, refp, p, i, cands))
    slow = []
    for c in np.asarray(cands):
        pal = st.palette.at[p, i].set(jnp.asarray(c))
        st2 = full_remap(st._replace(palette=pal), cfg)
        slow.append(float(error_of(st2, cfg, refp)))
    np.testing.assert_allclose(fast, np.asarray(slow), atol=1e-2)


def test_random_slot_never_worsens(small_image):
    st, cfg = _prepped(small_image)
    refp = make_reference_pyramid(st)
    base = float(error_of(st, cfg, refp))
    key = jax.random.key(7)
    res = refine_slot_random(st, cfg, refp, key, 0, 0)
    # cross-path tolerance: res.error comes from the batched evaluator,
    # base from the unbatched one; f32 metric noise between differently
    # compiled paths is ~0.02 (see ops/ssimulacra2.py precision notes)
    assert float(res.error) <= base + 0.05


def test_channel_slot_never_worsens(small_image):
    st, cfg = _prepped(small_image)
    refp = make_reference_pyramid(st)
    base = float(error_of(st, cfg, refp))
    for ch in range(3):
        res = refine_slot_channel(st, cfg, refp, 0, 0, ch)
        assert float(res.error) <= base + 0.05  # cross-path f32 noise
        st = res.state


def test_channel_keeps_current_when_optimal(small_image):
    """If the current channel value is already optimal, the entry must not
    change (strict less-than acceptance, src/lib.rs:294-306)."""
    st, cfg = _prepped(small_image)
    refp = make_reference_pyramid(st)
    res = refine_slot_channel(st, cfg, refp, 0, 0, 0)
    st2 = res.state
    res2 = refine_slot_channel(st2, cfg, refp, 0, 0, 0)
    # second sweep of the same channel: value already optimal -> unchanged
    np.testing.assert_array_equal(np.asarray(res2.state.palette), np.asarray(st2.palette))
    assert not bool(res2.changed)


def test_nes_always_projects_onto_nes_colors(small_image):
    st, cfg = _prepped(small_image, nes=True)
    refp = make_reference_pyramid(st)
    res = refine_slot_nes(st, cfg, refp, 0, 0)
    entry = np.asarray(res.state.palette)[0, 0]
    assert any((entry == n).all() for n in NES_PALETTE_5BIT)


def test_nes_replaces_even_when_worse(small_image):
    """best_error starts at MAX: the entry is always replaced by the best
    NES color even if the current (non-NES) color scored better
    (src/lib.rs:250)."""
    st, cfg = _prepped(small_image, nes=False)  # palette not NES-constrained
    refp = make_reference_pyramid(st)
    cfg_nes = QuantConfig(
        subpalette_count=2, subpalette_size=4, width=64, height=64, nes=True
    )
    res = refine_slot_nes(st, cfg_nes, refp, 0, 0)
    entry = np.asarray(res.state.palette)[0, 0]
    assert any((entry == n).all() for n in NES_PALETTE_5BIT)


@pytest.mark.slow
def test_dithered_candidate_errors_match_slow_path(small_image, rng):
    st, cfg = _prepped(small_image, dither=True)
    st = full_remap(st, cfg)
    refp = make_reference_pyramid(st)
    cands = jnp.asarray(rng.integers(0, 32, (3, 3)), dtype=jnp.int32)
    fast = np.asarray(candidate_errors(st, cfg, refp, 0, 1, cands))
    slow = []
    for c in np.asarray(cands):
        pal = st.palette.at[0, 1].set(jnp.asarray(c))
        st2 = full_remap(st._replace(palette=pal), cfg)
        slow.append(float(error_of(st2, cfg, refp)))
    np.testing.assert_allclose(fast, np.asarray(slow), atol=1e-2)


@pytest.mark.slow
def test_sweep_matches_per_slot_path(small_image):
    """The on-device fori_loop sweep follows the same schedule and RNG
    stream as the host-driven per-slot path and converges equivalently.

    NOT bit-identical by construction: the sweep body and the standalone
    slot functions are separate XLA compilations, whose f32 fusion
    differences (~1e-7 per feature, amplified by metric weights up to 225)
    can flip candidate selections on near-ties, after which trajectories
    legitimately diverge slot by slot. The invariant that IS guaranteed:
    same visits, same candidate draws, and both paths only ever accept
    strict improvements — so final errors must agree closely."""
    from snesimage_tpu.core.refine import sweep_random, sweep_channel, sweep_nes

    st, cfg = _prepped(small_image)
    refp = make_reference_pyramid(st)

    step_key = jax.random.split(jax.random.key(123))[1]
    fast = sweep_random(st, cfg, refp, step_key)

    slow = st
    k = step_key
    for p in range(cfg.subpalette_count):
        for i in range(cfg.subpalette_size):
            k, sub = jax.random.split(k)
            slow = refine_slot_random(slow, cfg, refp, sub, p, i).state
    e_fast = float(error_of(fast.state, cfg, refp))
    e_slow = float(error_of(slow, cfg, refp))
    e_start = float(error_of(st, cfg, refp))
    assert e_fast <= e_start and e_slow <= e_start
    # Round-3 strengthening (advisor): a genuine schedule/RNG/acceptance
    # bug shifts many slots and whole error points; a legitimate f32
    # near-tie flip shifts at most a slot or two and ~1e-2 error. On this
    # fixture the paths are currently bit-identical.
    diff = (
        np.asarray(fast.state.palette) != np.asarray(slow.palette)
    ).any(axis=-1).sum()
    assert int(diff) <= 1, int(diff)
    assert abs(e_fast - e_slow) < 0.05, (e_fast, e_slow)

    fast_c = sweep_channel(st, cfg, refp)
    slow = st
    for p in range(cfg.subpalette_count):
        for i in range(cfg.subpalette_size):
            for ch in range(3):
                slow = refine_slot_channel(slow, cfg, refp, p, i, ch).state
    e_fast = float(error_of(fast_c.state, cfg, refp))
    e_slow = float(error_of(slow, cfg, refp))
    assert e_fast <= e_start and e_slow <= e_start
    diff = (
        np.asarray(fast_c.state.palette) != np.asarray(slow.palette)
    ).any(axis=-1).sum()
    assert int(diff) <= 1, int(diff)
    assert abs(e_fast - e_slow) < 0.05, (e_fast, e_slow)


@pytest.mark.slow
def test_sweep_trajectory_variants(small_image, poster_image):
    """Round-4 strengthening (VERDICT r3 item 7): the <=1-slot
    sweep-vs-replay bound extends to a dithered fixture, a second content
    type (flat poster art), and the windowed and gated sweep variants.

    Each fused fori_loop sweep is compared against an eager per-visit
    replay of the SAME carried-state machinery (_slot_channel with cache /
    carried error / gate carry) — same visits, same candidates, same
    acceptance — so only f32 fusion differences between the two XLA
    compilations can flip near-tie selections (see
    test_sweep_matches_per_slot_path)."""
    from snesimage_tpu.core.refine import (
        _gating_active,
        _init_cache,
        _slot_channel,
        frame_error_fused,
        gate_base_fused,
        sweep_channel,
    )

    def replay(st, cfg, refp, window):
        err = frame_error_fused(st, cfg, refp)
        cache = _init_cache(st, cfg)
        gb = gate_base_fused(st, cfg, refp) if _gating_active(cfg) else None
        for p in range(cfg.subpalette_count):
            for i in range(cfg.subpalette_size):
                for ch in range(3):
                    res, cache, gb = _slot_channel(
                        st, cfg, refp, p, i, ch, cache, err,
                        window=window, gate_base=gb, skip=True,
                        gate_enable=jnp.bool_(True),
                    )
                    st, err = res.state, res.error
        return st

    cases = [
        (small_image, {"dither": True}, False),
        (poster_image, {}, False),
        (small_image, {"channel_window": 4}, True),
        (
            small_image,
            {"prescreen": 8, "prescreen_full": 2, "gate_margin": 0.01},
            False,
        ),
        (
            small_image,
            {
                "prescreen": 8, "prescreen_full": 2, "gate_margin": 0.01,
                "gate_coarse": True,
            },
            False,
        ),
    ]
    for img, kw, window in cases:
        st, cfg = _prepped(img, **kw)
        refp = make_reference_pyramid(st)
        fast = sweep_channel(st, cfg, refp, window=window)
        slow = replay(st, cfg, refp, window)
        diff = (
            np.asarray(fast.state.palette) != np.asarray(slow.palette)
        ).any(axis=-1).sum()
        assert int(diff) <= 1, (kw, int(diff))
        e_fast = float(frame_error_fused(fast.state, cfg, refp))
        e_slow = float(frame_error_fused(slow, cfg, refp))
        assert abs(e_fast - e_slow) < 0.05, (kw, e_fast, e_slow)


def test_sweep_nes_matches_per_slot(small_image):
    from snesimage_tpu.core.refine import sweep_nes

    st, cfg = _prepped(small_image, nes=True)
    refp = make_reference_pyramid(st)
    fast = sweep_nes(st, cfg, refp)
    slow = st
    for p in range(cfg.subpalette_count):
        for i in range(cfg.subpalette_size):
            slow = refine_slot_nes(slow, cfg, refp, p, i).state
    np.testing.assert_array_equal(
        np.asarray(fast.state.palette), np.asarray(slow.palette)
    )


def test_final_map_equals_full_remap(small_image):
    """The incremental final_map applied after a slot visit must be
    bit-identical to a full remap with the updated palette."""
    from snesimage_tpu.ops.remap import remap_undithered

    for perceptual in (False, True):
        st, cfg = _prepped(small_image, perceptual_palettes=perceptual)
        refp = make_reference_pyramid(st)
        res = refine_slot_random(st, cfg, refp, jax.random.key(3), 1, 2)
        want = remap_undithered(
            res.state.rgb, res.state.alpha, res.state.tile_palettes,
            res.state.palette, perceptual,
        )
        np.testing.assert_array_equal(
            np.asarray(res.state.palette_map), np.asarray(want)
        )


def test_nes_sweep_ignores_prescreen(small_image):
    """The NES sweep ALWAYS replaces the entry (src/lib.rs:250), so a
    coarse misranking under prescreen could pick a strictly worse color —
    an actual regression. NES slot visits must therefore bypass prescreen
    and match full scoring exactly, for every slot."""
    st, cfg = _prepped(small_image, nes=True)
    cfg_pre = QuantConfig(
        subpalette_count=2, subpalette_size=4, width=64, height=64,
        nes=True, prescreen=4,
    )
    refp = make_reference_pyramid(st)
    for p in range(2):
        for i in range(4):
            full = refine_slot_nes(st, cfg, refp, p, i)
            pre = refine_slot_nes(st, cfg_pre, refp, p, i)
            np.testing.assert_array_equal(
                np.asarray(full.state.palette), np.asarray(pre.state.palette)
            )
            assert float(full.error) == float(pre.error)


@pytest.mark.slow
def test_prescreen_matches_full_selection(small_image, rng):
    """Prescreened slot visits must pick the same winning color as full
    scoring when the coarse ranking surfaces the true argmin (validated on
    this fixture); palette results must match."""
    st, cfg = _prepped(small_image)
    cfg_pre = QuantConfig(
        subpalette_count=2, subpalette_size=4, width=64, height=64, prescreen=8
    )
    refp = make_reference_pyramid(st)
    cfg_pre2 = QuantConfig(
        subpalette_count=2, subpalette_size=4, width=64, height=64,
        prescreen=8, prescreen_full=3,
    )
    # Third level: 1/8-res pre-rank keeps the top 16 before the
    # quarter-res coarse stage (VERDICT r3 item 2).
    cfg_pre3 = QuantConfig(
        subpalette_count=2, subpalette_size=4, width=64, height=64,
        prescreen=8, prescreen_full=3, prescreen_pre=16,
    )
    for trial in range(3):
        key = jax.random.key(trial)
        full = refine_slot_random(st, cfg, refp, key, trial % 2, trial % 4)
        pre = refine_slot_random(st, cfg_pre, refp, key, trial % 2, trial % 4)
        np.testing.assert_array_equal(
            np.asarray(full.state.palette), np.asarray(pre.state.palette)
        )
        for cfg_n in (cfg_pre2, cfg_pre3):
            pre_n = refine_slot_random(
                st, cfg_n, refp, key, trial % 2, trial % 4
            )
            np.testing.assert_array_equal(
                np.asarray(full.state.palette),
                np.asarray(pre_n.state.palette),
            )


@pytest.mark.slow
def test_carried_base_matches_legacy(small_image):
    """A slot visit with a carried exact baseline (the on-device sweeps'
    mode: NO baseline row in the candidate batch, acceptance against the
    carried error of the current state) must pick the same color as the
    legacy in-batch-baseline visit across prescreen modes, and the error
    it carries forward must equal the exact error of its resulting state."""
    from snesimage_tpu.core.refine import _slot_channel, frame_error_fused

    cases = [
        ({}, [(0, 1, 0), (1, 2, 1), (1, 3, 2)]),
        ({"prescreen": 8}, [(0, 1, 0), (1, 2, 1), (1, 3, 2)]),
        ({"prescreen": 8, "prescreen_full": 3}, [(0, 1, 0), (1, 3, 2)]),
        (
            {"prescreen": 8, "prescreen_full": 3, "prescreen_pre": 16},
            [(0, 1, 0), (1, 3, 2)],
        ),
        ({"dither": True, "prescreen": 8, "prescreen_full": 3}, [(1, 2, 0)]),
    ]
    for kw, slots in cases:
        st, cfg = _prepped(small_image, **kw)
        refp = make_reference_pyramid(st)
        base = frame_error_fused(st, cfg, refp)
        for p, i, ch in slots:
            legacy, _, _ = _slot_channel(st, cfg, refp, p, i, ch)
            carried, _, _ = _slot_channel(st, cfg, refp, p, i, ch, None, base)
            np.testing.assert_array_equal(
                np.asarray(legacy.state.palette),
                np.asarray(carried.state.palette),
                err_msg=str((kw, p, i, ch)),
            )
            exact = float(frame_error_fused(carried.state, cfg, refp))
            assert abs(float(carried.error) - exact) < 2e-2, (kw, p, i, ch)


@pytest.mark.slow
def test_channel_explore_sweep(small_image):
    """channel_explore: the sweep accepts only strict improvements (error
    monotone within a trajectory), the fused sweep and the per-slot path
    draw identical candidates (same split discipline), and E=0 with a key
    equals the keyless deterministic sweep."""
    from snesimage_tpu.core.refine import sweep_channel

    st, cfg0 = _prepped(small_image)
    cfg = QuantConfig(
        subpalette_count=2, subpalette_size=4, width=64, height=64,
        channel_explore=8,
    )
    refp = make_reference_pyramid(st)
    e_start = float(error_of(st, cfg, refp))

    key = jax.random.key(7)
    fast = sweep_channel(st, cfg, refp, key=key)
    assert float(fast.error) <= e_start + 1e-5

    # per-slot path with the same split-per-visit stream
    slow = st
    k = key
    for p in range(cfg.subpalette_count):
        for i in range(cfg.subpalette_size):
            for ch in range(3):
                k, sub = jax.random.split(k)
                slow = refine_slot_channel(
                    slow, cfg, refp, p, i, ch, key=sub
                ).state
    e_fast = float(error_of(fast.state, cfg, refp))
    e_slow = float(error_of(slow, cfg, refp))
    diff = (
        np.asarray(fast.state.palette) != np.asarray(slow.palette)
    ).any(axis=-1).sum()
    assert int(diff) <= 1, int(diff)
    assert abs(e_fast - e_slow) < 0.05, (e_fast, e_slow)

    # E=0: a passed key must not change the deterministic sweep
    base = sweep_channel(st, cfg0, refp)
    with_key = sweep_channel(st, cfg0, refp, key=jax.random.key(3))
    assert np.array_equal(
        np.asarray(base.state.palette), np.asarray(with_key.state.palette)
    )


def test_channel_window_schedule_and_stop():
    """Windowed channel descent (QuantConfig.channel_window): the
    warmup/period pattern, and the rule that windowed sweeps never fire
    the convergence stop (only exhaustive sweeps can)."""
    from snesimage_tpu.core.pipeline import _is_window_step

    cfg = QuantConfig(
        subpalette_count=2, subpalette_size=4, width=64, height=64,
        schedule="channel", channel_window=5,
    )
    # defaults: warmup 2, period 3 -> E E W W E W W E ...
    assert [bool(_is_window_step(cfg, s)) for s in range(8)] == [
        False, False, True, True, False, True, True, False
    ]
    off = QuantConfig(
        subpalette_count=2, subpalette_size=4, width=64, height=64,
        schedule="channel",
    )
    assert not any(bool(_is_window_step(off, s)) for s in range(8))
    # reference schedule ignores the window knob
    ref = QuantConfig(
        subpalette_count=2, subpalette_size=4, width=64, height=64,
        channel_window=5,
    )
    assert not any(bool(_is_window_step(ref, s)) for s in range(8))


@pytest.mark.slow
def test_channel_window_stop_only_on_exhaustive(small_image):
    """With a huge tolerance every eligible sweep's delta is below tol;
    the fused loop must still run THROUGH windowed steps and stop only
    when an exhaustive sweep confirms the plateau."""
    cfg = QuantConfig(
        subpalette_count=2, subpalette_size=4, width=64, height=64,
        schedule="channel", max_steps=6, converge_tol=1e6,
        channel_window=3, channel_window_warmup=1, channel_window_period=2,
    )
    # pattern: E W E W E W; step 0 never stops (empty window), step 1 is
    # windowed (skipped), step 2 is the first exhaustive stop candidate.
    _, errs, _ = pipeline.run_fused(np.asarray(small_image), cfg)
    assert len(errs) == 3, errs
    # without the window guard the same run stops one step earlier
    cfg0 = dataclasses.replace(cfg, channel_window=0)
    _, errs0, _ = pipeline.run_fused(np.asarray(small_image), cfg0)
    assert len(errs0) == 2, errs0


def test_channel_window_slot_visit(small_image):
    """A windowed visit only ever picks values inside the clamped window,
    and (window covering the whole range) equals the exhaustive visit."""
    st, cfg0 = _prepped(small_image)
    cfg = QuantConfig(
        subpalette_count=2, subpalette_size=4, width=64, height=64,
        channel_window=4,
    )
    refp = make_reference_pyramid(st)
    p, i, ch = 1, 2, 0
    cur = int(np.asarray(st.palette)[p, i, ch])
    res = refine_slot_channel(st, cfg, refp, p, i, ch, window=True)
    got = int(np.asarray(res.state.palette)[p, i, ch])
    assert abs(got - cur) <= 4, (cur, got)

    # window 15 spans [cur-15, cur+15] clamped — includes every value an
    # exhaustive sweep can reach iff cur is mid-range; compare acceptance
    # against exhaustive on the same slot for a mid-range current value.
    wide = QuantConfig(
        subpalette_count=2, subpalette_size=4, width=64, height=64,
        channel_window=15,
    )
    exh = refine_slot_channel(st, cfg0, refp, p, i, ch)
    if 15 <= cur <= 16:
        win = refine_slot_channel(st, wide, refp, p, i, ch, window=True)
        np.testing.assert_array_equal(
            np.asarray(win.state.palette), np.asarray(exh.state.palette)
        )
    # windowed error never worse than the carried baseline semantics:
    # strict-less-than acceptance keeps the current color on no-improve
    assert float(res.error) <= float(error_of(st, cfg, refp)) + 1e-4


@pytest.mark.slow
def test_gate_margin_slot_visit(small_image):
    """The rank1 visit gate (QuantConfig.gate_margin): an open gate must
    reproduce the ungated visit exactly (same palette, same carried
    error) and return the accepted state's scale-0 weighted sum as the
    new carry; a prohibitively large margin must close the gate — visit
    rejected with state, error, and carry unchanged."""
    from snesimage_tpu.core.refine import (
        _gating_active,
        _slot_channel,
        frame_error_fused,
        gate_base_fused,
    )

    st, cfg = _prepped(
        small_image, prescreen=8, prescreen_full=3, gate_margin=0.01
    )
    assert _gating_active(cfg)
    refp = make_reference_pyramid(st)
    base = frame_error_fused(st, cfg, refp)
    gb = gate_base_fused(st, cfg, refp)
    for p, i, ch in [(0, 1, 0), (1, 2, 1), (1, 3, 2)]:
        plain, _, _ = _slot_channel(st, cfg, refp, p, i, ch, None, base)
        gated, _, gb2 = _slot_channel(
            st, cfg, refp, p, i, ch, None, base, gate_base=gb
        )
        # the fixture's early visits improve by >> margin: gate opens and
        # the gated visit picks the same color (the carried error may
        # differ by f32 compilation noise: the gated scale-0 stage is
        # traced as ONE fused computation under lax.cond, the plain one
        # executes op-by-op here — ~1e-5 on errors of ~170)
        assert bool(plain.changed), (p, i, ch)
        np.testing.assert_array_equal(
            np.asarray(plain.state.palette), np.asarray(gated.state.palette)
        )
        assert abs(float(plain.error) - float(gated.error)) < 1e-3
        # the carry update equals the accepted state's own per-scale
        # [scale-0, scale-1] sums
        want_carry = np.asarray(gate_base_fused(gated.state, cfg, refp))
        np.testing.assert_allclose(
            np.asarray(gb2), want_carry, rtol=1e-3
        )

    cfg_closed = QuantConfig(
        subpalette_count=2, subpalette_size=4, width=64, height=64,
        prescreen=8, prescreen_full=3, gate_margin=1e6,
    )
    for p, i, ch in [(0, 1, 0), (1, 2, 1)]:
        res, _, gb2 = _slot_channel(
            st, cfg_closed, refp, p, i, ch, None, base, gate_base=gb
        )
        assert not bool(res.changed)
        np.testing.assert_array_equal(
            np.asarray(res.state.palette), np.asarray(st.palette)
        )
        assert float(res.error) == float(base)
        np.testing.assert_array_equal(np.asarray(gb2), np.asarray(gb))


def test_gate_requires_separate_scale0_stage(small_image):
    """prescreen_full >= prescreen leaves no separate scale-0 stage to
    skip, so gating must deactivate instead of tripping the gated path's
    m < k assertion (round 5; the perceptual auto-bump of prescreen_full
    could create this combination from a valid user config)."""
    from snesimage_tpu.core.refine import (
        _gating_active,
        frame_error_fused,
        make_reference_pyramid,
        sweep_channel,
    )
    from snesimage_tpu.core.state import new_state
    from snesimage_tpu.core import pipeline

    cfg = QuantConfig(subpalette_count=2, subpalette_size=3, width=64,
                      height=64, schedule="channel", prescreen=4,
                      prescreen_full=4, gate_margin=0.01)
    assert not _gating_active(cfg)
    st = new_state(small_image, cfg)
    st = pipeline.initialize(st, cfg)
    st = pipeline.cluster(st, cfg)
    refp = make_reference_pyramid(st)
    res = sweep_channel(st, cfg, refp)  # previously: AssertionError
    assert np.isfinite(float(res.error))
    assert float(res.error) <= float(frame_error_fused(st, cfg, refp)) + 1e-4


@pytest.mark.slow
def test_gate_margin_sweep_quality(small_image):
    """A gated full channel sweep must stay close to the ungated sweep's
    error on the fixture (the gate only skips visits whose predicted
    improvement is below the margin) and never worsen the incoming
    error."""
    from snesimage_tpu.core.refine import sweep_channel, frame_error_fused

    st, cfg0 = _prepped(small_image, prescreen=8, prescreen_full=3)
    cfg1 = QuantConfig(
        subpalette_count=2, subpalette_size=4, width=64, height=64,
        prescreen=8, prescreen_full=3, gate_margin=0.05,
    )
    refp = make_reference_pyramid(st)
    base = float(frame_error_fused(st, cfg0, refp))
    plain = sweep_channel(st, cfg0, refp)
    gated = sweep_channel(st, cfg1, refp)
    assert float(gated.error) <= base + 1e-5
    assert abs(float(gated.error) - float(plain.error)) < 0.5, (
        float(gated.error), float(plain.error),
    )


def test_accept_margin(small_image):
    """QuantConfig.accept_margin: a prohibitive threshold rejects every
    candidate (state unchanged, carried error preserved); margin 0 is
    bit-identical to the default strict-less-than rule."""
    from snesimage_tpu.core.refine import _slot_channel, frame_error_fused

    st, cfg0 = _prepped(small_image)
    cfg_hi = QuantConfig(
        subpalette_count=2, subpalette_size=4, width=64, height=64,
        accept_margin=1e6,
    )
    refp = make_reference_pyramid(st)
    base = frame_error_fused(st, cfg0, refp)
    for p, i, ch in [(0, 1, 0), (1, 2, 1)]:
        plain, _, _ = _slot_channel(st, cfg0, refp, p, i, ch, None, base)
        assert bool(plain.changed)
        res, _, _ = _slot_channel(st, cfg_hi, refp, p, i, ch, None, base)
        assert not bool(res.changed)
        np.testing.assert_array_equal(
            np.asarray(res.state.palette), np.asarray(st.palette)
        )
        assert float(res.error) == float(base)

    cfg_zero = QuantConfig(
        subpalette_count=2, subpalette_size=4, width=64, height=64,
        accept_margin=0.0,
    )
    a, _, _ = _slot_channel(st, cfg0, refp, 0, 1, 0, None, base)
    b, _, _ = _slot_channel(st, cfg_zero, refp, 0, 1, 0, None, base)
    np.testing.assert_array_equal(
        np.asarray(a.state.palette), np.asarray(b.state.palette)
    )
    assert float(a.error) == float(b.error)


@pytest.mark.slow
def test_gate_exact_confirmation_stop(small_image):
    """The fused loop must not stop on a starved GATED sweep: an
    aggressively large margin starves every gated sweep from step 0, so
    without confirmation the run would freeze at the initial error.
    With confirmation, alternating exact sweeps must drive the error to
    (approximately) the ungated plateau."""
    cfg_gate = QuantConfig(
        subpalette_count=2, subpalette_size=4, width=64, height=64,
        prescreen=8, prescreen_full=3, gate_margin=10.0, max_steps=8,
        converge_tol=0.5, schedule="channel",
    )
    cfg_plain = QuantConfig(
        subpalette_count=2, subpalette_size=4, width=64, height=64,
        prescreen=8, prescreen_full=3, max_steps=8,
        converge_tol=0.5, schedule="channel",
    )
    st0 = new_state(small_image, cfg_plain)
    st0 = pipeline.initialize(st0, cfg_plain)
    st0 = pipeline.cluster(st0, cfg_plain)
    refp = make_reference_pyramid(st0)
    start = float(error_of(st0, cfg_plain, refp))

    st_g, errs_g = pipeline.optimize(st0, cfg_gate, refp=refp)
    st_p, errs_p = pipeline.optimize(st0, cfg_plain, refp=refp)
    e_g = float(error_of(st_g, cfg_gate, refp))
    e_p = float(error_of(st_p, cfg_plain, refp))
    # every gated sweep starves at margin 10 -> all progress comes from
    # the exact confirmation sweeps; without them e_g would equal start
    assert e_g < start - 1.0, (e_g, start)
    assert e_g < e_p + 1.0, (e_g, e_p)


@pytest.mark.slow
def test_run_fused_three_level_matches_two_level(small_image):
    """End-to-end: a fused channel-descent run with the three-level
    cascade (--prescreen-pre) must converge to the same palette as the
    two-level run on this fixture (the 1/8-res pre-rank surfaces the
    true coarse winners — selection-perfection at the run level)."""
    base = dict(
        subpalette_count=2, subpalette_size=4, width=64, height=64,
        schedule="channel", max_steps=4, prescreen=8, prescreen_full=2,
    )
    img = np.asarray(small_image)
    st2, errs2, info2 = pipeline.run_fused(img, QuantConfig(**base))
    st3, errs3, info3 = pipeline.run_fused(
        img, QuantConfig(**base, prescreen_pre=16)
    )
    np.testing.assert_array_equal(
        np.asarray(st2.palette), np.asarray(st3.palette)
    )
    assert abs(info2["final_error"] - info3["final_error"]) < 1e-3


@pytest.mark.slow
def test_gate_coarse_open_and_closed(small_image):
    """The coarse gate (QuantConfig.gate_coarse): an open gate must
    reproduce the plain gated visit exactly; a prohibitively large margin
    must reject the visit with state, error, and carry unchanged — and
    skip the finalist pipeline entirely (structurally identical reject
    semantics to the rank1 gate)."""
    from snesimage_tpu.core.refine import (
        _gating_active,
        _slot_channel,
        frame_error_fused,
        gate_base_fused,
    )

    st, cfg = _prepped(
        small_image, prescreen=8, prescreen_full=3, gate_margin=0.01,
        gate_coarse=True,
    )
    assert _gating_active(cfg)
    refp = make_reference_pyramid(st)
    base = frame_error_fused(st, cfg, refp)
    gb = gate_base_fused(st, cfg, refp)
    assert np.asarray(gb).shape == (2,)
    cfg_r1 = _prepped(
        small_image, prescreen=8, prescreen_full=3, gate_margin=0.01
    )[1]
    opened = 0
    for p, i, ch in [(0, 1, 0), (1, 2, 1), (1, 3, 2)]:
        r1, _, _ = _slot_channel(
            st, cfg_r1, refp, p, i, ch, None, base, gate_base=gb
        )
        rc, _, gb2 = _slot_channel(
            st, cfg, refp, p, i, ch, None, base, gate_base=gb
        )
        assert bool(r1.changed), (p, i, ch)
        if bool(rc.changed):
            # Coarse gate open: the visit accepts an improvement. NOT
            # necessarily the rank1-gated pick: the extra lax.cond's f32
            # fusion differences can flip the scale-1 rank's top-m cut on
            # near-ties — a missed improvement under the documented
            # prescreen semantics, never a regression vs the carried
            # exact error.
            opened += 1
            assert float(rc.error) < float(base)
            diff = (
                np.asarray(r1.state.palette) != np.asarray(rc.state.palette)
            ).any(axis=-1).sum()
            assert int(diff) <= 1, (p, i, ch, int(diff))
            want_carry = np.asarray(gate_base_fused(rc.state, cfg, refp))
            np.testing.assert_allclose(
                np.asarray(gb2), want_carry, rtol=1e-3
            )
        else:
            # Coarse-gate blind-spot reject: the improvement the rank1
            # path accepted lives in scales 0-1 (invisible to the
            # scale-2..5 prediction — large on this 64x64 fixture, whose
            # coarse scales are 16x16 and below). Reject semantics must
            # be clean: state, error, and carry unchanged. At the sweep
            # level the EXACT-confirmation rule recovers such misses
            # (pipeline._optimize_fused).
            np.testing.assert_array_equal(
                np.asarray(rc.state.palette), np.asarray(st.palette)
            )
            assert float(rc.error) == float(base)
            np.testing.assert_array_equal(
                np.asarray(gb2), np.asarray(gb)
            )
    assert opened >= 1  # the open path must actually be exercised

    cfg_closed = QuantConfig(
        subpalette_count=2, subpalette_size=4, width=64, height=64,
        prescreen=8, prescreen_full=3, gate_margin=1e6, gate_coarse=True,
    )
    for p, i, ch in [(0, 1, 0), (1, 2, 1)]:
        res, _, gb2 = _slot_channel(
            st, cfg_closed, refp, p, i, ch, None, base, gate_base=gb
        )
        assert not bool(res.changed)
        np.testing.assert_array_equal(
            np.asarray(res.state.palette), np.asarray(st.palette)
        )
        assert float(res.error) == float(base)
        np.testing.assert_array_equal(np.asarray(gb2), np.asarray(gb))


def test_gate_coarse_config_guard():
    with pytest.raises(ValueError):
        QuantConfig(gate_coarse=True)  # requires gate_margin > 0


@pytest.mark.slow
def test_dither_proxy_structure_and_regret(small_image, rng):
    """config.dither_proxy (round 4): exactly K (+ the legacy baseline)
    rows are exactly scored per dithered visit — everything else +inf —
    every finite entry equals the unproxied exact dithered score for
    that candidate, and the proxy's selected winner has bounded regret
    vs full dithered scoring on this fixture."""
    from snesimage_tpu.core.refine import _candidate_errors_dithered

    st, cfg0 = _prepped(small_image, dither=True, prescreen=8,
                        prescreen_full=2)
    cfg = dataclasses.replace(cfg0, dither_proxy=6)
    refp = make_reference_pyramid(st)
    cands = jnp.asarray(rng.integers(0, 32, (24, 3)), dtype=jnp.int32)
    p, i = 1, 2

    full = np.asarray(
        _candidate_errors_dithered(st, cfg0, refp, p, i, cands,
                                   carried_base=True)
    )
    prox = np.asarray(
        _candidate_errors_dithered(st, cfg, refp, p, i, cands,
                                   carried_base=True)
    )
    finite = np.isfinite(prox)
    assert finite.sum() == 6
    # Exactness on the survivors: same wavefront + same metric. (The
    # unproxied run prescreens too, so compare only rows finite in BOTH.)
    both = finite & np.isfinite(full)
    assert both.sum() >= 1
    np.testing.assert_allclose(prox[both], full[both], atol=1e-2)
    # Bounded regret: the proxy's best candidate is nearly as good as
    # the full scoring's best (coarse scales rank well on this fixture).
    assert np.nanmin(prox[finite]) <= np.nanmin(full[np.isfinite(full)]) + 0.25

    # Legacy mode: baseline row 0 always scored.
    prox_l = np.asarray(
        _candidate_errors_dithered(
            st, cfg, refp, p, i,
            jnp.concatenate([st.palette[p, i][None], cands]),
        )
    )
    assert np.isfinite(prox_l[0])
    assert np.isfinite(prox_l).sum() == 7


@pytest.mark.slow
def test_dither_proxy_run_level(small_image):
    """A proxied dithered run (fused sweeps) must stay close to the
    unproxied run: same stop rule, exact acceptance on survivors — the
    only permitted difference is missed improvements from proxy
    misranks."""
    kw = dict(dither=True, schedule="channel", prescreen=8,
              prescreen_full=2, converge_tol=0.5, max_steps=4)
    cfg0 = QuantConfig(subpalette_count=2, subpalette_size=4, width=64,
                       height=64, **kw)
    cfg1 = dataclasses.replace(cfg0, dither_proxy=6)
    _, e0, info0 = pipeline.run_fused(small_image, cfg0)
    _, e1, info1 = pipeline.run_fused(small_image, cfg1)
    assert info1["final_error"] <= info0["final_error"] + 1.0
