"""Palette-refinement hot loop: candidate-batched slot optimization.

The reference optimizes one (subpalette, entry) slot per GUI frame by
serially trying 64 random colors / 32 channel values / 56 NES colors, each
with a full-image remap and a full SSIMULACRA2 evaluation
(src/lib.rs:191-328; cost analysis in SURVEY.md §3.3). Here the candidate
axis is a tensor batch:

- all candidates of a slot visit are evaluated in ONE jitted call —
  remap, render and metric are batched over candidates on the MXU;
- the metric's reference-side pyramid is precomputed once per image
  (ops/ssimulacra2.py) and shared across every candidate ever evaluated;
- the undithered remap is *incremental*: distances to the S-1 unchanged
  entries are computed once per slot visit, each candidate contributes a
  single distance column, and the reference's strict-less-than /
  first-index tie semantics are reproduced exactly (src/lib.rs:780-792);
- the dithered path vmaps the wavefront scan of ops/dither.py.

Selection semantics preserved: random/channel keep the current color
unless a candidate is strictly better than the current error
(src/lib.rs:199, 294); the NES sweep always replaces with the best NES
color, even if worse (best_error starts at f64::MAX, src/lib.rs:250).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from snesimage_tpu.config import QuantConfig
from snesimage_tpu.constants import NES_PALETTE_5BIT
from snesimage_tpu.core.state import QuantState
from snesimage_tpu.ops.color import (
    ciede2000,
    expand_5bit_to_8bit,
    red_mean_sq_scaled,
    srgb_u8_to_lab,
)
from snesimage_tpu.ops.dither import remap_dithered
from snesimage_tpu.ops.remap import (
    entry_distances,
    remap_undithered,
    render_rgb8,
)
from snesimage_tpu.ops.ssimulacra2 import reference_pyramid, ssimulacra2_from_ref

_BIG = jnp.float32(3.0e38)


def make_reference_pyramid(state: QuantState):
    """Candidate-independent metric precomputation for this image.
    Passes 8-bit values so the metric's exact sRGB-decode LUT applies."""
    return reference_pyramid(state.rgb)


@partial(jax.jit, static_argnames=("config",))
def full_remap(state: QuantState, config: QuantConfig) -> QuantState:
    """Recompute palette_map from the current palette (reference
    `optimize`, src/lib.rs:425-501), dither-aware."""
    if config.dither:
        pm = remap_dithered(
            state.rgb,
            state.alpha,
            state.tile_palettes,
            state.palette,
            config.perceptual_palettes,
        )
    else:
        pm = remap_undithered(
            state.rgb,
            state.alpha,
            state.tile_palettes,
            state.palette,
            config.perceptual_palettes,
        )
    return state._replace(palette_map=pm)


def _error_of_frame(refp, rgb8: jax.Array) -> jax.Array:
    """Reference `error()`: 100 - SSIMULACRA2 (src/lib.rs:503-548).
    Frames stay 8-bit into the metric (exact LUT decode)."""
    return 100.0 - ssimulacra2_from_ref(refp, rgb8)


@partial(jax.jit, static_argnames=("config",))
def error_of(state: QuantState, config: QuantConfig, refp) -> jax.Array:
    rendered = render_rgb8(
        state.palette_map, state.alpha, state.tile_palettes, state.palette
    )
    return _error_of_frame(refp, rendered)


# ---------------------------------------------------------------------------
# Candidate evaluation
# ---------------------------------------------------------------------------


def _candidate_errors_undithered(
    state: QuantState, config: QuantConfig, refp, p, i, cand5
):
    """Errors for B candidate colors in slot (p, i), incremental remap.

    cand5: (B, 3) 5-bit candidate colors. Returns (B,) f32 errors.
    """
    s = config.subpalette_size
    entries8 = expand_5bit_to_8bit(state.palette)  # (C, S, 3)
    tp_pix = jnp.repeat(jnp.repeat(state.tile_palettes, 8, axis=0), 8, axis=1)
    sub = entries8[tp_pix]  # (H, W, S, 3)
    target_u8 = state.rgb  # undithered: zero accumulated error
    perceptual = config.perceptual_palettes

    # Distances stay in their native dtype: int32 for red-mean (exact
    # integer compares reproduce the reference's f64 tie behavior), f32
    # for CIEDE2000.
    d_all = entry_distances(target_u8, sub, perceptual)
    big = jnp.iinfo(jnp.int32).max if d_all.dtype == jnp.int32 else _BIG

    # Best among entries != i (first-minimum wins), only meaningful where
    # the pixel's tile uses subpalette p.
    excl = jnp.arange(s) == i  # (S,)
    d_masked = jnp.where(excl, big, d_all)
    best_val = jnp.min(d_masked, axis=-1)
    best_idx = jnp.argmin(d_masked, axis=-1).astype(jnp.int32)
    base_idx = jnp.argmin(d_all, axis=-1).astype(jnp.int32)

    affected = tp_pix == p  # (H, W)
    cand8 = expand_5bit_to_8bit(cand5)  # (B, 3)
    if perceptual:
        cand_lab = srgb_u8_to_lab(cand8)
        target_lab = srgb_u8_to_lab(target_u8)

    entries_flat = entries8.reshape(-1, 3)  # (C*S, 3)

    def one_candidate(c8, c_lab_or_none):
        if perceptual:
            d_c = ciede2000(target_lab, c_lab_or_none)
        else:
            d_c = red_mean_sq_scaled(target_u8, c8)
        # Strict-less-than scan over entry index: the candidate (at index
        # i) wins on d_c < best_val, or on ties when i precedes best_idx.
        cand_wins = (d_c < best_val) | ((d_c == best_val) & (i < best_idx))
        idx_aff = jnp.where(cand_wins, i, best_idx)
        idx = jnp.where(affected, idx_aff, base_idx)
        idx = jnp.where(state.alpha > 0, idx, 0)

        # Render with the candidate palette.
        color_index = tp_pix * s + idx
        rgb = entries_flat[color_index]
        uses_cand = affected & (idx == i)
        rgb = jnp.where(uses_cand[..., None], c8, rgb)
        rgb = jnp.where((state.alpha > 0)[..., None], rgb, 0)
        return _error_of_frame(refp, rgb)

    if perceptual:
        return jax.vmap(one_candidate)(cand8, cand_lab)
    return jax.vmap(one_candidate)(cand8, cand8)


def _candidate_errors_dithered(
    state: QuantState, config: QuantConfig, refp, p, i, cand5
):
    """Dithered candidate evaluation: vmapped wavefront remap per palette."""

    def one_candidate(c5):
        palette = jax.lax.dynamic_update_slice(
            state.palette, c5.reshape(1, 1, 3), (p, i, 0)
        )
        pm = remap_dithered(
            state.rgb,
            state.alpha,
            state.tile_palettes,
            palette,
            config.perceptual_palettes,
        )
        rendered = render_rgb8(pm, state.alpha, state.tile_palettes, palette)
        return _error_of_frame(refp, rendered)

    return jax.vmap(one_candidate)(cand5.astype(jnp.int32))


def candidate_errors(state, config: QuantConfig, refp, p, i, cand5):
    if config.dither:
        return _candidate_errors_dithered(state, config, refp, p, i, cand5)
    return _candidate_errors_undithered(state, config, refp, p, i, cand5)


# ---------------------------------------------------------------------------
# Slot refiners (one jitted call per slot visit)
# ---------------------------------------------------------------------------


class SlotResult(NamedTuple):
    state: QuantState
    error: jax.Array  # error after the visit (reference logs this)
    changed: jax.Array  # whether the entry changed


def _apply_best(state, config, p, i, color5) -> QuantState:
    palette = jax.lax.dynamic_update_slice(
        state.palette, color5.astype(jnp.int32).reshape(1, 1, 3), (p, i, 0)
    )
    return full_remap(state._replace(palette=palette), config)


def _slot_random(state: QuantState, config: QuantConfig, refp, key, p, i) -> SlotResult:
    """64 uniform-random 5-bit candidates; keep the best only if it beats
    the current error (src/lib.rs:191-240).

    The baseline (current color) is evaluated inside the same batch as the
    candidates, mirroring the reference's identical-code-path baseline —
    this makes the strict-less-than acceptance robust to batched-vs-single
    ulp differences."""
    current = jax.lax.dynamic_slice(state.palette, (p, i, 0), (1, 1, 3)).reshape(3)
    rand5 = jax.random.randint(key, (config.random_trials, 3), 0, 32, dtype=jnp.int32)
    cand5 = jnp.concatenate([current[None, :], rand5], axis=0)
    errs = candidate_errors(state, config, refp, p, i, cand5)
    base_err = errs[0]
    bidx = jnp.argmin(errs[1:])
    bmin = errs[1:][bidx]
    accept = bmin < base_err
    color = jnp.where(accept, rand5[bidx], current)
    new_state = _apply_best(state, config, p, i, color)
    return SlotResult(new_state, jnp.minimum(bmin, base_err), accept)


def _slot_channel(
    state: QuantState, config: QuantConfig, refp, p, i, channel
) -> SlotResult:
    """Exhaustive sweep of one channel's 32 values (src/lib.rs:286-328).
    Baseline evaluated in-batch (see _slot_random)."""
    current = jax.lax.dynamic_slice(state.palette, (p, i, 0), (1, 1, 3)).reshape(3)
    onehot = (jnp.arange(3) == channel).astype(jnp.int32)
    values = jnp.arange(32, dtype=jnp.int32)
    sweep5 = (
        current[None, :] * (1 - onehot)[None, :] + values[:, None] * onehot[None, :]
    )
    cand5 = jnp.concatenate([current[None, :], sweep5], axis=0)
    errs = candidate_errors(state, config, refp, p, i, cand5)
    base_err = errs[0]
    bidx = jnp.argmin(errs[1:])
    bmin = errs[1:][bidx]
    accept = bmin < base_err
    color = jnp.where(accept, sweep5[bidx], current)
    new_state = _apply_best(state, config, p, i, color)
    return SlotResult(new_state, jnp.minimum(bmin, base_err), accept)


def _slot_nes(state: QuantState, config: QuantConfig, refp, p, i) -> SlotResult:
    """Exhaustive sweep of the 56 NES colors; ALWAYS replaces the entry
    with the best NES color (best_error starts at MAX, src/lib.rs:242-284)."""
    cand5 = jnp.asarray(NES_PALETTE_5BIT)
    errs = candidate_errors(state, config, refp, p, i, cand5)
    bidx = jnp.argmin(errs)
    current = jax.lax.dynamic_slice(state.palette, (p, i, 0), (1, 1, 3)).reshape(3)
    color = cand5[bidx]
    changed = jnp.any(color != current)
    new_state = _apply_best(state, config, p, i, color)
    return SlotResult(new_state, errs[bidx], changed)


refine_slot_random = partial(jax.jit, static_argnames=("config",))(_slot_random)
refine_slot_channel = partial(jax.jit, static_argnames=("config",))(_slot_channel)
refine_slot_nes = partial(jax.jit, static_argnames=("config",))(_slot_nes)


# ---------------------------------------------------------------------------
# On-device full sweeps: one jitted call per scheduler step
# ---------------------------------------------------------------------------
#
# The host-driven loop dispatches one jitted call per slot visit; a full
# 8x15 sweep is 120 dispatches with a device sync each (the scheduler is
# sequentially dependent). These fori_loop versions run the whole sweep in
# one XLA program — the host sees only the final state. Key-split order
# matches the host loop exactly, so both paths produce identical states.


@partial(jax.jit, static_argnames=("config",))
def sweep_random(state: QuantState, config: QuantConfig, refp, key) -> SlotResult:
    """One full random step: every (palette, index) slot once
    (src/lib.rs:888-932, steps with step % 5 < 4)."""
    s = config.subpalette_size

    def body(k, carry):
        state, key, _ = carry
        key, sub = jax.random.split(key)
        res = _slot_random(state, config, refp, sub, k // s, k % s)
        return res.state, key, res.error

    n = config.subpalette_count * s
    state, _, err = jax.lax.fori_loop(
        0, n, body, (state, key, jnp.float32(jnp.inf))
    )
    return SlotResult(state, err, jnp.bool_(True))


@partial(jax.jit, static_argnames=("config",))
def sweep_channel(state: QuantState, config: QuantConfig, refp) -> SlotResult:
    """One full channel step: every slot visited for channels 0,1,2 in
    sequence (src/lib.rs:917-923)."""
    s = config.subpalette_size

    def body(k, carry):
        state, _ = carry
        p = k // (s * 3)
        i = (k // 3) % s
        ch = k % 3
        res = _slot_channel(state, config, refp, p, i, ch)
        return res.state, res.error

    n = config.subpalette_count * s * 3
    state, err = jax.lax.fori_loop(0, n, body, (state, jnp.float32(jnp.inf)))
    return SlotResult(state, err, jnp.bool_(True))


@partial(jax.jit, static_argnames=("config",))
def sweep_nes(state: QuantState, config: QuantConfig, refp) -> SlotResult:
    """One full NES step: every slot NES-swept once (the reference's
    triple-visit counter quirk is coalesced; see core/pipeline.py)."""
    s = config.subpalette_size

    def body(k, carry):
        state, _ = carry
        res = _slot_nes(state, config, refp, k // s, k % s)
        return res.state, res.error

    n = config.subpalette_count * s
    state, err = jax.lax.fori_loop(0, n, body, (state, jnp.float32(jnp.inf)))
    return SlotResult(state, err, jnp.bool_(True))
