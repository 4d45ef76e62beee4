"""Pallas TPU kernel for the Floyd-Steinberg wavefront scan.

The XLA `lax.scan` formulation of ops/dither.py is correct but pays the
XLA while-loop per-iteration overhead — measured ~44 us/iteration on v5e
even for a one-op dependent carry, i.e. ~34 ms per 766-column wavefront.
This kernel runs the entire scan inside one Mosaic program with the error
window carried in VMEM, and — crucially — processes ALL candidate colors
of a slot visit simultaneously per column: the scan's dependent chain is
walked once, with (B, H) vector work per step, instead of B serialized
766-step chains.

Layouts keep the image row axis H on the 128-wide LANE dimension and the
candidate axis B on sublanes; per-step values are (B, H) tiles. The
nearest-entry argmin runs as a static unrolled loop over the S palette
entries with strict-less-than updates (first index wins, the reference's
tie rule, src/lib.rs:780-792). Per-pixel subpalette colors are rebuilt
per column from the tiny (C, 3*S) entry table with C static selects
(materializing a (WS, H, S, 3) gather in HBM dominated everything else).

Structure:
  grid = (WS/CHUNK,)           # column chunks, sequential
  per-chunk inputs (streamed HBM->VMEM):
    orig_sk  (CHUNK, 3, H) f32   skewed source columns
    tp_sk    (CHUNK, H) i32      subpalette id per pixel
    aff_sk   (CHUNK, H) i32      1 where the pixel's tile uses palette p
    alpha_sk (CHUNK, H) i32      opacity
    xof_sk   (CHUNK, H) i32      source x (-1 outside the skewed region)
  whole-array inputs: entries (C, 3*S) f32 in VMEM; cand_cols (3, B, H)
  f32 (candidate colors pre-broadcast along H); the slot entry index in
  SMEM.
  output: (WS/CHUNK blocks of) (CHUNK, B, H) i32 palette-map columns.
  carry: nine (B, H) error-window planes (columns c..c+2 x rgb),
  persisted across chunks in a (9, B, H) VMEM scratch.

Candidate semantics: distances go to the shared current-palette entries,
with entry ``i``'s distance replaced by the distance to each candidate's
color for affected pixels — the same incremental trick as the undithered
path (core/refine.py), so candidate palettes are never materialized.

Scope: red-mean distance only (BASELINE config 3). The perceptual+dither
combination keeps the XLA scan (CIEDE2000 inside the dependent loop).
Distances are f32 (the reference's f64 strict-< ties can flip on exact
equality; the dither path is tolerance-validated against the serial C++
oracle). vmap does NOT compose with this kernel — batched multi-image
callers use the XLA fallback (parallel/batch.py `_no_pallas_under_vmap`).

Reference semantics implemented: src/lib.rs:425-501 (scan order, 0.8
damping, FS weights, transparent error pass-through, clamp+round target,
strict-less-than nearest entry).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from snesimage_tpu.constants import DITHER_DAMPING, DITHER_WEIGHTS

_CHUNK = 32


@functools.lru_cache(maxsize=None)
def _make_kernel(img_w: int, s_entries: int, c_subpals: int, b_cands: int):
    wgt = np.asarray(DITHER_WEIGHTS, dtype=np.float32) * np.float32(DITHER_DAMPING)
    s = s_entries
    b = b_cands

    def kernel(i_ref, ent_ref, cand_ref, orig_ref, tp_ref, aff_ref, alpha_ref,
               xof_ref, out_ref, err_ref):
        w_chunk = pl.program_id(0)
        h = orig_ref.shape[2]
        i_entry = i_ref[0]
        cand_r = cand_ref[0]  # (B, H)
        cand_g = cand_ref[1]
        cand_b = cand_ref[2]

        @pl.when(w_chunk == 0)
        def _():
            err_ref[...] = jnp.zeros_like(err_ref)

        def redmean(tr, tg, tb, er, eg, eb):
            """512 * red-mean^2 on (B, H) channel planes."""
            dr = tr - er
            dg = tg - eg
            db = tb - eb
            rsum = tr + er
            return (
                (1024.0 + rsum) * dr * dr
                + 2048.0 * dg * dg
                + (1534.0 - rsum) * db * db
            )

        def step(k, err_win):
            # err_win: tuple of 9 (B, H) planes, [col*3 + channel].
            orig = orig_ref[k]  # (3, H)
            tp_row = tp_ref[k][None, :]  # (1, H) int32
            aff = aff_ref[k][None, :] > 0  # (1, H)
            opaque = alpha_ref[k][None, :] > 0
            x1 = xof_ref[k][None, :]
            valid = x1 >= 0

            # Per-pixel subpalette entry colors for this column, from the
            # tiny entry table: 3*S rows of (1, H).
            sub_rows = []
            for e_row in range(3 * s):
                acc = jnp.zeros((1, h), jnp.float32)
                for c in range(c_subpals):
                    acc = acc + jnp.where(tp_row == c, ent_ref[c, e_row], 0.0)
                sub_rows.append(acc)

            # unrounded targets (used for the diffused error) and their
            # clamp+round-half-away u8 forms (used for distances),
            # reference src/lib.rs:441-451, 773-778; (B, H) planes
            t0_r = orig[0][None, :] + err_win[0]
            t0_g = orig[1][None, :] + err_win[1]
            t0_b = orig[2][None, :] + err_win[2]
            tr = jnp.floor(jnp.clip(t0_r, 0.0, 255.0) + 0.5)
            tg = jnp.floor(jnp.clip(t0_g, 0.0, 255.0) + 0.5)
            tb = jnp.floor(jnp.clip(t0_b, 0.0, 255.0) + 0.5)

            best_d = None
            best_i = jnp.zeros((b, h), jnp.int32)
            nc_r = jnp.zeros((b, h), jnp.float32)
            nc_g = jnp.zeros((b, h), jnp.float32)
            nc_b = jnp.zeros((b, h), jnp.float32)
            for s_idx in range(s):
                er, eg, eb = sub_rows[s_idx], sub_rows[s + s_idx], sub_rows[2 * s + s_idx]
                # candidate override at the slot entry, affected pixels only
                is_slot = s_idx == i_entry  # traced bool scalar
                ovr = jnp.logical_and(is_slot, aff)  # (1, H)
                e_r = jnp.where(ovr, cand_r, er)  # (B, H)
                e_g = jnp.where(ovr, cand_g, eg)
                e_b = jnp.where(ovr, cand_b, eb)
                d_s = redmean(tr, tg, tb, e_r, e_g, e_b)
                if best_d is None:
                    best_d = d_s
                    nc_r = jnp.broadcast_to(e_r, (b, h))
                    nc_g = jnp.broadcast_to(e_g, (b, h))
                    nc_b = jnp.broadcast_to(e_b, (b, h))
                else:
                    upd = d_s < best_d  # strict <: first index wins ties
                    best_d = jnp.where(upd, d_s, best_d)
                    best_i = jnp.where(upd, s_idx, best_i)
                    nc_r = jnp.where(upd, e_r, nc_r)
                    nc_g = jnp.where(upd, e_g, nc_g)
                    nc_b = jnp.where(upd, e_b, nc_b)

            live = opaque & valid  # (1, H)
            pe_r = jnp.where(live, t0_r - nc_r, err_win[0])
            pe_g = jnp.where(live, t0_g - nc_g, err_win[1])
            pe_b = jnp.where(live, t0_b - nc_b, err_win[2])
            pe_r = jnp.where(valid, pe_r, 0.0)
            pe_g = jnp.where(valid, pe_g, 0.0)
            pe_b = jnp.where(valid, pe_b, 0.0)

            m_e = (valid & (x1 + 1 < img_w)).astype(jnp.float32)
            m_sw = ((x1 > 0) & valid).astype(jnp.float32)
            m_s = valid.astype(jnp.float32)

            def down(a):  # shift along H (image rows): lanes
                return jnp.concatenate(
                    [jnp.zeros((b, 1), jnp.float32), a[:, :-1]], axis=1
                )

            def diffused(pe):
                a1 = pe * wgt[0] * m_e + down(pe * wgt[1] * m_sw)
                a2 = down(pe * wgt[2] * m_s)
                a3 = down(pe * wgt[3] * m_e)
                return a1, a2, a3

            a1r, a2r, a3r = diffused(pe_r)
            a1g, a2g, a3g = diffused(pe_g)
            a1b, a2b, a3b = diffused(pe_b)

            out_ref[k] = jnp.where(live, best_i, 0)
            return (
                err_win[3] + a1r, err_win[4] + a1g, err_win[5] + a1b,
                err_win[6] + a2r, err_win[7] + a2g, err_win[8] + a2b,
                a3r, a3g, a3b,
            )

        err0 = tuple(err_ref[j] for j in range(9))
        err = jax.lax.fori_loop(0, orig_ref.shape[0], step, err0)
        for j in range(9):
            err_ref[j] = err[j]

    return kernel


@functools.partial(jax.jit, static_argnames=("img_w", "interpret"))
def dither_remap_candidates(
    orig_sk: jax.Array,  # (WSp, 3, H) f32, skewed + padded to CHUNK
    entries: jax.Array,  # (C, 3*S) f32 entry colors, channel-major rows
    tp_sk: jax.Array,  # (WSp, H) i32 subpalette id per pixel
    aff_sk: jax.Array,  # (WSp, H) i32
    alpha_sk: jax.Array,  # (WSp, H) i32
    xof_sk: jax.Array,  # (WSp, H) i32
    cand8: jax.Array,  # (B, 3) f32 (8-bit expanded candidate colors)
    i_entry: jax.Array,  # () or (1,) i32
    *,
    img_w: int,
    interpret: bool = False,
) -> jax.Array:
    """Full dithered remap for B candidate colors of one palette slot,
    all candidates advancing through the wavefront together.

    Returns (B, WSp, H) int32 palette-map columns in skewed layout.
    """
    wsp, _, h = orig_sk.shape
    c_subpals, s3 = entries.shape
    assert wsp % _CHUNK == 0, wsp
    assert s3 % 3 == 0
    nchunk = wsp // _CHUNK
    b = cand8.shape[0]

    # Candidate colors pre-broadcast along H: (3, B, H).
    cand_cols = jnp.broadcast_to(
        cand8.astype(jnp.float32).T[:, :, None], (3, b, h)
    )

    def shared(blk):
        ndim = len(blk)
        return pl.BlockSpec(
            blk,
            lambda wi: (wi,) + (0,) * (ndim - 1),
            memory_space=pltpu.VMEM,
        )

    out = pl.pallas_call(
        _make_kernel(img_w, s3 // 3, c_subpals, b),
        grid=(nchunk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # entry table: scalar reads
            pl.BlockSpec((3, b, h), lambda wi: (0, 0, 0), memory_space=pltpu.VMEM),
            shared((_CHUNK, 3, h)),
            shared((_CHUNK, h)),
            shared((_CHUNK, h)),
            shared((_CHUNK, h)),
            shared((_CHUNK, h)),
        ],
        out_specs=pl.BlockSpec(
            (_CHUNK, b, h), lambda wi: (wi, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((wsp, b, h), jnp.int32),
        scratch_shapes=[pltpu.VMEM((9, b, h), jnp.float32)],
        interpret=interpret,
    )(
        jnp.atleast_1d(jnp.asarray(i_entry, dtype=jnp.int32)),
        entries.astype(jnp.float32),
        cand_cols,
        orig_sk.astype(jnp.float32),
        tp_sk.astype(jnp.int32),
        aff_sk.astype(jnp.int32),
        alpha_sk.astype(jnp.int32),
        xof_sk.astype(jnp.int32),
    )
    return jnp.moveaxis(out, 0, 1)  # (B, WSp, H)
