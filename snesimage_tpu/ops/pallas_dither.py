"""Pallas TPU kernel for the Floyd-Steinberg wavefront scan.

The XLA `lax.scan` formulation of ops/dither.py is correct but pays the
XLA while-loop per-iteration overhead — measured ~44 us/iteration on v5e
even for a one-op dependent carry, i.e. ~34 ms per 766-column wavefront
and ~270 ms per 65-candidate slot visit. This kernel runs the entire scan
inside one Mosaic program with the error window carried in VMEM, reducing
per-column cost to the actual dependent compute.

Layout: everything is (columns, X, H) with the image row axis H on the
128-wide LANE dimension. A naive (CHUNK, H, S, 3) layout tile-pads
(S, 3) -> (16, 128) and inflates VMEM 42x past its capacity.

Structure:
  grid = (B, WS/CHUNK)        # candidates x column chunks, chunk-fastest
  inputs per chunk (shared across candidates, streamed HBM->VMEM):
    orig_sk  (CHUNK, 3, H) f32     skewed source columns
    tp_sk    (CHUNK, H) i32        subpalette id per pixel; the kernel
                                   rebuilds each pixel's subpalette rows
                                   from the tiny (C, 3*S) entry table with
                                   C static selects (materializing the
                                   (WS, H, S, 3) gather in HBM dominated
                                   everything else)
    aff_sk   (CHUNK, H) i32        1 where the pixel's tile uses palette p
    alpha_sk (CHUNK, H) i32        opacity
    xof_sk   (CHUNK, H) i32        source x (-1 outside the skewed region)
  SMEM: cand8 (B, 3) f32 candidate colors and the slot entry index.
  carry: the (9, H) error window for columns c..c+2, persisted across
  chunks in VMEM scratch (the grid iterates candidate-major, so chunks of
  one candidate run consecutively and the window resets at chunk 0).

vmap does NOT compose with this kernel (shared operands broadcast
pathologically, >10 min compiles) — the candidate batch is an explicit
grid dimension, and batched multi-image callers must use the XLA fallback
(see parallel/batch.py `_no_pallas_under_vmap`).

Candidate semantics: distances go to the shared current-palette entries,
with entry ``i``'s row replaced by the distance to the candidate color for
affected pixels — the same incremental trick as the undithered path
(core/refine.py), so candidate palettes are never materialized.

Scope: red-mean distance only (BASELINE config 3). The perceptual+dither
combination keeps the XLA scan (CIEDE2000 inside the dependent loop).
Distances here are f32 (the reference's f64 strict-< ties can flip on
exact equality; the dither path is already tolerance-validated against
the serial C++ oracle).

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

_CHUNK = 64


@functools.lru_cache(maxsize=None)
def _make_kernel(img_w: int, s_entries: int, c_subpals: int):
    wgt = np.asarray(DITHER_WEIGHTS, dtype=np.float32) * np.float32(DITHER_DAMPING)
    s = s_entries

    def kernel(i_ref, cand_ref, ent_ref, orig_ref, tp_ref, aff_ref, alpha_ref,
               xof_ref, out_ref, err_ref):
        bi = pl.program_id(0)
        w_chunk = pl.program_id(1)
        h = orig_ref.shape[2]
        i_entry = i_ref[0]
        cr = cand_ref[bi, 0]
        cg = cand_ref[bi, 1]
        cb = cand_ref[bi, 2]

        @pl.when(w_chunk == 0)
        def _():
            err_ref[...] = jnp.zeros_like(err_ref)

        row_ids = jax.lax.broadcasted_iota(jnp.int32, (s, h), 0)  # entry idx

        def redmean_rows(tr, tg, tb, er, eg, eb):
            """(1|S, H) channel rows -> 512*red-mean^2 (S, H)."""
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
            orig = orig_ref[k]  # (3, H)
            # Rebuild each pixel's subpalette rows from the tiny entry
            # table with C static selects — materializing a
            # (WS, H, S, 3) gather in HBM dominated everything else.
            tp_row = tp_ref[k][None, :]  # (1, H) int32
            sub = jnp.zeros((3 * s, h), jnp.float32)
            for c in range(c_subpals):
                m = (tp_row == c).astype(jnp.float32)  # (1, H)
                sub = sub + ent_ref[c][:, None] * m  # (3S, 1) * (1, H)
            aff = aff_ref[k][None, :] > 0  # (1, H)
            opaque = alpha_ref[k][None, :] > 0
            x1 = xof_ref[k][None, :]  # (1, H)
            valid = x1 >= 0

            target = orig + err_win[0:3]  # (3, H)
            t_u8 = jnp.floor(jnp.clip(target, 0.0, 255.0) + 0.5)
            tr, tg, tb = t_u8[0:1], t_u8[1:2], t_u8[2:3]  # (1, H)

            sub_r = sub[0:s]
            sub_g = sub[s : 2 * s]
            sub_b = sub[2 * s : 3 * s]
            d = redmean_rows(tr, tg, tb, sub_r, sub_g, sub_b)  # (S, H)
            d_c = redmean_rows(tr, tg, tb, cr, cg, cb)  # (1, H)
            d = jnp.where(aff & (row_ids == i_entry), d_c, d)

            idx = jnp.argmin(d, axis=0)[None, :].astype(jnp.int32)  # (1, H)
            onehot = (row_ids == idx).astype(jnp.float32)  # (S, H)
            nc_r = jnp.sum(sub_r * onehot, axis=0, keepdims=True)
            nc_g = jnp.sum(sub_g * onehot, axis=0, keepdims=True)
            nc_b = jnp.sum(sub_b * onehot, axis=0, keepdims=True)
            new_color = jnp.concatenate([nc_r, nc_g, nc_b], axis=0)  # (3, H)
            use_cand = aff & (idx == i_entry)  # (1, H)
            cand_col = jnp.concatenate(
                [jnp.full((1, h), c, jnp.float32) for c in (cr, cg, cb)], axis=0
            )
            new_color = jnp.where(use_cand, cand_col, new_color)

            perr = jnp.where(opaque & valid, target - new_color, err_win[0:3])
            perr = jnp.where(valid, perr, 0.0)

            m_e = valid & (x1 + 1 < img_w)  # (1, H)
            m_sw = (x1 > 0) & valid
            m_s = valid

            def down(a):  # shift along H (rows of the image): lanes
                return jnp.concatenate(
                    [jnp.zeros((3, 1), jnp.float32), a[:, :-1]], axis=1
                )

            add1 = perr * wgt[0] * m_e + down(perr * wgt[1] * m_sw)
            add2 = down(perr * wgt[2] * m_s)
            add3 = down(perr * wgt[3] * m_e)

            new_win = jnp.concatenate(
                [err_win[3:6] + add1, err_win[6:9] + add2, add3], axis=0
            )
            out_ref[0, k] = jnp.where(opaque & valid, idx, 0)[0]
            return new_win

        err = jax.lax.fori_loop(0, orig_ref.shape[0], step, err_ref[...])
        err_ref[...] = err

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
    """Full dithered remap for B candidate colors of one palette slot.

    Returns (B, WSp, H) int32 palette-map columns in skewed layout.
    """
    wsp, _, h = orig_sk.shape
    c_subpals, s3 = entries.shape
    assert wsp % _CHUNK == 0, wsp
    assert s3 % 3 == 0
    nchunk = wsp // _CHUNK
    b = cand8.shape[0]

    def shared(blk):
        ndim = len(blk)
        return pl.BlockSpec(
            blk,
            lambda bi, wi: (wi,) + (0,) * (ndim - 1),
            memory_space=pltpu.VMEM,
        )

    return pl.pallas_call(
        _make_kernel(img_w, s3 // 3, c_subpals),
        grid=(b, nchunk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (c_subpals, s3), lambda bi, wi: (0, 0), memory_space=pltpu.VMEM
            ),
            shared((_CHUNK, 3, h)),
            shared((_CHUNK, h)),
            shared((_CHUNK, h)),
            shared((_CHUNK, h)),
            shared((_CHUNK, h)),
        ],
        out_specs=pl.BlockSpec(
            (1, _CHUNK, h), lambda bi, wi: (bi, wi, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, wsp, h), jnp.int32),
        scratch_shapes=[pltpu.VMEM((9, h), jnp.float32)],
        interpret=interpret,
    )(
        jnp.atleast_1d(jnp.asarray(i_entry, dtype=jnp.int32)),
        cand8.astype(jnp.float32),
        entries.astype(jnp.float32),
        orig_sk.astype(jnp.float32),
        tp_sk.astype(jnp.int32),
        aff_sk.astype(jnp.int32),
        alpha_sk.astype(jnp.int32),
        xof_sk.astype(jnp.int32),
    )
