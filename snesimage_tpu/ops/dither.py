"""Floyd-Steinberg error-diffusion remap as a wavefront scan.

The reference's `optimize` (src/lib.rs:425-501) is a serial raster scan:
each pixel adds its accumulated error to the original color, picks the
nearest subpalette entry, and diffuses ``0.8 * [7,3,5,1]/16`` of the
quantization error to its E, SW, S, SE neighbors. Transparent pixels pass
their accumulated error through unchanged (src/lib.rs:463-475).

A raster scan is hostile to a vector machine, but the dependency structure
is not: pixel (x, y) only depends on (x-1, y), (x+1, y-1), (x, y-1) and
(x-1, y-1). Under the skewed coordinate ``c = x + 2*y`` every dependency
has a strictly smaller ``c``, so all pixels on an anti-diagonal ``c`` are
independent and can be processed as one vector step. A 256x256 image needs
``W + 2H - 2 = 766`` sequential steps of 256-lane vector work instead of
65,536 scalar steps — and the whole scan is `vmap`-able over a batch of
candidate palettes.

Float note: the reference accumulates error in f64 with a fixed scalar
order; we use f32 and combine the E/SW contributions in one vectorized add,
so results can differ in the last ulp of the diffused error. The dither-off
path (weights all zero) is exactly the parallel remap in ops/remap.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from snesimage_tpu.constants import DITHER_DAMPING, DITHER_WEIGHTS
from snesimage_tpu.ops.color import expand_5bit_to_8bit
from snesimage_tpu.ops.remap import entry_distances, quantize_target_u8


def _skew_indices(h: int, w: int) -> tuple[jax.Array, jax.Array]:
    y = jnp.arange(h, dtype=jnp.int32)[:, None]
    x = jnp.arange(w, dtype=jnp.int32)[None, :]
    return jnp.broadcast_to(y, (h, w)), x + 2 * y


def skew(img: jax.Array, fill=0) -> jax.Array:
    """(H, W, ...) -> (H, W + 2H - 2, ...) with A[y, x + 2y] = img[y, x]."""
    h, w = img.shape[:2]
    ws = w + 2 * (h - 1)
    yy, cc = _skew_indices(h, w)
    out = jnp.full((h, ws) + img.shape[2:], fill, dtype=img.dtype)
    return out.at[yy, cc].set(img)


def unskew(skewed: jax.Array, h: int, w: int) -> jax.Array:
    yy, cc = _skew_indices(h, w)
    return skewed[yy, cc]


@partial(jax.jit, static_argnames=("perceptual",))
def remap_dithered(
    original_rgb: jax.Array,
    alpha: jax.Array,
    tile_palettes: jax.Array,
    palette5: jax.Array,
    perceptual: bool,
) -> jax.Array:
    """Dithered nearest-entry remap; returns palette_map (H, W) int32.

    Bit-compatible (up to f32-vs-f64 error accumulation) with the
    reference's serial scan; validated against the serial oracle in tests.
    """
    h, w, _ = original_rgb.shape
    ws = w + 2 * (h - 1)

    entries8 = expand_5bit_to_8bit(palette5)  # (C, S, 3)
    tp_pix = jnp.repeat(jnp.repeat(tile_palettes, 8, axis=0), 8, axis=1)

    orig_sk = skew(original_rgb.astype(jnp.float32))  # (H, WS, 3)
    alpha_sk = skew(alpha.astype(jnp.int32))
    tp_sk = skew(tp_pix.astype(jnp.int32))
    x_of = skew(
        jnp.broadcast_to(jnp.arange(w, dtype=jnp.int32)[None, :], (h, w)), fill=-1
    )  # source x per skewed cell, -1 outside

    wgt = jnp.asarray(DITHER_WEIGHTS) * DITHER_DAMPING

    def step(c, state):
        err, pmap = state
        x_col = jax.lax.dynamic_slice_in_dim(x_of, c, 1, axis=1)[:, 0]  # (H,)
        valid = x_col >= 0
        orig_col = jax.lax.dynamic_slice_in_dim(orig_sk, c, 1, axis=1)[:, 0]
        alpha_col = jax.lax.dynamic_slice_in_dim(alpha_sk, c, 1, axis=1)[:, 0]
        tp_col = jax.lax.dynamic_slice_in_dim(tp_sk, c, 1, axis=1)[:, 0]
        err_col = jax.lax.dynamic_slice_in_dim(err, c, 1, axis=1)[:, 0]  # (H, 3)

        target = orig_col + err_col
        t_u8 = quantize_target_u8(target)
        sub = entries8[tp_col]  # (H, S, 3)
        d = entry_distances(t_u8, sub, perceptual)
        idx = jnp.argmin(d, axis=-1).astype(jnp.int32)
        new_color = jnp.take_along_axis(sub, idx[:, None, None], axis=-2)[..., 0, :]

        opaque = alpha_col > 0
        perr = jnp.where(
            (opaque & valid)[:, None],
            target - new_color.astype(jnp.float32),
            err_col,
        )
        perr = jnp.where(valid[:, None], perr, 0.0)

        m_e = ((x_col + 1 < w) & valid)[:, None].astype(jnp.float32)
        m_sw = ((x_col > 0) & valid)[:, None].astype(jnp.float32)
        m_s = valid[:, None].astype(jnp.float32)
        m_se = m_e

        def down(a):  # contribution from row y lands on row y+1
            return jnp.concatenate([jnp.zeros_like(a[:1]), a[:-1]], axis=0)

        add1 = perr * wgt[0] * m_e + down(perr * wgt[1] * m_sw)
        add2 = down(perr * wgt[2] * m_s)
        add3 = down(perr * wgt[3] * m_se)

        # err has 3 columns of padding at the end so c+3 is always in range.
        upd = jnp.stack([add1, add2, add3], axis=1)  # (H, 3cols, 3)
        err_slice = jax.lax.dynamic_slice(err, (0, c + 1, 0), (h, 3, 3))
        err = jax.lax.dynamic_update_slice(err, err_slice + upd, (0, c + 1, 0))

        col_val = jnp.where(opaque & valid, idx, 0)
        pmap = jax.lax.dynamic_update_slice(pmap, col_val[:, None], (0, c))
        return err, pmap

    err0 = jnp.zeros((h, ws + 3, 3), dtype=jnp.float32)
    pmap0 = jnp.zeros((h, ws), dtype=jnp.int32)
    _, pmap = jax.lax.fori_loop(0, ws, step, (err0, pmap0))
    return unskew(pmap, h, w)
