"""Fused Pallas TPU kernels for the SSIMULACRA2 feature pipeline.

The XLA path of ops/ssimulacra2.py materializes ~10 HBM buffers per scale
per candidate (products, blur temporaries, feature maps). The multi-scale
kernel here fuses, per candidate and entirely in VMEM:

    linear RGB -> positive XYB (exp/log cube roots)
    -> banded-matmul Gaussian blur on the MXU (the same matrices the XLA
       path uses; the sub-128 coarse planes would waste most of each
       (8, 128) vreg on a VPU FIR)
    -> SSIM map + asymmetric edge-difference maps
    -> spatial sums of d and d^4, with in-VMEM 2x2 downsampling between
       consecutive pyramid scales

emitting 18 raw moments per scale. Reference-side blocks use constant
index maps so Mosaic keeps them VMEM-resident across the candidate grid.
This is the refine loop's hot metric path (ops/ssimulacra2.py
fused_scale_feature_block); off-TPU and image-batched callers use the
identical-semantics XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from snesimage_tpu.ops.ssimulacra2_consts import SSIM_C2


def _feature_sums(x1, m1, v1, x2, blur_fn) -> list:
    """The six raw moments of one (channel, scale) feature map pair:
    [sum(ssim_d), sum(art), sum(det), sum(ssim_d^4), sum(art^4),
    sum(det^4)] — the fused form of ops/ssimulacra2.py _scale_features."""
    mu2 = blur_fn(x2)
    s22 = blur_fn(x2 * x2)
    s12 = blur_fn(x1 * x2)

    mu_diff = m1 - mu2
    num_m = 1.0 - mu_diff * mu_diff
    num_s = 2.0 * (s12 - m1 * mu2) + SSIM_C2
    denom_s = (v1 - m1 * m1) + (s22 - mu2 * mu2) + SSIM_C2
    ssim_d = jnp.maximum(1.0 - (num_m * num_s) / denom_s, 0.0)

    d1 = (1.0 + jnp.abs(x2 - mu2)) / (1.0 + jnp.abs(x1 - m1)) - 1.0
    art = jnp.maximum(d1, 0.0)
    det = jnp.maximum(-d1, 0.0)

    ssim4 = ssim_d * ssim_d
    ssim4 = ssim4 * ssim4
    art4 = art * art
    art4 = art4 * art4
    det4 = det * det
    det4 = det4 * det4

    return [
        jnp.sum(ssim_d),
        jnp.sum(art),
        jnp.sum(det),
        jnp.sum(ssim4),
        jnp.sum(art4),
        jnp.sum(det4),
    ]


# ---------------------------------------------------------------------------
# Multi-scale fused variant: per candidate, ONE program converts the linear
# RGB frame to positive XYB, computes the feature maps of several
# consecutive pyramid scales (downsampling in VMEM between scales), and
# emits only the raw moment sums. This is the refine loop's hot metric
# path: HBM traffic per candidate drops from ~10 materialized maps per
# scale to one frame read + 18 scalars (the shared reference-side blocks
# use constant index maps so Mosaic keeps them VMEM-resident across the
# candidate grid).
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _pool2_matrix(w: int) -> np.ndarray:
    """(w, w//2) block-diagonal 0/1 matrix: x @ P sums lane pairs."""
    p = np.zeros((w, w // 2), dtype=np.float32)
    p[np.arange(w), np.arange(w) // 2] = 1.0
    return p


def _cbrt(v: jax.Array) -> jax.Array:
    """Sign-symmetric cube root via exp/log (Mosaic has no cbrt primitive).
    Matches jnp.cbrt to ~1e-6 relative; exact 0 maps to ~1e-10."""
    s = jnp.where(v < 0, -1.0, 1.0)
    a = jnp.abs(v)
    return s * jnp.exp(jnp.log(jnp.maximum(a, 1e-30)) * (1.0 / 3.0))


def _opsin_xyb(r: jax.Array, g: jax.Array, b: jax.Array):
    """Channel-plane form of ops/ssimulacra2.py linear_rgb_to_positive_xyb."""
    from snesimage_tpu.ops.ssimulacra2_consts import (
        OPSIN_BIAS,
        OPSIN_MATRIX,
        XYB_B_OFFSET,
        XYB_X_OFFSET,
        XYB_X_SCALE,
        XYB_Y_OFFSET,
    )

    m = np.asarray(OPSIN_MATRIX, dtype=np.float32)
    bias = np.float32(OPSIN_BIAS)
    cbrt_bias = np.float32(np.cbrt(OPSIN_BIAS))
    lms = [
        _cbrt(m[i, 0] * r + m[i, 1] * g + m[i, 2] * b + bias) - cbrt_bias
        for i in range(3)
    ]
    xr = 0.5 * (lms[0] - lms[1])
    yr = 0.5 * (lms[0] + lms[1])
    return (
        xr * np.float32(XYB_X_SCALE) + np.float32(XYB_X_OFFSET),
        yr + np.float32(XYB_Y_OFFSET),
        (lms[2] - yr) + np.float32(XYB_B_OFFSET),
    )


def _ds2(x: jax.Array, pw: jax.Array) -> jax.Array:
    """2x2 box mean for even-sized planes: sublane reshape-sum for rows,
    one small MXU matmul for lanes (same scheme as ops/pallas_prescreen)."""
    h, w = x.shape
    hs = x.reshape(h // 2, 2, w).sum(axis=1)
    return (
        jnp.dot(
            hs,
            pw,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        * 0.25
    )


def multiscale_feature_sums(
    ref_scales: tuple,
    frames: jax.Array,
    *,
    pre_ds: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """Raw feature sums of several consecutive pyramid scales, fused.

    ref_scales: tuple over scales of (img1, mu1, s11) triples, each
        channel-major (3, h_s, w_s) f32 in positive-XYB space, where
        (h_0, w_0) == frames' dims after `pre_ds` 2x2-mean downsamplings
        and every following scale is exactly the next downsample size
        (even sizes only).
    frames: (B, 3, H, W) f32 candidate frames in LINEAR RGB (the XYB
        conversion runs in-kernel per scale, like the XLA path).
    pre_ds: number of in-kernel 2x2 downsamplings applied to the frame
        BEFORE the block's first scale — lets the rank stage score
        full-resolution frames at scale 1 without an XLA-side
        materialized half-resolution copy.

    Does NOT compose with jax.vmap — image-batched callers never reach
    this function (ops/ssimulacra2.py fused_scale_feature_block detects
    batch tracers and takes the XLA feature path).

    Returns (B, n_scales, 3, 6) raw sums in _feature_sums order; divide by
    h_s*w_s and fourth-root outside.
    """
    from snesimage_tpu.ops.ssimulacra2 import _blur_matrix

    n = len(ref_scales)
    b, _, h, w = frames.shape
    rows = n * 3
    r_pad = -(-rows // 8) * 8
    pre_widths = [w >> d for d in range(pre_ds)]
    pools = [jnp.asarray(_pool2_matrix(pw)) for pw in pre_widths] + [
        jnp.asarray(_pool2_matrix(ref_scales[si][0].shape[-1]))
        for si in range(n - 1)
    ]
    flat_refs = [a for triple in ref_scales for a in triple]
    # One banded blur matrix per distinct plane edge length (the same
    # matrices the XLA path multiplies with, ops/ssimulacra2.py blur):
    # in-kernel the blur runs as two MXU matmuls per field instead of the
    # VPU shift-add FIR — on the sub-128 planes of the coarse scales the
    # FIR wastes most of each (8, 128) vreg, measured ~2.4x off roofline.
    blur_sizes: list[int] = []
    for si in range(n):
        for edge in ref_scales[si][0].shape[-2:]:
            if edge not in blur_sizes:
                blur_sizes.append(edge)
    blur_mats = [jnp.asarray(_blur_matrix(sz)) for sz in blur_sizes]

    def kernel(*args):
        fr_ref = args[0]
        refs = args[1 : 1 + 3 * n]
        n_pools = pre_ds + n - 1
        pool_refs = args[1 + 3 * n : 1 + 3 * n + n_pools]
        blur_refs = args[1 + 3 * n + n_pools : -1]
        out_ref = args[-1]
        r, g, bb = fr_ref[0, 0], fr_ref[0, 1], fr_ref[0, 2]
        for d in range(pre_ds):
            pw = pool_refs[d][:]
            r, g, bb = _ds2(r, pw), _ds2(g, pw), _ds2(bb, pw)
        row = jax.lax.broadcasted_iota(jnp.int32, (r_pad, 128), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (r_pad, 128), 1)
        tile = jnp.zeros((r_pad, 128), dtype=jnp.float32)
        for si in range(n):
            if si:
                pw = pool_refs[pre_ds + si - 1][:]
                r, g, bb = _ds2(r, pw), _ds2(g, pw), _ds2(bb, pw)
            hs, ws = ref_scales[si][0].shape[-2:]
            brow = blur_refs[blur_sizes.index(hs)][:]
            bcol = blur_refs[blur_sizes.index(ws)][:]

            def blur_fn(t, brow=brow, bcol=bcol):
                # Banded matrices are symmetric, so t @ bcol == t @ bcol.T.
                tmp = jnp.dot(
                    brow,
                    t,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                return jnp.dot(
                    tmp,
                    bcol,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )

            xyb = _opsin_xyb(r, g, bb)
            for c in range(3):
                sums = _feature_sums(
                    refs[3 * si][c],
                    refs[3 * si + 1][c],
                    refs[3 * si + 2][c],
                    xyb[c],
                    blur_fn,
                )
                ri = si * 3 + c
                for k, v in enumerate(sums):
                    tile = tile + jnp.where((row == ri) & (col == k), v, 0.0)
        out_ref[0] = tile

    in_specs = [
        pl.BlockSpec(
            (1, 3, h, w), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        )
    ]
    for si in range(n):
        hs, ws = ref_scales[si][0].shape[-2:]
        spec = pl.BlockSpec(
            (3, hs, ws), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
        )
        in_specs += [spec, spec, spec]
    for pool in pools:
        pshape = pool.shape
        in_specs.append(
            pl.BlockSpec(pshape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
    for sz in blur_sizes:
        in_specs.append(
            pl.BlockSpec((sz, sz), lambda i: (0, 0), memory_space=pltpu.VMEM)
        )

    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, r_pad, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, r_pad, 128), jnp.float32),
        interpret=interpret,
    )(frames, *flat_refs, *pools, *blur_mats)
    return out[:, :rows, :6].reshape(b, n, 3, 6)
