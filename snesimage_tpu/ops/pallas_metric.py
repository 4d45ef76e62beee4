"""Fused Pallas TPU kernel for the SSIMULACRA2 per-scale features.

The XLA path of ops/ssimulacra2.py materializes ~10 HBM buffers per scale
per candidate (products, blur temporaries, feature maps) and runs the
Gaussian blur as dense banded matmuls. This kernel fuses, per (channel)
grid step and entirely in VMEM:

    products (img2^2, img1*img2)
    -> separable radius-8 FIR Gaussian (shift-and-add on the VPU)
    -> SSIM map + asymmetric edge-difference maps
    -> spatial sums of d and d^4

emitting just 6 raw moments per channel. HBM traffic drops from ~10 maps
to 4 reads + 6 scalars. The kernel is written unbatched with grid=(C,);
`jax.vmap` over the candidate axis adds the batch grid dimension, with the
reference-side inputs shared (in_axes=None), which is exactly how the
refine loop scores 65+ candidate frames per slot.

Used for pyramid scales with width >= 128 (the lane width); smaller scales
carry <6% of the pixels and stay on the XLA path. Numerics: plain f32 VPU
adds — no bf16 matmul passes involved, so precision is at least the XLA
path's einsum(precision="highest").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from snesimage_tpu.ops.ssimulacra2_consts import GAUSSIAN_SIGMA, SSIM_C2

_RADIUS = 8


def _taps() -> np.ndarray:
    x = np.arange(-_RADIUS, _RADIUS + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / GAUSSIAN_SIGMA) ** 2)
    return (k / k.sum()).astype(np.float32)


def _shift_rows(x: jax.Array, k: int) -> jax.Array:
    """x shifted along axis 0 by k with zero fill (k>0: contents move down)."""
    h = x.shape[0]
    if k == 0:
        return x
    if k > 0:
        return jnp.pad(x, ((k, 0), (0, 0)))[:h, :]
    return jnp.pad(x, ((0, -k), (0, 0)))[-k:, :]


def _shift_cols(x: jax.Array, k: int) -> jax.Array:
    w = x.shape[1]
    if k == 0:
        return x
    if k > 0:
        return jnp.pad(x, ((0, 0), (k, 0)))[:, :w]
    return jnp.pad(x, ((0, 0), (0, -k)))[:, -k:]


def _blur2d(x: jax.Array, taps: np.ndarray) -> jax.Array:
    """Separable radius-8 Gaussian with zero padding, as VPU shift-adds.

    Same math as ops/ssimulacra2.py `_blur_matrix` (banded matmul), ~15x
    fewer MACs than the dense form and no MXU precision caveats."""
    acc = taps[_RADIUS] * x
    for k in range(1, _RADIUS + 1):
        acc = acc + taps[_RADIUS + k] * _shift_cols(x, -k)
        acc = acc + taps[_RADIUS - k] * _shift_cols(x, k)
    out = taps[_RADIUS] * acc
    for k in range(1, _RADIUS + 1):
        out = out + taps[_RADIUS + k] * _shift_rows(acc, -k)
        out = out + taps[_RADIUS - k] * _shift_rows(acc, k)
    return out


def _features_kernel(img1_ref, mu1_ref, s11_ref, img2_ref, out_ref):
    """One channel: inputs (1, H, W) VMEM blocks -> 6 raw moments."""
    _features_core(img1_ref[0], mu1_ref[0], s11_ref[0], img2_ref[0], out_ref, (0,))


def _features_core(x1, m1, v1, x2, out_ref, out_idx):
    taps = _taps()
    mu2 = _blur2d(x2, taps)
    s22 = _blur2d(x2 * x2, taps)
    s12 = _blur2d(x1 * x2, taps)

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

    # Scalar stores to VMEM are not supported: assemble the six sums into
    # the (8, 128) output tile with masked broadcasts and store it whole.
    sums = [
        jnp.sum(ssim_d),
        jnp.sum(art),
        jnp.sum(det),
        jnp.sum(ssim4),
        jnp.sum(art4),
        jnp.sum(det4),
    ]
    row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    tile = jnp.zeros((8, 128), dtype=jnp.float32)
    for k, v in enumerate(sums):
        tile = tile + jnp.where((row == 0) & (col == k), v, 0.0)
    out_ref[out_idx] = tile


@functools.partial(jax.jit, static_argnames=("interpret",))
def scale_feature_sums(
    img1: jax.Array,
    mu1: jax.Array,
    s11: jax.Array,
    img2: jax.Array,
    *,
    interpret: bool = False,
) -> jax.Array:
    """Raw feature sums for one pyramid scale, fused in VMEM.

    Args are channel-major (C, H, W) f32. Returns (C, 6) raw sums
    [sum(ssim_d), sum(art), sum(det), sum(ssim_d^4), sum(art^4),
    sum(det^4)]; divide by H*W and root outside.
    """
    c, h, w = img1.shape
    block = pl.BlockSpec((1, h, w), lambda ci: (ci, 0, 0), memory_space=pltpu.VMEM)
    # Output padded to one (8, 128) f32 tile per channel (TPU block
    # tiling requires sublane/lane-aligned blocks); callers get (C, 6).
    out = pl.pallas_call(
        _features_kernel,
        grid=(c,),
        in_specs=[block, block, block, block],
        out_specs=pl.BlockSpec(
            (1, 8, 128), lambda ci: (ci, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((c, 8, 128), jnp.float32),
        interpret=interpret,
    )(img1, mu1, s11, img2)
    return out[..., 0, :6]


@functools.partial(jax.jit, static_argnames=("interpret",))
def scale_feature_sums_batched(
    img1: jax.Array,
    mu1: jax.Array,
    s11: jax.Array,
    img2: jax.Array,
    *,
    interpret: bool = False,
) -> jax.Array:
    """Batched variant: the candidate axis is an explicit grid dimension
    (vmap-of-pallas_call pathologically broadcasts the shared reference
    inputs, so the batch is threaded through index maps instead — the
    reference blocks are re-fetched per (b, c) step from the same HBM
    locations).

    img1/mu1/s11: (C, H, W) shared reference-side maps.
    img2: (B, C, H, W) candidate frames. Returns (B, C, 6) raw sums.
    """
    c, h, w = img1.shape
    b = img2.shape[0]
    ref_block = pl.BlockSpec(
        (1, h, w), lambda bi, ci: (ci, 0, 0), memory_space=pltpu.VMEM
    )
    cand_block = pl.BlockSpec(
        (1, 1, h, w), lambda bi, ci: (bi, ci, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _features_kernel_batched,
        grid=(b, c),
        in_specs=[ref_block, ref_block, ref_block, cand_block],
        out_specs=pl.BlockSpec(
            (1, 1, 8, 128), lambda bi, ci: (bi, ci, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, c, 8, 128), jnp.float32),
        interpret=interpret,
    )(img1, mu1, s11, img2)
    return out[..., 0, :6]


def _features_kernel_batched(img1_ref, mu1_ref, s11_ref, img2_ref, out_ref):
    _features_core(
        img1_ref[0], mu1_ref[0], s11_ref[0], img2_ref[0, 0], out_ref, (0, 0)
    )
