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
fused_scale_feature_block); off-TPU callers use the identical-semantics
XLA path, and image-batched callers fold into a leading image grid axis
via the custom_vmap rule (_msfs_core).
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


def _scales_feature_tile(
    r, g, bb, ref_plane, n, ref_hw, pool_for, blur_for, r_pad
):
    """Shared in-kernel multi-scale feature accumulation.

    (r, g, bb): linear-RGB channel planes at the first scale's resolution.
    ref_plane(si, j, c): reference plane j in (img1, mu1, s11) of scale si,
    channel c. pool_for(si): the pool2 matrix ref for the downsample INTO
    scale si (si >= 1). blur_for(sz): blur matrix ref for edge length sz.
    Returns the (r_pad, 128) output tile of raw feature sums (row =
    si*3 + channel, col = moment index 0..5)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (r_pad, 128), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (r_pad, 128), 1)
    tile = jnp.zeros((r_pad, 128), dtype=jnp.float32)
    for si in range(n):
        if si:
            pw = pool_for(si)
            r, g, bb = _ds2(r, pw), _ds2(g, pw), _ds2(bb, pw)
        hs, ws = ref_hw[si]
        brow = blur_for(hs)
        bcol = blur_for(ws)

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
                ref_plane(si, 0, c),
                ref_plane(si, 1, c),
                ref_plane(si, 2, c),
                xyb[c],
                blur_fn,
            )
            ri = si * 3 + c
            for k, v in enumerate(sums):
                tile = tile + jnp.where((row == ri) & (col == k), v, 0.0)
    return tile


def _multiscale_feature_sums_n(
    flat_refs: tuple,
    frames: jax.Array,
    *,
    n: int,
    pre_ds: int,
    interpret: bool,
) -> jax.Array:
    """N-image batched kernel launch: grid (N, B), candidate innermost so
    each image's reference blocks stay VMEM-resident across candidates.

    flat_refs: 3n arrays (img1, mu1, s11 per scale), each (N, 3, h_s, w_s).
    frames: (N, B, 3, H, W). Returns (N, B, n, 3, 6) raw sums.
    """
    from snesimage_tpu.ops.ssimulacra2 import _blur_matrix

    n_img, b, _, h, w = frames.shape
    rows = n * 3
    r_pad = -(-rows // 8) * 8
    ref_hw = [flat_refs[3 * si].shape[-2:] for si in range(n)]
    pre_widths = [w >> d for d in range(pre_ds)]
    pools = [jnp.asarray(_pool2_matrix(pw)) for pw in pre_widths] + [
        jnp.asarray(_pool2_matrix(ref_hw[si][1])) for si in range(n - 1)
    ]
    # One banded blur matrix per distinct plane edge length (the same
    # matrices the XLA path multiplies with, ops/ssimulacra2.py blur):
    # in-kernel the blur runs as two MXU matmuls per field instead of the
    # VPU shift-add FIR — on the sub-128 planes of the coarse scales the
    # FIR wastes most of each (8, 128) vreg, measured ~2.4x off roofline.
    blur_sizes: list[int] = []
    for si in range(n):
        for edge in ref_hw[si]:
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
        r, g, bb = fr_ref[0, 0, 0], fr_ref[0, 0, 1], fr_ref[0, 0, 2]
        for d in range(pre_ds):
            pw = pool_refs[d][:]
            r, g, bb = _ds2(r, pw), _ds2(g, pw), _ds2(bb, pw)
        out_ref[0, 0] = _scales_feature_tile(
            r, g, bb,
            lambda si, j, c: refs[3 * si + j][0, c],
            n, ref_hw,
            lambda si: pool_refs[pre_ds + si - 1][:],
            lambda sz: blur_refs[blur_sizes.index(sz)][:],
            r_pad,
        )

    in_specs = [
        pl.BlockSpec(
            (1, 1, 3, h, w), lambda im, i: (im, i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
    ]
    for si in range(n):
        hs, ws = ref_hw[si]
        spec = pl.BlockSpec(
            (1, 3, hs, ws), lambda im, i: (im, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        in_specs += [spec, spec, spec]
    for pool in pools:
        pshape = pool.shape
        in_specs.append(
            pl.BlockSpec(pshape, lambda im, i: (0, 0), memory_space=pltpu.VMEM)
        )
    for sz in blur_sizes:
        in_specs.append(
            pl.BlockSpec(
                (sz, sz), lambda im, i: (0, 0), memory_space=pltpu.VMEM
            )
        )

    out = pl.pallas_call(
        kernel,
        grid=(n_img, b),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, r_pad, 128), lambda im, i: (im, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_img, b, r_pad, 128), jnp.float32),
        interpret=interpret,
    )(frames, *flat_refs, *pools, *blur_mats)
    return out[:, :, :rows, :6].reshape(n_img, b, n, 3, 6)


@functools.lru_cache(maxsize=None)
def _msfs_core(n: int, pre_ds: int, interpret: bool):
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def core(frames, *flat_refs):
        return _multiscale_feature_sums_n(
            tuple(a[None] for a in flat_refs), frames[None],
            n=n, pre_ds=pre_ds, interpret=interpret,
        )[0]

    @core.def_vmap
    def _rule(axis_size, in_batched, frames, *flat_refs):
        def bcast(a, batched):
            if batched:
                return a
            return jnp.broadcast_to(a[None], (axis_size,) + a.shape)

        fb, *rb = in_batched
        return (
            _multiscale_feature_sums_n(
                tuple(bcast(a, bb) for a, bb in zip(flat_refs, rb)),
                bcast(frames, fb),
                n=n, pre_ds=pre_ds, interpret=interpret,
            ),
            True,
        )

    return core


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

    `jax.vmap` over a leading image axis (on frames and/or the reference
    arrays) folds into the kernel's leading image grid dimension via a
    custom batching rule — never vmap-of-pallas_call, which hangs Mosaic
    on shared operands, including when reached through vmap-of-jit.

    Returns (B, n_scales, 3, 6) raw sums in _feature_sums order; divide by
    h_s*w_s and fourth-root outside.
    """
    flat_refs = tuple(a for triple in ref_scales for a in triple)
    return _msfs_core(len(ref_scales), pre_ds, interpret)(frames, *flat_refs)


# ---------------------------------------------------------------------------
# Fully fused coarse prescreen (round 3): win mask + pooled sums + coarse
# frame + scale-2..5 features in ONE program per candidate. Replaces the
# pooled-win kernel -> XLA coarse-frame assembly -> multi-scale kernel
# chain (three dispatches and two HBM round-trips per slot visit) on the
# refine loop's hottest stage — the 33-candidate coarse rank was 43% of a
# round-2 sweep. The coarse frame decomposition is ops/pallas_prescreen.py's:
#     ds4(where(m, c, L)) = ds4(L) + (c * pool4(m) - pool4(m * ML)) / 16
# computed here entirely in VMEM, feeding _scales_feature_tile directly.
# ---------------------------------------------------------------------------


def _coarse_kernel_redmean(
    n_scales, ref_hw, blur_sizes, r_pad, pre_ds=0, emit_frames=False
):
    n_pools = pre_ds + n_scales - 1
    n_out = 2 if emit_frames else 1

    def kernel(*args):
        tg_ref, col_ref, clin_ref, bva_ref, ml_ref, ds4_ref = args[:6]
        refs = args[6 : 6 + 3 * n_scales]
        p4_ref = args[6 + 3 * n_scales]
        pool_refs = args[7 + 3 * n_scales : 7 + 3 * n_scales + n_pools]
        blur_refs = args[7 + 3 * n_scales + n_pools : len(args) - n_out]
        out_ref = args[len(args) - n_out]
        h, w = bva_ref.shape[1:]
        im = pl.program_id(0)
        b = pl.program_id(1)
        cr = col_ref[im, b, 0]
        cg = col_ref[im, b, 1]
        cb = col_ref[im, b, 2]
        dr = tg_ref[0, 0] - cr
        dg = tg_ref[0, 1] - cg
        db = tg_ref[0, 2] - cb
        rsum = tg_ref[0, 0] + cr
        d = (1024 + rsum) * dr * dr + 2048 * dg * dg + (1534 - rsum) * db * db
        m = (d < bva_ref[0]).astype(jnp.float32)

        def pool4(x):
            hs = x.reshape(h // 4, 4, w).sum(axis=1)
            return jnp.dot(
                hs,
                p4_ref[:],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

        p0 = pool4(m)
        inv16 = np.float32(1.0 / 16.0)
        planes = [
            (clin_ref[im, b, k] * p0 - pool4(m * ml_ref[0, k])) * inv16
            + ds4_ref[0, k]
            for k in range(3)
        ]
        if emit_frames:
            fr_ref = args[-1]
            for k in range(3):
                fr_ref[0, 0, k] = planes[k]
        r, g, bb = planes
        for dd in range(pre_ds):
            pw = pool_refs[dd][:]
            r, g, bb = _ds2(r, pw), _ds2(g, pw), _ds2(bb, pw)
        out_ref[0, 0] = _scales_feature_tile(
            r, g, bb,
            lambda si, j, c: refs[3 * si + j][0, c],
            n_scales, ref_hw,
            lambda si: pool_refs[pre_ds + si - 1][:],
            lambda sz: blur_refs[blur_sizes.index(sz)][:],
            r_pad,
        )

    return kernel


def _coarse_kernel_ciede(
    n_scales, ref_hw, blur_sizes, r_pad, pre_ds=0, emit_frames=False
):
    n_pools = pre_ds + n_scales - 1
    n_out = 3 if emit_frames else 2

    def kernel(*args):
        from snesimage_tpu.ops.pallas_dither import _ciede2000_planes

        (tlab_ref, clab_ref, clin_ref, bv_ref, adj_ref, ml_ref,
         ds4_ref) = args[:7]
        refs = args[7 : 7 + 3 * n_scales]
        p4_ref = args[7 + 3 * n_scales]
        pool_refs = args[8 + 3 * n_scales : 8 + 3 * n_scales + n_pools]
        blur_refs = args[8 + 3 * n_scales + n_pools : len(args) - n_out]
        out_ref = args[len(args) - n_out]
        d_ref = args[len(args) - n_out + 1]
        h, w = bv_ref.shape[1:]
        im = pl.program_id(0)
        b = pl.program_id(1)
        d = _ciede2000_planes(
            tlab_ref[0, 0], tlab_ref[0, 1], tlab_ref[0, 2],
            clab_ref[im, b, 0], clab_ref[im, b, 1], clab_ref[im, b, 2],
        )
        d_ref[0, 0] = d
        wins = (d < bv_ref[0]) | ((d == bv_ref[0]) & (adj_ref[0] != 0))
        m = wins.astype(jnp.float32)

        def pool4(x):
            hs = x.reshape(h // 4, 4, w).sum(axis=1)
            return jnp.dot(
                hs,
                p4_ref[:],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

        p0 = pool4(m)
        inv16 = np.float32(1.0 / 16.0)
        planes = [
            (clin_ref[im, b, k] * p0 - pool4(m * ml_ref[0, k])) * inv16
            + ds4_ref[0, k]
            for k in range(3)
        ]
        if emit_frames:
            fr_ref = args[-1]
            for k in range(3):
                fr_ref[0, 0, k] = planes[k]
        r, g, bb = planes
        for dd in range(pre_ds):
            pw = pool_refs[dd][:]
            r, g, bb = _ds2(r, pw), _ds2(g, pw), _ds2(bb, pw)
        out_ref[0, 0] = _scales_feature_tile(
            r, g, bb,
            lambda si, j, c: refs[3 * si + j][0, c],
            n_scales, ref_hw,
            lambda si: pool_refs[pre_ds + si - 1][:],
            lambda sz: blur_refs[blur_sizes.index(sz)][:],
            r_pad,
        )

    return kernel


def _coarse_common(flat_refs, w, pre_ds=0):
    from snesimage_tpu.ops.pallas_prescreen import _pool_matrix

    n_scales = len(flat_refs) // 3
    ref_hw = [flat_refs[3 * si].shape[-2:] for si in range(n_scales)]
    rows = n_scales * 3
    r_pad = -(-rows // 8) * 8
    p4 = jnp.asarray(_pool_matrix(w))
    # Pre-downsample pools (source widths walk down from the 1/4-res
    # plane), then the between-scale pools (source width = previous
    # scale's width) — the same layout _multiscale_feature_sums_n uses.
    pools = [
        jnp.asarray(_pool2_matrix((w // 4) >> d)) for d in range(pre_ds)
    ] + [
        jnp.asarray(_pool2_matrix(ref_hw[si][1])) for si in range(n_scales - 1)
    ]
    blur_sizes: list[int] = []
    for si in range(n_scales):
        for edge in ref_hw[si]:
            if edge not in blur_sizes:
                blur_sizes.append(edge)
    blur_mats = [jnp.asarray(_blur_matrix_local(sz)) for sz in blur_sizes]
    return n_scales, ref_hw, rows, r_pad, p4, pools, blur_sizes, blur_mats


def _blur_matrix_local(sz):
    from snesimage_tpu.ops.ssimulacra2 import _blur_matrix

    return _blur_matrix(sz)


def _coarse_redmean_n(
    tg, cand8, cand_lin, bva, ml, ds4_l, flat_refs, *,
    pre_ds: int = 0, emit_frames: bool = False, interpret: bool,
):
    """(N, B, rows, 6) raw coarse feature sums, one program per (image,
    candidate). With emit_frames also returns the (N, B, 3, h/4, w/4)
    quarter-res coarse frames (the three-level prescreen's scale-2 stage
    re-scores the top pre-ranked candidates from them)."""
    n_img, b = cand8.shape[:2]
    h, w = bva.shape[-2:]
    (n_scales, ref_hw, rows, r_pad, p4, pools, blur_sizes,
     blur_mats) = _coarse_common(flat_refs, w, pre_ds)

    plane = pl.BlockSpec(
        (1, h, w), lambda im, i: (im, 0, 0), memory_space=pltpu.VMEM
    )
    cplane = pl.BlockSpec(
        (1, 3, h, w), lambda im, i: (im, 0, 0, 0), memory_space=pltpu.VMEM
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    in_specs = [
        cplane, smem, smem, plane, cplane,
        pl.BlockSpec(
            (1, 3, h // 4, w // 4), lambda im, i: (im, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    for si in range(n_scales):
        hs, ws = ref_hw[si]
        spec = pl.BlockSpec(
            (1, 3, hs, ws), lambda im, i: (im, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        in_specs += [spec, spec, spec]
    for mat in [p4] + pools + blur_mats:
        in_specs.append(
            pl.BlockSpec(
                mat.shape, lambda im, i: (0, 0), memory_space=pltpu.VMEM
            )
        )
    out_specs = [
        pl.BlockSpec(
            (1, 1, r_pad, 128), lambda im, i: (im, i, 0, 0),
            memory_space=pltpu.VMEM,
        )
    ]
    out_shape = [jax.ShapeDtypeStruct((n_img, b, r_pad, 128), jnp.float32)]
    if emit_frames:
        out_specs.append(
            pl.BlockSpec(
                (1, 1, 3, h // 4, w // 4), lambda im, i: (im, i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        out_shape.append(
            jax.ShapeDtypeStruct((n_img, b, 3, h // 4, w // 4), jnp.float32)
        )
    out = pl.pallas_call(
        _coarse_kernel_redmean(
            n_scales, ref_hw, blur_sizes, r_pad, pre_ds, emit_frames
        ),
        grid=(n_img, b),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(tg, cand8, cand_lin, bva, ml, ds4_l, *flat_refs, p4, *pools, *blur_mats)
    if emit_frames:
        return out[0][:, :, :rows, :6], out[1]
    return out[0][:, :, :rows, :6]


def _coarse_ciede_n(
    tlab, clab, cand_lin, bv, adj, ml, ds4_l, flat_refs, *,
    pre_ds: int = 0, emit_frames: bool = False, interpret: bool,
):
    """((N, B, rows, 6) raw sums, (N, B, H, W) dcand planes[, frames])."""
    n_img, b = clab.shape[:2]
    h, w = bv.shape[-2:]
    (n_scales, ref_hw, rows, r_pad, p4, pools, blur_sizes,
     blur_mats) = _coarse_common(flat_refs, w, pre_ds)

    plane = pl.BlockSpec(
        (1, h, w), lambda im, i: (im, 0, 0), memory_space=pltpu.VMEM
    )
    cplane = pl.BlockSpec(
        (1, 3, h, w), lambda im, i: (im, 0, 0, 0), memory_space=pltpu.VMEM
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    in_specs = [
        cplane, smem, smem, plane, plane, cplane,
        pl.BlockSpec(
            (1, 3, h // 4, w // 4), lambda im, i: (im, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    for si in range(n_scales):
        hs, ws = ref_hw[si]
        spec = pl.BlockSpec(
            (1, 3, hs, ws), lambda im, i: (im, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        in_specs += [spec, spec, spec]
    for mat in [p4] + pools + blur_mats:
        in_specs.append(
            pl.BlockSpec(
                mat.shape, lambda im, i: (0, 0), memory_space=pltpu.VMEM
            )
        )
    out_specs = [
        pl.BlockSpec(
            (1, 1, r_pad, 128), lambda im, i: (im, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 1, h, w), lambda im, i: (im, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n_img, b, r_pad, 128), jnp.float32),
        jax.ShapeDtypeStruct((n_img, b, h, w), jnp.float32),
    ]
    if emit_frames:
        out_specs.append(
            pl.BlockSpec(
                (1, 1, 3, h // 4, w // 4), lambda im, i: (im, i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        out_shape.append(
            jax.ShapeDtypeStruct((n_img, b, 3, h // 4, w // 4), jnp.float32)
        )
    out = pl.pallas_call(
        _coarse_kernel_ciede(
            n_scales, ref_hw, blur_sizes, r_pad, pre_ds, emit_frames
        ),
        grid=(n_img, b),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(
        tlab, clab, cand_lin, bv, adj, ml, ds4_l, *flat_refs, p4, *pools,
        *blur_mats,
    )
    if emit_frames:
        return out[0][:, :, :rows, :6], out[1], out[2]
    return out[0][:, :, :rows, :6], out[1]


@functools.lru_cache(maxsize=None)
def _coarse_redmean_core(pre_ds: int, emit_frames: bool, interpret: bool):
    from jax.custom_batching import custom_vmap

    kw = dict(pre_ds=pre_ds, emit_frames=emit_frames, interpret=interpret)

    @custom_vmap
    def core(tg, cand8, cand_lin, bva, ml, ds4_l, *flat_refs):
        out = _coarse_redmean_n(
            tg[None], cand8[None], cand_lin[None], bva[None], ml[None],
            ds4_l[None], tuple(a[None] for a in flat_refs), **kw,
        )
        if emit_frames:
            return out[0][0], out[1][0]
        return out[0]

    @core.def_vmap
    def _rule(axis_size, in_batched, *args):
        def bcast(a, bb):
            return a if bb else jnp.broadcast_to(a[None], (axis_size,) + a.shape)

        full = [bcast(a, bb) for a, bb in zip(args, in_batched)]
        out = _coarse_redmean_n(*full[:6], tuple(full[6:]), **kw)
        if emit_frames:
            return out, (True, True)
        return out, True

    return core


@functools.lru_cache(maxsize=None)
def _coarse_ciede_core(pre_ds: int, emit_frames: bool, interpret: bool):
    from jax.custom_batching import custom_vmap

    kw = dict(pre_ds=pre_ds, emit_frames=emit_frames, interpret=interpret)

    @custom_vmap
    def core(tlab, clab, cand_lin, bv, adj, ml, ds4_l, *flat_refs):
        out = _coarse_ciede_n(
            tlab[None], clab[None], cand_lin[None], bv[None], adj[None],
            ml[None], ds4_l[None], tuple(a[None] for a in flat_refs), **kw,
        )
        return tuple(a[0] for a in out)

    @core.def_vmap
    def _rule(axis_size, in_batched, *args):
        def bcast(a, bb):
            return a if bb else jnp.broadcast_to(a[None], (axis_size,) + a.shape)

        full = [bcast(a, bb) for a, bb in zip(args, in_batched)]
        out = _coarse_ciede_n(*full[:7], tuple(full[7:]), **kw)
        return out, (True,) * len(out)

    return core


def coarse_feature_sums_redmean(
    tg_cmaj, cand8, cand_lin, bva, ml_cmaj, ds4_l, flat_refs, *,
    pre_ds=0, emit_frames=False, interpret=False,
):
    """Fused coarse prescreen, red-mean path. Args as core/refine.py
    assembles them; flat_refs = channel-major (img1, mu1, s11) triples of
    the coarse scales (starting at scale 2 + pre_ds — pre_ds in-kernel
    2x2 downsamplings of the quarter-res coarse frame run before the
    first scale). Returns (B, 3*n_scales, 6) raw sums; with emit_frames
    also the (B, 3, H/4, W/4) quarter-res coarse frames."""
    return _coarse_redmean_core(pre_ds, emit_frames, interpret)(
        tg_cmaj, cand8, cand_lin, bva, ml_cmaj, ds4_l, *flat_refs
    )


def coarse_feature_sums_ciede(
    tlab_cmaj, cand_lab, cand_lin, bvalm, adj, ml_cmaj, ds4_l, flat_refs, *,
    pre_ds=0, emit_frames=False, interpret=False,
):
    """Fused coarse prescreen, CIEDE2000 path. Also returns the (B, H, W)
    candidate distance planes for finalist reuse (and with emit_frames the
    quarter-res coarse frames; pre_ds as in the red-mean path)."""
    return _coarse_ciede_core(pre_ds, emit_frames, interpret)(
        tlab_cmaj, cand_lab, cand_lin, bvalm, adj, ml_cmaj, ds4_l, *flat_refs
    )
