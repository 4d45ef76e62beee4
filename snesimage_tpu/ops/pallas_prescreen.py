"""Fused pooled-mask kernel for the exact quarter-resolution prescreen.

The undithered candidate frame is a two-way select (core/refine.py):

    frame_b = where(m_b, c_b, L)        m_b = cand_mask & wins_b

with L = lin_no_cand candidate-independent and c_b the candidate's linear
color. Because 4x4 box pooling is linear, the frame at pyramid scale 2 is

    ds4(frame_b) = ds4(L) + (c_b * pool4(m_b) - pool4(m_b * ML)) / 16

where ML = cand_mask * L is candidate-independent. The coarse prescreen
score (ops/ssimulacra2.py skip_scales=2) only needs the scale-2 frame, so
the (B, H, W, 3) full-resolution candidate frames never have to exist.
Round 1 tried this decomposition at XLA level and lost: XLA materializes
the per-candidate (B, H, W, 3) product (NEXT.md item 4). This kernel fuses
win-mask computation, masking and both pooled sums in VMEM, per candidate:

    HBM traffic per visit: read dcand (B, H, W) + 6 candidate-independent
    (H, W) planes once + write (B, 4, H/4, W/4) sums — ~12 MB for the
    34-candidate channel sweep vs ~70 MB for materialize-and-downsample.

Every kernel here carries an image grid axis N ahead of the candidate
axis, and the public entry points are `jax.custom_vmap` functions whose
batching rule folds a vmapped image axis into that grid dimension —
vmap-of-pallas_call (which hangs Mosaic on shared operands) can never be
reached, including through vmap-of-jit where trace-time tracer sniffing
is blind (the round-2 `is_batched` BatchTracer check failed exactly
there). Unbatched callers run the same kernels at N=1.

H-pooling is a sublane reshape-sum; W-pooling rides the MXU as one small
matmul per map against a block-diagonal 0/1 pooling matrix (exact in f32).

Win-mask semantics match core/refine.py `_wins` (reference tie rules,
src/lib.rs:780-792): the candidate at slot index i beats the best other
entry on strictly smaller distance, or on ties when i < best_idx. The
caller folds the cand_mask into `bvalm` (masked pixels get -BIG so the
candidate can never win there) and the tie rule into `adj`.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.custom_batching import custom_vmap
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@lru_cache(maxsize=None)
def _pool_matrix(w: int) -> np.ndarray:
    """(w, w//4) block-diagonal 0/1 matrix: x @ P sums each run of 4 lanes."""
    p = np.zeros((w, w // 4), dtype=np.float32)
    p[np.arange(w), np.arange(w) // 4] = 1.0
    return p


def _pooled_wins_xla(dcand, bvalm, adj, ml_cmaj):
    """Reference/fallback implementation (CPU tests, non-TPU backends).
    Bit-matches the kernel up to f32 summation order."""
    b, h, w = dcand.shape
    wins = (dcand < bvalm) | ((dcand == bvalm) & (adj != 0))
    m = wins.astype(jnp.float32)  # (B, H, W)
    maps = jnp.concatenate(
        [m[:, None], m[:, None] * ml_cmaj[None]], axis=1
    )  # (B, 4, H, W)
    return maps.reshape(b, 4, h // 4, 4, w // 4, 4).sum(axis=(3, 5))


def use_pallas_prescreen() -> bool:
    return jax.default_backend() == "tpu"


def _bcast(a, batched, axis_size):
    return a if batched else jnp.broadcast_to(a[None], (axis_size,) + a.shape)


# ---------------------------------------------------------------------------
# Red-mean variant: the candidate distance plane is computed IN KERNEL from
# the target image and the candidate color, so the (B, H, W) dcand tensor
# (8.9 MB for a 34-candidate sweep, measured ~330 us to materialize) never
# touches HBM. The integer tie rule folds into a single compare:
#   wins = (d < bv) | ((d == bv) & adj)  ==  d < bv + adj   (integers)
# so the caller passes bva = best_val + adj, pre-masked (see callers).
# ---------------------------------------------------------------------------


def _kernel_redmean(tg_ref, col_ref, bva_ref, ml_ref, pw_ref, out_ref):
    h, w = bva_ref.shape[1:]
    im = pl.program_id(0)
    b = pl.program_id(1)
    cr = col_ref[im, b, 0]
    cg = col_ref[im, b, 1]
    cb = col_ref[im, b, 2]
    tr = tg_ref[0, 0]
    tg = tg_ref[0, 1]
    tb = tg_ref[0, 2]
    dr = tr - cr
    dg = tg - cg
    db = tb - cb
    rsum = tr + cr
    # 512 * red_mean^2, exact int32 (ops/color.py red_mean_sq_scaled).
    d = (1024 + rsum) * dr * dr + 2048 * dg * dg + (1534 - rsum) * db * db
    m = (d < bva_ref[0]).astype(jnp.float32)

    def pool(x):
        hs = x.reshape(h // 4, 4, w).sum(axis=1)
        return jnp.dot(
            hs,
            pw_ref[:],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    out_ref[0, 0, 0] = pool(m)
    out_ref[0, 0, 1] = pool(m * ml_ref[0, 0])
    out_ref[0, 0, 2] = pool(m * ml_ref[0, 1])
    out_ref[0, 0, 3] = pool(m * ml_ref[0, 2])


def _pooled_wins_redmean_pallas_n(
    target_cmaj, cand8, bva, ml_cmaj, *, interpret: bool
):
    """N-image batched kernel launch: grid (N, B)."""
    n, b = cand8.shape[:2]
    h, w = target_cmaj.shape[-2:]
    pw = jnp.asarray(_pool_matrix(w))
    return pl.pallas_call(
        _kernel_redmean,
        grid=(n, b),
        in_specs=[
            pl.BlockSpec(
                (1, 3, h, w), lambda im, i: (im, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, h, w), lambda im, i: (im, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 3, h, w), lambda im, i: (im, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (w, w // 4), lambda im, i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 4, h // 4, w // 4), lambda im, i: (im, i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, b, 4, h // 4, w // 4), jnp.float32),
        interpret=interpret,
    )(target_cmaj, cand8, bva, ml_cmaj, pw)


def _pooled_wins_redmean_xla(target_cmaj, cand8, bva, ml_cmaj):
    b, h, w = cand8.shape[0], target_cmaj.shape[1], target_cmaj.shape[2]
    d = cand8[:, :, None, None] - target_cmaj[None]  # (B, 3, H, W)
    rsum = target_cmaj[0][None] + cand8[:, 0, None, None]
    dist = (
        (1024 + rsum) * d[:, 0] * d[:, 0]
        + 2048 * d[:, 1] * d[:, 1]
        + (1534 - rsum) * d[:, 2] * d[:, 2]
    )
    m = (dist < bva[None]).astype(jnp.float32)
    maps = jnp.concatenate(
        [m[:, None], m[:, None] * ml_cmaj[None]], axis=1
    )
    return maps.reshape(b, 4, h // 4, 4, w // 4, 4).sum(axis=(3, 5))


@lru_cache(maxsize=None)
def _redmean_core(interpret: bool):
    @custom_vmap
    def core(target_cmaj, cand8, bva, ml_cmaj):
        return _pooled_wins_redmean_pallas_n(
            target_cmaj[None], cand8[None], bva[None], ml_cmaj[None],
            interpret=interpret,
        )[0]

    @core.def_vmap
    def _rule(axis_size, in_batched, target_cmaj, cand8, bva, ml_cmaj):
        tb, cb, bb, mb = in_batched
        return (
            _pooled_wins_redmean_pallas_n(
                _bcast(target_cmaj, tb, axis_size),
                _bcast(cand8, cb, axis_size),
                _bcast(bva, bb, axis_size),
                _bcast(ml_cmaj, mb, axis_size),
                interpret=interpret,
            ),
            True,
        )

    return core


def pooled_wins_redmean(target_cmaj, cand8, bva, ml_cmaj, *, interpret=False):
    """Per-candidate pooled win sums, red-mean distance fused in kernel.

    target_cmaj: (3, H, W) int32 target image, channel-major.
    cand8:       (B, 3) int32 candidate colors (8-bit).
    bva:         (H, W) int32 win threshold — best other-entry distance
                 plus the integer tie rule, masked to INT32_MIN outside
                 (affected & opaque) pixels: wins = d < bva.
    ml_cmaj:     (3, H, W) f32 cand_mask * lin_no_cand, channel-major.

    Returns (B, 4, H//4, W//4) f32 block sums as `pooled_wins`.
    `jax.vmap` over a leading image axis folds into the kernel's image
    grid dimension (safe under vmap and vmap-of-jit alike).
    """
    if use_pallas_prescreen() or interpret:
        return _redmean_core(interpret)(target_cmaj, cand8, bva, ml_cmaj)
    return _pooled_wins_redmean_xla(target_cmaj, cand8, bva, ml_cmaj)


# ---------------------------------------------------------------------------
# CIEDE2000 variant: the candidate distance plane is computed IN KERNEL
# from the precomputed target CIELAB planes and the candidate's Lab triple
# (SMEM scalars) — the XLA path materialized ~15 (B, H, W) f32 temporaries
# (~130 MB of HBM traffic per 33-candidate visit) plus the (B, H, W)
# distance tensor itself. The formula is ops/pallas_dither.py
# _ciede2000_planes (manual atan2; ~2e-7 vs the XLA ciede2000, so exact
# near-ties against the XLA-computed best-other-entry threshold can flip
# — within the perceptual path's documented 5e-3 oracle tolerance).
# ---------------------------------------------------------------------------


def _kernel_ciede(
    tlab_ref, clab_ref, bv_ref, adj_ref, ml_ref, pw_ref, out_ref, d_ref
):
    from snesimage_tpu.ops.pallas_dither import _ciede2000_planes

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

    def pool(x):
        hs = x.reshape(h // 4, 4, w).sum(axis=1)
        return jnp.dot(
            hs,
            pw_ref[:],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    out_ref[0, 0, 0] = pool(m)
    out_ref[0, 0, 1] = pool(m * ml_ref[0, 0])
    out_ref[0, 0, 2] = pool(m * ml_ref[0, 1])
    out_ref[0, 0, 3] = pool(m * ml_ref[0, 2])


def _pooled_wins_ciede_pallas_n(
    target_lab_cmaj, cand_lab, bvalm, adj, ml_cmaj, *, interpret: bool
):
    n, b = cand_lab.shape[:2]
    h, w = target_lab_cmaj.shape[-2:]
    pw = jnp.asarray(_pool_matrix(w))
    plane = pl.BlockSpec(
        (1, h, w), lambda im, i: (im, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _kernel_ciede,
        grid=(n, b),
        in_specs=[
            pl.BlockSpec(
                (1, 3, h, w), lambda im, i: (im, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            plane,
            plane,
            pl.BlockSpec(
                (1, 3, h, w), lambda im, i: (im, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (w, w // 4), lambda im, i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, 4, h // 4, w // 4), lambda im, i: (im, i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, h, w), lambda im, i: (im, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, b, 4, h // 4, w // 4), jnp.float32),
            jax.ShapeDtypeStruct((n, b, h, w), jnp.float32),
        ],
        interpret=interpret,
    )(target_lab_cmaj, cand_lab, bvalm, adj, ml_cmaj, pw)


@lru_cache(maxsize=None)
def _ciede_core(interpret: bool):
    @custom_vmap
    def core(target_lab_cmaj, cand_lab, bvalm, adj, ml_cmaj):
        pooled, dcand = _pooled_wins_ciede_pallas_n(
            target_lab_cmaj[None], cand_lab[None], bvalm[None], adj[None],
            ml_cmaj[None], interpret=interpret,
        )
        return pooled[0], dcand[0]

    @core.def_vmap
    def _rule(axis_size, in_batched, target_lab_cmaj, cand_lab, bvalm, adj,
              ml_cmaj):
        args = [
            _bcast(a, bb, axis_size)
            for a, bb in zip(
                (target_lab_cmaj, cand_lab, bvalm, adj, ml_cmaj), in_batched
            )
        ]
        return _pooled_wins_ciede_pallas_n(*args, interpret=interpret), (
            True,
            True,
        )

    return core


def pooled_wins_ciede(
    target_lab_cmaj, cand_lab, bvalm, adj, ml_cmaj, dcand_fn, *,
    interpret=False,
):
    """Per-candidate pooled win sums with in-kernel CIEDE2000.

    target_lab_cmaj: (3, H, W) f32 target CIELAB planes.
    cand_lab:        (B, 3) f32 candidate CIELAB triples.
    bvalm/adj/ml_cmaj: as the red-mean variant.
    dcand_fn: () -> (B, H, W) XLA distance tensor — evaluated only on the
        off-TPU fallback path.

    Returns (pooled (B, 4, H//4, W//4), dcand (B, H, W)): the kernel also
    emits the distance planes it computed, so finalists' win masks and
    the accepted color's distance-cache column can reuse them instead of
    re-running CIEDE2000 (~16 us/plane at transcendental roofline).
    CIEDE2000 here is the manual-atan2 formula (~2e-7 vs the XLA path).
    `jax.vmap` over a leading image axis folds into the kernel grid.
    """
    if use_pallas_prescreen() or interpret:
        return _ciede_core(interpret)(
            target_lab_cmaj, cand_lab, bvalm, adj, ml_cmaj
        )
    dcand = dcand_fn()
    return _pooled_wins_xla(dcand, bvalm, adj, ml_cmaj), dcand


# ---------------------------------------------------------------------------
# Small-table color select: lin[ch, h, w] = table[ch, key[h, w]].
# A per-pixel gather from a tiny table measured ~445 us per (H, W) plane on
# this TPU (pathological XLA gather); the kernel instead unrolls a
# compare-select sum over the table entries entirely in VMEM (~120
# iterations for 8x15 palettes, ~30 us).
# ---------------------------------------------------------------------------


def _select_kernel(key_ref, tbl_ref, out_ref):
    nk = tbl_ref.shape[2]
    im = pl.program_id(0)
    key = key_ref[0]
    for ch in range(3):
        acc = jnp.zeros_like(out_ref[0, ch])
        for k in range(nk):
            acc = acc + jnp.where(key == k, tbl_ref[im, ch, k], 0.0)
        out_ref[0, ch] = acc


def _select_colors_pallas_n(key, table, *, interpret: bool):
    n, h, w = key.shape
    return pl.pallas_call(
        _select_kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec(
                (1, h, w), lambda im: (im, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 3, h, w), lambda im: (im, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, 3, h, w), jnp.float32),
        interpret=interpret,
    )(key, table)


def _select_colors_xla(key, table):
    padded = jnp.concatenate([table, jnp.zeros((3, 1), table.dtype)], axis=1)
    safe = jnp.minimum(key, padded.shape[1] - 1)
    return jnp.moveaxis(padded.T[safe], -1, 0)


@lru_cache(maxsize=None)
def _select_core(interpret: bool):
    @custom_vmap
    def core(key, table):
        return _select_colors_pallas_n(
            key[None], table[None], interpret=interpret
        )[0]

    @core.def_vmap
    def _rule(axis_size, in_batched, key, table):
        kb, tb = in_batched
        return (
            _select_colors_pallas_n(
                _bcast(key, kb, axis_size),
                _bcast(table, tb, axis_size),
                interpret=interpret,
            ),
            True,
        )

    return core


def select_colors(key, table, *, interpret=False):
    """(3, H, W) color planes selected from a small table by per-pixel key.

    key:   (H, W) int32 in [0, K]; the value K (== table.shape[1] when the
           caller pads a sentinel column of zeros) selects 0.0.
    table: (3, K') f32 channel-major color table, K' >= max(key)+1.
    `jax.vmap` over a leading image axis folds into the kernel grid.
    """
    if use_pallas_prescreen() or interpret:
        return _select_core(interpret)(key, table)
    return _select_colors_xla(key, table)
