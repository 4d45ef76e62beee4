"""Tests for the automatic tile-reassignment extension."""

import numpy as np
import jax.numpy as jnp

from snesimage_tpu.config import QuantConfig
from snesimage_tpu.core import pipeline
from snesimage_tpu.core.reassign import auto_reassign_tiles
from snesimage_tpu.core.refine import error_of, full_remap, make_reference_pyramid
from snesimage_tpu.core.state import new_state


def _two_region_image():
    """Left half red-ish gradient, right half blue-ish gradient."""
    h = w = 64
    img = np.zeros((h, w, 4), dtype=np.uint8)
    y, x = np.mgrid[0:h, 0:w]
    img[:, : w // 2, 0] = 150 + (x[:, : w // 2] % 32) * 3
    img[:, : w // 2, 1] = 30
    img[:, w // 2 :, 2] = 150 + (x[:, w // 2 :] % 32) * 3
    img[:, w // 2 :, 1] = 30
    img[..., 3] = 255
    return img


def test_reassign_separates_regions():
    """With palettes hand-set to red vs blue, reassignment must route the
    red half to the red subpalette and the blue half to the blue one."""
    cfg = QuantConfig(subpalette_count=2, subpalette_size=3, width=64, height=64)
    st = new_state(_two_region_image(), cfg)
    palette = np.zeros((2, 3, 3), dtype=np.int32)
    palette[0] = [[18, 4, 0], [22, 4, 0], [26, 4, 0]]  # reds
    palette[1] = [[0, 4, 18], [0, 4, 22], [0, 4, 26]]  # blues
    st = st._replace(palette=jnp.asarray(palette))

    st2 = auto_reassign_tiles(st, cfg)
    tp = np.asarray(st2.tile_palettes)
    assert (tp[:, :4] == 0).all()  # left tiles -> red subpalette
    assert (tp[:, 4:] == 1).all()  # right tiles -> blue subpalette


def test_reassign_never_worsens_much(small_image):
    """Reassigning to the per-tile distance argmin should not noticeably
    worsen the perceptual error on a clustered state."""
    cfg = QuantConfig(subpalette_count=3, subpalette_size=4, width=64, height=64)
    st = new_state(small_image, cfg)
    st = pipeline.initialize(st, cfg)
    st = pipeline.cluster(st, cfg)
    refp = make_reference_pyramid(st)
    before = float(error_of(st, cfg, refp))
    st2 = full_remap(auto_reassign_tiles(st, cfg), cfg)
    after = float(error_of(st2, cfg, refp))
    assert after <= before + 1.0


def test_transparent_tiles_keep_zero(small_image):
    cfg = QuantConfig(subpalette_count=3, subpalette_size=4, width=64, height=64)
    st = new_state(small_image, cfg)
    st = pipeline.initialize(st, cfg)
    st2 = auto_reassign_tiles(st, cfg)
    tp = np.asarray(st2.tile_palettes)
    assert tp[0, 6] == 0 and tp[0, 7] == 0  # fully transparent tiles


def test_optimize_with_reassign_every(small_image):
    cfg = QuantConfig(subpalette_count=2, subpalette_size=3, width=64, height=64,
                      max_steps=2)
    st = new_state(small_image, cfg)
    st = pipeline.initialize(st, cfg)
    st = pipeline.cluster(st, cfg)
    st2, errors = pipeline.optimize(st, cfg, reassign_every=1)
    assert len(errors) == 2
    assert np.isfinite(errors).all()
