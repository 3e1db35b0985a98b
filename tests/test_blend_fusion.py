"""Fused per-pixel blends (engine pointwise chain) vs the spatial path.

A blended pointwise stage with a uniform or parametric mask now rides
the fused Pallas chain (blend.apply_blend_pointwise); the spatial
apply_blend path is the behavioral reference (itself gated against
src/develop/blend.c semantics by test_blend.py).  Covers every blend
class the 3.4 benchmark sidecar uses (HUE / OVERLAY / NORMAL2 /
LAB_LIGHTNESS in Lab) plus parametric blendif masks in both blend
colorspaces, combine/polarity flags, and the contrast/brightness mask
tone curve.
"""

import dataclasses

import numpy as np
import pytest

from ansel_tpu import HistoryItem
from ansel_tpu.core.params import params_class
from ansel_tpu.io.synthetic import synth_raw
from ansel_tpu.pipeline import blend as bl
from ansel_tpu.pipeline import engine


@pytest.fixture
def _fusion_interpret():
    engine._FORCE_FUSION_INTERPRET = True
    engine._COMPILE_CACHE.clear()
    yield
    engine._FORCE_FUSION_INTERPRET = False
    engine._COMPILE_CACHE.clear()


def _P(op, blend=None, **kw):
    p = params_class(op)()
    if kw:
        p = dataclasses.replace(p, **kw)
    return HistoryItem(op, params=p, blend_params=blend)


def _render(meta, hist, raw):
    pipe = engine.CompiledPipe(engine.Pipeline(meta, hist))
    return np.asarray(pipe.output_array(raw))


def _compare(hist, mean_tol=1e-5, max_tol=5e-3):
    raw, meta, _ = synth_raw(h=192, w=256)
    engine._FORCE_FUSION_INTERPRET = True
    engine._COMPILE_CACHE.clear()
    fused = _render(meta, hist, np.asarray(raw))
    engine._FORCE_FUSION_INTERPRET = False
    engine._COMPILE_CACHE.clear()
    plain = _render(meta, hist, np.asarray(raw))
    d = np.abs(fused - plain)
    assert d.mean() < mean_tol, d.mean()
    assert d.max() < max_tol, d.max()


# ---- the sidecar's blend classes (Lab, uniform mask) --------------------

@pytest.mark.parametrize("mode,opacity", [
    (bl.B_NORMAL2, 12.0),         # colorize's blend
    (bl.B_HUE, 100.0),            # lowpass-class
    (bl.B_OVERLAY, 100.0),        # highpass-class
    (bl.B_LAB_LIGHTNESS, 33.0),   # monochrome's blend
    (bl.B_LIGHTNESS, 60.0),
    (bl.B_LAB_COLOR, 75.0),
    (bl.B_MULTIPLY, 45.0),
])
def test_lab_uniform_modes(_fusion_interpret, mode, opacity):
    bp = bl.BlendParams(mask_mode=bl.MASK_ENABLED, blend_mode=mode,
                        opacity=opacity, blend_cst=bl.CS_LAB)
    hist = [
        _P("exposure", exposure=0.5),
        _P("filmicrgb"),
        _P("colorize", blend=bp, saturation=0.4, lightness=55.0),
        _P("colisa", contrast=0.1),
    ]
    _compare(hist)


# ---- scene-referred RGB modes -------------------------------------------

@pytest.mark.parametrize("mode", [
    bl.B_NORMAL2, bl.B_SCREEN, bl.B_VIVIDLIGHT, bl.B_DIVIDE,
    bl.B_CHROMATICITY, bl.B_RGB_G, bl.B_HSV_COLOR, bl.B_COLOR,
])
def test_rgb_uniform_modes(_fusion_interpret, mode):
    bp = bl.BlendParams(mask_mode=bl.MASK_ENABLED, blend_mode=mode,
                        opacity=70.0, blend_cst=bl.CS_RGB_SCENE)
    hist = [
        _P("exposure", exposure=0.7),
        _P("velvia", blend=bp, strength=45.0),
        _P("filmicrgb"),
    ]
    _compare(hist)


# ---- parametric blendif masks -------------------------------------------

def _blendif_bp(cst, chans, invert_chan=None, combine=0,
                contrast=0.0, brightness=0.0):
    blendif = 0
    prm = [0.0] * (4 * bl.BLENDIF_SIZE)
    for i, (lo0, lo1, hi0, hi1) in chans.items():
        blendif |= 1 << i
        prm[4 * i:4 * i + 4] = [lo0, lo1, hi0, hi1]
    if invert_chan is not None:
        blendif |= 1 << (16 + invert_chan)
    return bl.BlendParams(
        mask_mode=bl.MASK_ENABLED | bl.MASK_PARAMETRIC,
        blend_mode=bl.B_NORMAL2, opacity=85.0, blend_cst=cst,
        mask_combine=combine, blendif=blendif,
        blendif_parameters=tuple(prm), contrast=contrast,
        brightness=brightness)


def test_parametric_rgb_gray_and_jz(_fusion_interpret):
    # input gray channel (0) + output Jz channel (8+4=12)
    bp = _blendif_bp(bl.CS_RGB_SCENE,
                     {0: (0.05, 0.15, 0.6, 0.8),
                      12: (0.01, 0.05, 0.3, 0.5)})
    hist = [_P("exposure", exposure=0.6),
            _P("velvia", blend=bp, strength=50.0),
            _P("filmicrgb")]
    _compare(hist)


def test_parametric_rgb_polarity_and_combine(_fusion_interpret):
    bp = _blendif_bp(bl.CS_RGB_SCENE, {1: (0.1, 0.2, 0.7, 0.9)},
                     invert_chan=1, combine=bl.COMBINE_INCL)
    hist = [_P("exposure", exposure=0.4),
            _P("velvia", blend=bp, strength=60.0),
            _P("filmicrgb")]
    _compare(hist)


def test_parametric_rgb_inverted_mask(_fusion_interpret):
    bp = _blendif_bp(bl.CS_RGB_SCENE, {0: (0.1, 0.25, 0.5, 0.75)},
                     combine=bl.COMBINE_INV)
    hist = [_P("exposure", exposure=0.4),
            _P("velvia", blend=bp, strength=60.0),
            _P("filmicrgb")]
    _compare(hist)


def test_parametric_lab_L_and_hue(_fusion_interpret):
    # Lab: input L (0) and input h (9)
    bp = _blendif_bp(bl.CS_LAB, {0: (0.1, 0.2, 0.8, 0.95),
                                 9: (0.2, 0.3, 0.6, 0.7)})
    hist = [_P("exposure", exposure=0.5), _P("filmicrgb"),
            _P("colorize", blend=bp, saturation=0.5, lightness=50.0)]
    # The hue of a neutral pixel is mathematically undefined.  filmicrgb
    # desaturates blown highlights to chroma ~1e-7, so on those pixels
    # (~0.6% of this scene, verified: every outlier has Lab chroma
    # < 1e-5) both paths compute atan2 of float noise and the blendif
    # mask flips arbitrarily — intrinsic to ANY two float
    # implementations (the reference's CPU and OpenCL paths diverge
    # identically there).  Gate on mean + 99th percentile + a bounded
    # outlier count; a wrong channel/polarity still blows all three by
    # orders of magnitude.
    raw, meta, _ = synth_raw(h=192, w=256)
    engine._FORCE_FUSION_INTERPRET = True
    engine._COMPILE_CACHE.clear()
    fused = _render(meta, hist, np.asarray(raw))
    engine._FORCE_FUSION_INTERPRET = False
    engine._COMPILE_CACHE.clear()
    plain = _render(meta, hist, np.asarray(raw))
    d = np.abs(fused - plain)
    assert d.mean() < 1e-3, d.mean()
    assert np.quantile(d, 0.99) < 4e-3, np.quantile(d, 0.99)
    n_out = int((d.max(axis=0) > 4e-3).sum())
    assert n_out < d.shape[1] * d.shape[2] // 64, n_out


def test_mask_tone_curve(_fusion_interpret):
    bp = _blendif_bp(bl.CS_RGB_SCENE, {0: (0.05, 0.2, 0.55, 0.8)},
                     contrast=0.4, brightness=-0.2)
    hist = [_P("exposure", exposure=0.5),
            _P("velvia", blend=bp, strength=50.0),
            _P("filmicrgb")]
    _compare(hist)


# ---- non-fusable blends still take the spatial path ---------------------

def test_spatial_blend_classes_not_fused(_fusion_interpret):
    """Blur-radius and raster blends must keep the spatial path (and the
    raster producer must still materialize its mask for the consumer)."""
    bp_blur = bl.BlendParams(mask_mode=bl.MASK_ENABLED, opacity=60.0,
                             blur_radius=4.0, blend_cst=bl.CS_RGB_SCENE)
    bp_src = bl.BlendParams(
        mask_mode=bl.MASK_ENABLED | bl.MASK_PARAMETRIC,
        blend_mode=bl.B_NORMAL2, opacity=90.0,
        blend_cst=bl.CS_RGB_SCENE, blendif=1,
        blendif_parameters=tuple([0.1, 0.3, 0.6, 0.9]
                                 + [0.0] * (4 * bl.BLENDIF_SIZE - 4)))
    bp_raster = bl.BlendParams(mask_mode=bl.MASK_RASTER, opacity=100.0,
                               blend_cst=bl.CS_RGB_SCENE,
                               raster_mask_source="exposure")
    hist = [
        _P("exposure", blend=bp_src, exposure=0.8),
        _P("velvia", blend=bp_blur, strength=30.0),
        _P("basicadj", blend=bp_raster, brightness=0.2),
        _P("filmicrgb"),
    ]
    _compare(hist)
