"""Engine pointwise fusion: the fused Pallas chain (interpret mode on CPU)
must match the per-op path bit-for-bit-ish."""

import dataclasses

import numpy as np
import pytest

from ansel_tpu import HistoryItem
from ansel_tpu.core.params import params_class
from ansel_tpu.io.synthetic import synth_raw
from ansel_tpu.pipeline import engine


def _P(op, **kw):
    p = params_class(op)()
    if kw:
        p = dataclasses.replace(p, **kw)
    return HistoryItem(op, params=p)


@pytest.fixture
def _fusion_interpret():
    engine._FORCE_FUSION_INTERPRET = True
    engine._COMPILE_CACHE.clear()
    yield
    engine._FORCE_FUSION_INTERPRET = False
    engine._COMPILE_CACHE.clear()


def _render(meta, hist, raw):
    pipe = engine.CompiledPipe(engine.Pipeline(meta, hist))
    return np.asarray(pipe.output_array(raw))


def test_fused_chain_matches_per_op(_fusion_interpret):
    raw, meta, _ = synth_raw(h=192, w=256)
    hist = [
        _P("graduatednd", density=1.5, rotation=15.0),
        _P("exposure", exposure=0.5),
        _P("channelmixerrgb"),
        _P("colorbalancergb", shadows_C=0.05, contrast=0.1),
        _P("filmicrgb"),
        _P("colorcontrast", a_steepness=1.4),
        _P("velvia", strength=25.0),
        _P("vignette", brightness=-0.5),
    ]
    fused = _render(meta, hist, np.asarray(raw))
    engine._FORCE_FUSION_INTERPRET = False
    engine._COMPILE_CACHE.clear()
    plain = _render(meta, hist, np.asarray(raw))
    d = np.abs(fused - plain)
    assert d.mean() < 1e-5, d.mean()
    assert d.max() < 5e-3, d.max()  # PQ-pow tails


def test_fused_curve_family_matches_per_op(_fusion_interpret):
    """The curve/level family (SMEM knot lists) through the fused chain."""
    raw, meta, _ = synth_raw(h=192, w=256)
    curve3 = ([0.0, 0.05, 0.4, 0.55, 1.0, 0.98] + [0.0] * 34) * 3
    hist = [
        _P("profile_gamma", mode=1, linear=0.1, gamma=0.45),
        _P("exposure", exposure=0.4),
        _P("basecurve", basecurve=tuple(
            ([0.0, 0.0, 0.3, 0.4, 1.0, 1.0] + [0.0] * 34) * 3),
            basecurve_nodes=(3, 0, 0), preserve_colors=1),
        _P("rgbcurve", curve_nodes=tuple(curve3), curve_num_nodes=(3, 3, 3),
           preserve_colors=1),
        _P("rgblevels", levels=(0.02, 0.45, 0.95) * 3),
        _P("colorbalance", lift=(1.0, 1.02, 1.0, 0.98),
           gain=(1.1, 1.0, 1.05, 1.0), saturation=1.2, contrast=1.1),
        _P("filmicrgb", version=2),   # spline v3 color science
        _P("filmicrgb", version=3),   # v4 Ych gamut-mapped science
        _P("tonecurve", tonecurve=tuple(
            ([0.0, 0.02, 0.5, 0.55, 1.0, 1.0] + [0.0] * 34) * 3),
            tonecurve_nodes=(3, 3, 3)),
        _P("colorzones", curve=tuple(
            ([0.0, 0.5, 0.3, 0.62, 1.0, 0.5] + [0.0] * 34) * 3),
            curve_num_nodes=(3, 3, 3), strength=20.0),
        _P("colorize", saturation=0.3, lightness=60.0),
        _P("levels", levels=(0.02, 0.48, 0.98)),
        _P("colisa", contrast=0.2, brightness=0.1, saturation=0.15),
        _P("colorcorrection", saturation=1.5, hia=10.0, hib=-5.0),
        _P("vibrance", amount=40.0),
        _P("lowlight", blueness=20.0),
        _P("splittoning", shadow_saturation=0.6, highlight_hue=0.6),
    ]
    fused = _render(meta, hist, np.asarray(raw))
    engine._FORCE_FUSION_INTERPRET = False
    engine._COMPILE_CACHE.clear()
    plain = _render(meta, hist, np.asarray(raw))
    d = np.abs(fused - plain)
    assert d.mean() < 1e-5, d.mean()
    assert d.max() < 5e-3, d.max()


def test_blend_breaks_fusion_run(_fusion_interpret):
    from ansel_tpu.pipeline import blend as bl

    raw, meta, _ = synth_raw(h=192, w=256)
    bp = bl.BlendParams(mask_mode=bl.MASK_ENABLED, opacity=50.0)
    hist = [
        _P("exposure", exposure=1.0),
        HistoryItem("velvia", params=dataclasses.replace(
            params_class("velvia")(), strength=40.0), blend_params=bp),
        _P("filmicrgb"),
    ]
    fused = _render(meta, hist, np.asarray(raw))
    engine._FORCE_FUSION_INTERPRET = False
    engine._COMPILE_CACHE.clear()
    plain = _render(meta, hist, np.asarray(raw))
    assert np.abs(fused - plain).mean() < 1e-5
