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
