"""Backward ROI planning: a history crop shrinks upstream compute.

Reference: `/root/reference/src/develop/dev_pixelpipe.c:564-643`
(modify_roi_in walk) — VERDICT r2 missing #3.
"""

import numpy as np
import pytest

import jax

from ansel_tpu.io.synthetic import synth_raw
from ansel_tpu.ops import base as ops_base
from ansel_tpu.pipeline.engine import HistoryItem, Pipeline


def _run(pipe, raw):
    fn = jax.jit(pipe.trace_fn())
    y = fn(ops_base.pad_to(raw, pipe.spec_in), pipe.coeffs())
    so = pipe.spec_out
    return np.asarray(y)[..., :so.height, :so.width]


def _crop_history(angle=0.0):
    return [
        HistoryItem("demosaic", {"demosaicing_method": 5}),  # RCD
        HistoryItem("exposure", {"exposure": 0.4}),
        # crop to the central quarter (50% linear per axis)
        HistoryItem("clipping", {"cx": 0.25, "cy": 0.25, "cw": 0.75,
                                 "ch": 0.75, "angle": angle}),
        HistoryItem("filmicrgb", {}),
    ]


def test_crop_shrinks_upstream_stages():
    raw, meta, _ = synth_raw(h=480, w=768)
    pipe = Pipeline(meta, _crop_history())
    assert pipe.windowed
    by_name = {s.name: s for s in pipe.stages}
    dem = by_name["demosaic"].plan.spec_in
    # 50% linear crop + halos: demosaic must plan ~a quarter of the
    # frame, not the whole thing
    assert dem.height <= 0.55 * 480 + 48, dem
    assert dem.width <= 0.55 * 768 + 48, dem
    assert dem.is_window
    # raw-chain stages windowed too
    assert by_name["temperature"].plan.spec_in.is_window
    assert by_name["rawprepare"].plan.spec_out.is_window


@pytest.mark.parametrize("angle", [0.0, 7.5])
def test_crop_window_pixels_match_full_pipe(angle):
    raw, meta, _ = synth_raw(h=320, w=512)
    hist = _crop_history(angle)
    pipe_w = Pipeline(meta, hist)
    pipe_f = Pipeline(meta, hist, roi=False)
    assert pipe_w.windowed and not pipe_f.windowed
    out_w = _run(pipe_w, raw)
    out_f = _run(pipe_f, raw)
    assert out_w.shape == out_f.shape
    assert np.isfinite(out_w).all()
    err = np.abs(out_w - out_f)
    assert err.max() < 1e-5, err.max()


def test_explicit_out_window_export():
    """Arbitrary sub-window export: pixels equal the full export's
    window, upstream work shrinks."""
    raw, meta, _ = synth_raw(h=320, w=512)
    hist = [
        HistoryItem("demosaic", {"demosaicing_method": 5}),
        HistoryItem("exposure", {"exposure": 0.4}),
        HistoryItem("filmicrgb", {}),
    ]
    full = Pipeline(meta, hist, roi=False)
    out_full = _run(full, raw)
    win = (96, 128, 120, 256)
    pw = Pipeline(meta, hist, out_window=win)
    assert pw.windowed
    out_win = _run(pw, raw)
    y0, x0, h, w = win
    ref = out_full[:, y0:y0 + h, x0:x0 + w]
    assert out_win.shape == ref.shape
    assert np.abs(out_win - ref).max() < 1e-5


def test_no_crop_pipeline_unchanged():
    raw, meta, _ = synth_raw(h=128, w=256)
    hist = [HistoryItem("exposure", {"exposure": 0.4}),
            HistoryItem("filmicrgb", {})]
    pipe = Pipeline(meta, hist)
    assert not pipe.windowed
    out = _run(pipe, raw)
    assert np.isfinite(out).all()


def _blend_params(**kw):
    from ansel_tpu.pipeline import blend as bm

    base = dict(mask_mode=bm.MASK_ENABLED, blend_cst=0, blend_mode=0,
                blend_parameter=0.0, opacity=70.0)
    base.update(kw)
    return bm.BlendParams(**base)


def test_blended_stage_windows_and_matches():
    """Blend-aware backward ROI (VERDICT r3 #6): a stage with an active
    drawn-mask + feathered blend no longer forces full-frame upstream,
    and the windowed pixels equal the full render's window."""
    from ansel_tpu.pipeline import masks as mm

    raw, meta, _ = synth_raw(h=320, w=512)
    # a drawn circle mask (normalized coords) on exposure
    form = mm.Form(id=7, type=mm.MASK_CIRCLE,
                   nodes=[(0.5, 0.5, 0.22, 0.08)])
    forms = {7: form}
    hist = [
        HistoryItem("demosaic", {"demosaicing_method": 5}),
        HistoryItem("exposure", {"exposure": 0.9},
                    blend_params=_blend_params(
                        mask_mode=3,  # ENABLED | SHAPE
                        mask_id=7, feathering_radius=4.0,
                        blur_radius=2.0)),
        HistoryItem("filmicrgb", {}),
    ]
    win = (96, 128, 120, 256)
    pipe_w = Pipeline(meta, hist, forms=forms, out_window=win)
    pipe_f = Pipeline(meta, hist, forms=forms, roi=False)
    assert pipe_w.windowed
    by_name = {s.name: s for s in pipe_w.stages}
    # the blended exposure stage must be windowed, and demosaic above it
    assert by_name["exposure"].plan.spec_in.is_window
    assert by_name["demosaic"].plan.spec_in.is_window
    out_w = _run(pipe_w, raw)
    out_f = _run(pipe_f, raw)
    y0, x0, h, w = win
    ref = out_f[:, y0:y0 + h, x0:x0 + w]
    assert out_w.shape == ref.shape
    assert np.abs(out_w - ref).max() < 1e-5


def test_raster_consumer_still_full_frame():
    """A RASTER-source blend must keep forcing full-frame upstream
    (side-band buffers carry the producer's window geometry)."""
    from ansel_tpu.pipeline import blend as bm
    from ansel_tpu.pipeline import masks as mm

    raw, meta, _ = synth_raw(h=192, w=256)
    form = mm.Form(id=3, type=mm.MASK_CIRCLE,
                   nodes=[(0.5, 0.5, 0.3, 0.1)])
    forms = {3: form}
    hist = [
        HistoryItem("demosaic", {"demosaicing_method": 5}),
        HistoryItem("exposure", {"exposure": 0.5},
                    blend_params=_blend_params(mask_mode=3, mask_id=3)),
        HistoryItem("clipping", {"cx": 0.25, "cy": 0.25, "cw": 0.75,
                                 "ch": 0.75}),
        HistoryItem("vibrance", {},
                    blend_params=_blend_params(
                        mask_mode=bm.MASK_ENABLED | bm.MASK_RASTER,
                        raster_mask_source="exposure")),
        HistoryItem("filmicrgb", {}),
    ]
    pipe = Pipeline(meta, hist, forms=forms)
    by_name = {s.name: s for s in pipe.stages}
    # the raster consumer and everything upstream stays full-frame
    assert not by_name["vibrance"].plan.spec_in.is_window
    assert not by_name["exposure"].plan.spec_in.is_window
    out = _run(pipe, raw)
    assert np.isfinite(out).all()
