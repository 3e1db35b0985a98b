"""End-to-end pipeline tests: synthetic raw -> full default pipe -> display
RGB, with scene-truth comparison (the hermetic analog of the reference's
ansel-cli golden-image integration suite)."""

import numpy as np
import pytest

from ansel_tpu import HistoryItem, compile_pipeline
from ansel_tpu.core.types import Colorspace
from ansel_tpu.io.synthetic import synth_raw


def _default_history():
    return [
        HistoryItem("filmicrgb", {}),
        HistoryItem("exposure", {"exposure": 0.5}),
    ]


def test_pipeline_plans_mandatory_modules(synth_small):
    raw, meta, scene = synth_small
    pipe = compile_pipeline(meta, _default_history())
    names = [s.name for s in pipe.pipe.stages]
    assert names == ["rawprepare", "temperature", "highlights", "demosaic",
                     "exposure", "colorin", "filmicrgb", "colorout"]
    assert pipe.pipe.spec_out.colorspace is Colorspace.DISPLAY_RGB


def test_pipeline_end_to_end(synth_small):
    raw, meta, scene = synth_small
    pipe = compile_pipeline(meta, _default_history())
    out = pipe.output_array(raw)
    assert out.shape == (3, meta.height, meta.width)
    assert np.isfinite(out).all()
    assert out.min() >= 0.0 and out.max() <= 1.0
    # the specular patch must render bright, shadows dark
    assert out[:, 4:12, 4:12].mean() > 0.85
    assert out.mean() > 0.05


def test_pipeline_recovers_scene_chromaticity(synth_small):
    """With WB+colorin undoing the synthetic camera simulation, the
    work-RGB image right before filmic must match the rendered scene."""
    raw, meta, scene = synth_small
    pipe = compile_pipeline(meta, [])  # mandatory modules only
    out = pipe.output_array(raw)  # display sRGB of pass-through pipe
    # rebuild the expected: scene (work rgb) -> srgb matrix+trc, highlights
    # clipping at 1.0/wb limits tolerance to unclipped regions
    from ansel_tpu.color import matrices as cm
    from ansel_tpu.color.transforms import srgb_encode
    import jax.numpy as jnp

    M = cm.rgb_to_rgb_matrix("rec2020", "srgb")
    expected = np.asarray(
        srgb_encode(jnp.clip(jnp.einsum("dc,chw->dhw", jnp.asarray(M, jnp.float32),
                                        jnp.asarray(scene)), 0.0, 1.0))
    )
    # exclude pixels clipped in CAMERA space: the sensor saturates per
    # camera channel (after WB) at the highlights threshold, which is real
    # pipeline behavior, not error
    from ansel_tpu.io.synthetic import DEFAULT_CAM_TO_XYZ

    cam_from_work = np.linalg.inv(cm.normalized_cam_to_work(DEFAULT_CAM_TO_XYZ))
    cam = np.einsum("dc,chw->dhw", cam_from_work, scene)
    sel = (cam.max(axis=0) < 0.95) & (cam.min(axis=0) > 0.005)
    border = 8
    sel[:border] = sel[-border:] = False
    sel[:, :border] = sel[:, -border:] = False
    err = np.abs(out - expected).max(axis=0)[sel]
    assert np.quantile(err, 0.99) < 0.02, np.quantile(err, 0.99)


def test_param_edit_does_not_recompile(synth_small):
    raw, meta, scene = synth_small
    from ansel_tpu.pipeline import engine

    pipe1 = compile_pipeline(meta, _default_history())
    n = len(engine._COMPILE_CACHE)
    pipe2 = compile_pipeline(meta, [
        HistoryItem("filmicrgb", {}),
        HistoryItem("exposure", {"exposure": 1.5}),
    ])
    assert len(engine._COMPILE_CACHE) == n
    assert pipe1._fn is pipe2._fn
    a = pipe1.output_array(raw)
    b = pipe2.output_array(raw)
    assert not np.allclose(a, b)  # the edit did change the render


def test_disabled_op_skipped(synth_small):
    raw, meta, scene = synth_small
    pipe = compile_pipeline(meta, [HistoryItem("filmicrgb", {}, enabled=False)])
    names = [s.name for s in pipe.pipe.stages]
    assert "filmicrgb" not in names


def test_unknown_op_reported(synth_small):
    raw, meta, scene = synth_small
    from ansel_tpu.pipeline.engine import Pipeline

    p = Pipeline(meta, [HistoryItem("not_a_real_module", {"x": 1})])
    assert any("not_a_real_module" in u for u in p.unsupported)


def test_iop_order_tables_select_by_version():
    """legacy/v30/v30-jpg order tables (iop_order.c:97-417) change the
    stack ordering."""
    from ansel_tpu.core import order as om

    # colorin sits at 27 in legacy, 28 in v30
    assert om.default_order("colorin", om.ORDER_LEGACY) == 27.0
    assert om.default_order("colorin", om.ORDER_V30) == 28.0
    # v30-jpg hoists color ops before the tone stack
    assert om.default_order("basecurve", om.ORDER_V30_JPG) == 44.0
    # every table covers every registered op (no 999 fallbacks)
    from ansel_tpu.ops import base as ob

    gui_only = {"basebuffer", "overexposed", "rawoverexposed",
                "equalizer", "initialscale", "detailmask", "tonemap"}
    for ver, table in om.TABLES.items():
        names = {n for _, n in table}
        for op in ob.all_ops():
            if op in gui_only:
                continue
            assert op in names, (ver, op)


def test_pipe_types_thumbnail_fast_demosaic():
    """PREVIEW/THUMBNAIL pipes force fast demosaic like the reference's
    preview pixelpipes (dev_pixelpipe.h pipe kinds)."""
    from ansel_tpu.pipeline.engine import Pipeline, PipeType

    raw, meta, _ = synth_raw(h=96, w=128)
    hist = [HistoryItem("demosaic", {"demosaicing_method": 5})]
    full = Pipeline(meta, hist, pipe_type=PipeType.EXPORT)
    thumb = Pipeline(meta, hist, scale=0.25,
                     pipe_type=PipeType.THUMBNAIL)
    get = lambda p: next(s for s in p.stages if s.name == "demosaic")
    assert get(full).plan.static[0] == 5
    assert get(thumb).plan.static[0] == 0  # PPG override
    assert "initialscale" in [s.name for s in thumb.stages]


def test_segmented_compile_matches_monolithic():
    """Long histories compile as chained XLA programs; output must be
    identical, including the raster-mask side-band across the cut."""
    import numpy as np

    from ansel_tpu.core import conf
    from ansel_tpu.pipeline import engine
    from ansel_tpu.pipeline.engine import compile_pipeline

    raw, meta, _ = synth_raw(h=96, w=128)
    hist = [
        HistoryItem("exposure", {"exposure": 0.4}),
        HistoryItem("colorbalancergb", {}),
        HistoryItem("sharpen", {}),
        HistoryItem("vibrance", {"amount": 30.0}),
        HistoryItem("velvia", {}),
        HistoryItem("soften", {}),
    ]
    try:
        conf.set("pipe.max_stages_per_jit", 0)
        y1 = compile_pipeline(meta, hist).output_array(raw)
        conf.set("pipe.max_stages_per_jit", 4)
        engine._COMPILE_CACHE.clear()
        y2 = compile_pipeline(meta, hist).output_array(raw)
    finally:
        conf.set("pipe.max_stages_per_jit", 32)
        engine._COMPILE_CACHE.clear()
    # XLA fuses differently across the segment cut -> last-ulp drift only
    assert np.allclose(y1, y2, atol=2e-5)
