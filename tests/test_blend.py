"""Blending engine tests: params codec, blend modes, parametric masks."""

import numpy as np
import pytest

from ansel_tpu.pipeline import blend as B


def _bp(**kw):
    return B.BlendParams(**kw)


def test_blend_params_codec_roundtrip():
    bp = _bp(mask_mode=B.MASK_ENABLED, blend_mode=B.B_MULTIPLY,
             opacity=70.0, blendif=0x5,
             blendif_parameters=tuple(np.linspace(0, 1, 64)))
    raw = B.BlendParams.codec.encode(bp)
    q = B.BlendParams.codec.decode(raw)
    assert q.blend_mode == B.B_MULTIPLY
    assert abs(q.opacity - 70.0) < 1e-6
    assert abs(q.blendif_parameters[10] - bp.blendif_parameters[10]) < 1e-6


def test_uniform_opacity_lerp():
    a = np.full((3, 16, 128), 0.2, np.float32)
    b = np.full((3, 16, 128), 0.6, np.float32)
    bp = _bp(mask_mode=B.MASK_ENABLED, blend_mode=B.B_NORMAL2, opacity=50.0)
    prm = B.prepare_parameters(bp)
    out = np.asarray(B.apply_blend(a, b, bp, prm, B.CS_RGB_SCENE,
                                   [0.25, 0.5, 0.25]))
    assert np.allclose(out, 0.4, atol=1e-6)


@pytest.mark.parametrize("mode,expected", [
    (B.B_MULTIPLY, 0.2 * 0.6),
    (B.B_ADD, 0.8),
    (B.B_SCREEN, 1.0 - 0.8 * 0.4),
    (B.B_LIGHTEN, 0.6),
    (B.B_DARKEN, 0.2),
    (B.B_GEOMETRIC_MEAN, np.sqrt(0.12)),
])
def test_blend_modes(mode, expected):
    a = np.full((3, 16, 128), 0.2, np.float32)
    b = np.full((3, 16, 128), 0.6, np.float32)
    bp = _bp(mask_mode=B.MASK_ENABLED, blend_mode=mode, opacity=100.0)
    out = np.asarray(B.apply_blend(a, b, bp, B.prepare_parameters(bp),
                                   B.CS_RGB_SCENE, [0.25, 0.5, 0.25]))
    assert np.allclose(out, expected, atol=1e-5), out.mean()


def test_parametric_mask_limits_to_bright_input():
    h, w = 16, 128
    a = np.zeros((3, h, w), np.float32)
    a[:, :, : w // 2] = 0.1   # dark half
    a[:, :, w // 2:] = 0.8    # bright half
    b = np.full((3, h, w), 0.5, np.float32)
    # enable gray-input channel (bit 0): trapezoid selecting > 0.4
    params = [0.0] * 64
    params[0:4] = [0.3, 0.4, 1.0, 1.0]
    bp = _bp(mask_mode=B.MASK_ENABLED | B.MASK_PARAMETRIC,
             blend_mode=B.B_NORMAL2, opacity=100.0, blendif=1,
             blendif_parameters=tuple(params))
    out = np.asarray(B.apply_blend(a, b, bp, B.prepare_parameters(bp),
                                   B.CS_RGB_SCENE, [1 / 3, 1 / 3, 1 / 3]))
    assert np.allclose(out[:, :, : w // 2], 0.1, atol=1e-5)   # untouched
    assert np.allclose(out[:, :, w // 2:], 0.5, atol=1e-4)    # blended


def test_mask_combine_inversion():
    a = np.full((3, 8, 128), 0.2, np.float32)
    b = np.full((3, 8, 128), 0.6, np.float32)
    bp = _bp(mask_mode=B.MASK_ENABLED, blend_mode=B.B_NORMAL2,
             opacity=100.0, mask_combine=B.COMBINE_INV)
    out = np.asarray(B.apply_blend(a, b, bp, B.prepare_parameters(bp),
                                   B.CS_RGB_SCENE, [1 / 3] * 3))
    assert np.allclose(out, 0.2, atol=1e-6)  # inverted mask -> no effect


def test_blend_in_pipeline_via_history():
    from ansel_tpu import HistoryItem
    from ansel_tpu.io.synthetic import synth_raw
    from ansel_tpu.pipeline.engine import Pipeline
    from ansel_tpu.ops import base as ob
    import jax

    raw, meta, _ = synth_raw(h=64, w=128)
    bp = _bp(mask_mode=B.MASK_ENABLED, blend_mode=B.B_NORMAL2, opacity=50.0)
    hist = [
        HistoryItem("exposure", {"exposure": 2.0},
                    blend_params=B.BlendParams.codec.encode(bp)),
        HistoryItem("demosaic", {"demosaicing_method": 0}),
    ]
    pipe = Pipeline(meta, hist)
    st = next(s for s in pipe.stages if s.name == "exposure")
    assert st.blend is not None
    fn = jax.jit(pipe.trace_fn())
    out = np.asarray(fn(ob.pad_to(raw, pipe.spec_in), pipe.coeffs()))

    hist2 = [HistoryItem("exposure", {"exposure": 2.0}),
             HistoryItem("demosaic", {"demosaicing_method": 0})]
    pipe2 = Pipeline(meta, hist2)
    fn2 = jax.jit(pipe2.trace_fn())
    out2 = np.asarray(fn2(ob.pad_to(raw, pipe2.spec_in), pipe2.coeffs()))
    # 50% opacity must land between no-exposure and full-exposure
    assert out.mean() < out2.mean()
    assert out.mean() > 0.5 * out2.mean()

def test_raster_mask_side_band():
    """One module's blend mask feeds another's RASTER blend
    (pixelpipe_raster_masks.c semantics)."""
    import jax

    from ansel_tpu import HistoryItem
    from ansel_tpu.io.synthetic import synth_raw
    from ansel_tpu.ops import base as ob
    from ansel_tpu.pipeline.engine import Pipeline

    raw, meta, _ = synth_raw(h=64, w=128)
    # source: exposure with a parametric mask on bright input
    params = [0.0] * 64
    base = 4 * 0  # input channel 0 (g/L), 4 floats per channel
    params[base:base + 4] = [0.4, 0.5, 1.0, 1.0]
    src_bp = _bp(mask_mode=B.MASK_ENABLED | B.MASK_PARAMETRIC,
                 blend_mode=B.B_NORMAL2, opacity=100.0,
                 blendif=(1 << 0), blendif_parameters=tuple(params))
    # consumer: vibrance blended through exposure's raster mask
    dst_bp = _bp(mask_mode=B.MASK_ENABLED | B.MASK_RASTER,
                 blend_mode=B.B_NORMAL2, opacity=100.0,
                 raster_mask_source="exposure", raster_mask_instance=0)
    hist = [
        HistoryItem("demosaic", {"demosaicing_method": 0}),
        HistoryItem("exposure", {"exposure": 1.0},
                    blend_params=B.BlendParams.codec.encode(src_bp)),
        HistoryItem("vibrance", {"amount": 80.0},
                    blend_params=B.BlendParams.codec.encode(dst_bp)),
    ]
    pipe = Pipeline(meta, hist)
    fn = jax.jit(pipe.trace_fn())
    out = np.asarray(fn(ob.pad_to(raw, pipe.spec_in), pipe.coeffs()))
    assert np.isfinite(out).all()

    # inverted raster must differ
    dst_inv = _bp(mask_mode=B.MASK_ENABLED | B.MASK_RASTER,
                  blend_mode=B.B_NORMAL2, opacity=100.0,
                  raster_mask_source="exposure", raster_mask_invert=1)
    hist[2] = HistoryItem("vibrance", {"amount": 80.0},
                          blend_params=B.BlendParams.codec.encode(dst_inv))
    pipe2 = Pipeline(meta, hist)
    fn2 = jax.jit(pipe2.trace_fn())
    out2 = np.asarray(fn2(ob.pad_to(raw, pipe2.spec_in), pipe2.coeffs()))
    assert not np.allclose(out, out2)


def test_raster_mask_missing_source_fails_loudly():
    import pytest

    from ansel_tpu import HistoryItem
    from ansel_tpu.io.synthetic import synth_raw
    from ansel_tpu.ops import base as ob
    from ansel_tpu.pipeline.engine import Pipeline

    raw, meta, _ = synth_raw(h=64, w=128)
    dst_bp = _bp(mask_mode=B.MASK_ENABLED | B.MASK_RASTER,
                 blend_mode=B.B_NORMAL2, opacity=100.0,
                 raster_mask_source="toneequal")
    hist = [HistoryItem("demosaic", {"demosaicing_method": 0}),
            HistoryItem("vibrance", {"amount": 50.0},
                        blend_params=B.BlendParams.codec.encode(dst_bp))]
    pipe = Pipeline(meta, hist)
    with pytest.raises(RuntimeError, match="raster mask source"):
        pipe.trace_fn()(ob.pad_to(raw, pipe.spec_in), pipe.coeffs())


def test_details_slider_refines_mask():
    """blend 'details' uses the demosaic raw-detail plane
    (blend.c:_refine_with_detail_mask)."""
    import jax

    from ansel_tpu import HistoryItem
    from ansel_tpu.io.synthetic import synth_raw
    from ansel_tpu.ops import base as ob
    from ansel_tpu.pipeline.engine import Pipeline

    raw, meta, _ = synth_raw(h=64, w=128)
    for details in (0.0, 0.9, -0.9):
        bp = _bp(mask_mode=B.MASK_ENABLED, blend_mode=B.B_NORMAL2,
                 opacity=100.0, details=details)
        hist = [HistoryItem("demosaic", {"demosaicing_method": 0}),
                HistoryItem("exposure", {"exposure": 2.0},
                            blend_params=B.BlendParams.codec.encode(bp))]
        pipe = Pipeline(meta, hist)
        fn = jax.jit(pipe.trace_fn())
        out = np.asarray(fn(ob.pad_to(raw, pipe.spec_in), pipe.coeffs()))
        assert np.isfinite(out).all()
        if details == 0.0:
            full = out
        else:
            # a detail-restricted mask must blend less than a full mask
            assert out.mean() != full.mean()
