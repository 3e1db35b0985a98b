"""Blend-mode tail: HSV/HSL hue-color family + RAW blend colorspace.

References: `/root/reference/src/develop/blends/blendif_rgb_hsl.c:660-890`
(HSL hue/color/coloradjust, HSV value/color),
`blendif_lab.c:874-977` (LCh variants), `blendif_raw.c` (raw space:
drawn mask + opacity, elementwise modes).  VERDICT r2 missing #6.
"""

import colorsys

import numpy as np
import pytest

import jax.numpy as jnp

from ansel_tpu.pipeline import blend as bm


def _rgb(seed, shape=(3, 8, 16)):
    return np.random.default_rng(seed).random(shape).astype(np.float32)


def _ref_hsl_blend(a, b, mode, op):
    """Scalar transcription of blendif_rgb_hsl.c for one pixel."""
    out = np.empty_like(a)
    for i in range(a.shape[1]):
        for j in range(a.shape[2]):
            ra = np.clip(a[:, i, j], 0, 1)
            rb = np.clip(b[:, i, j], 0, 1)
            ha, la_, sa = colorsys.rgb_to_hls(*ra)
            hb, lb_, sb = colorsys.rgb_to_hls(*rb)
            d = abs(ha - hb)
            s = -op * (1 - d) / d if d > 0.5 else op
            hc = ((ha * (1 - s)) + hb * s + 1.0) % 1.0
            if mode == bm.B_HUE:
                hh, ll, ss = hc, la_, sa
            elif mode == bm.B_COLOR:
                hh, ll, ss = hc, la_, sa * (1 - op) + sb * op
            else:  # COLORADJUST
                hh, ll, ss = hc, lb_, sa * (1 - op) + sb * op
            out[:, i, j] = np.clip(colorsys.hls_to_rgb(hh, ll, ss), 0, 1)
    return out


@pytest.mark.parametrize("mode", [bm.B_HUE, bm.B_COLOR, bm.B_COLORADJUST])
def test_hsl_family_matches_scalar_reference(mode):
    a, b = _rgb(0), _rgb(1)
    op = 0.7
    got = np.asarray(bm._blend_hue_family(
        jnp.asarray(a), jnp.asarray(b), mode, bm.CS_RGB_SCENE,
        jnp.full((1,) + a.shape[1:], op)))
    want = _ref_hsl_blend(a, b, mode, op)
    assert np.abs(got - want).max() < 1e-4


def test_hsv_value_blend():
    a, b = _rgb(2), _rgb(3)
    op = 0.6
    got = np.asarray(bm._blend_hue_family(
        jnp.asarray(a), jnp.asarray(b), bm.B_HSV_VALUE, bm.CS_RGB_SCENE,
        jnp.full((1,) + a.shape[1:], op)))
    for i in range(3):
        for j in range(5):
            ha, sa, va = colorsys.rgb_to_hsv(*a[:, i, j])
            _, _, vb = colorsys.rgb_to_hsv(*b[:, i, j])
            want = colorsys.hsv_to_rgb(ha, sa, va * (1 - op) + vb * op)
            assert np.abs(got[:, i, j] - want).max() < 1e-4


def test_hsv_color_blend_cartesian_hue():
    a, b = _rgb(4), _rgb(5)
    op = 0.5
    got = np.asarray(bm._blend_hue_family(
        jnp.asarray(a), jnp.asarray(b), bm.B_HSV_COLOR, bm.CS_RGB_SCENE,
        jnp.full((1,) + a.shape[1:], op)))
    i, j = 2, 7
    ha, sa, va = colorsys.rgb_to_hsv(*a[:, i, j])
    hb, sb, vb = colorsys.rgb_to_hsv(*b[:, i, j])
    xa, ya = sa * np.cos(2 * np.pi * ha), sa * np.sin(2 * np.pi * ha)
    xb, yb = sb * np.cos(2 * np.pi * hb), sb * np.sin(2 * np.pi * hb)
    xc, yc = xa * (1 - op) + xb * op, ya * (1 - op) + yb * op
    hc = (np.arctan2(yc, xc) / (2 * np.pi)) % 1.0
    want = colorsys.hsv_to_rgb(hc, np.hypot(xc, yc), va)
    assert np.abs(got[:, i, j] - want).max() < 1e-4


def test_lab_hue_preserves_lightness_chroma():
    lab_a = np.stack([np.full((4, 8), 60.0),
                      np.full((4, 8), 30.0), np.full((4, 8), 10.0)])
    lab_b = np.stack([np.full((4, 8), 30.0),
                      np.full((4, 8), -20.0), np.full((4, 8), 25.0)])
    got = np.asarray(bm._blend_hue_family(
        jnp.asarray(lab_a, jnp.float32), jnp.asarray(lab_b, jnp.float32),
        bm.B_HUE, bm.CS_LAB, jnp.full((1, 4, 8), 1.0)))
    # full opacity hue blend: L and C from input, hue from output
    assert np.allclose(got[0], 60.0, atol=1e-3)
    c_in = np.hypot(30.0, 10.0)
    assert np.allclose(np.hypot(got[1], got[2]), c_in, atol=1e-2)
    h_out = np.arctan2(25.0, -20.0)
    assert np.allclose(np.arctan2(got[2], got[1]), h_out, atol=1e-3)


def test_raw_blend_space_runs_in_pipeline():
    """A blend on a RAW-domain op (mask + opacity) must engage, not be
    skipped (blend.h:57 CS_RAW)."""
    import jax

    from ansel_tpu.io.synthetic import synth_raw
    from ansel_tpu.ops import base as ops_base
    from ansel_tpu.pipeline.engine import HistoryItem, Pipeline

    raw, meta, _ = synth_raw(h=96, w=128)
    bp50 = bm.BlendParams(mask_mode=bm.MASK_ENABLED, blend_mode=bm.B_NORMAL2,
                          opacity=50.0, blend_cst=bm.CS_RAW)
    hist_b = [HistoryItem("exposure", {"exposure": 1.5}),
              HistoryItem("rawdenoise", {"threshold": 0.5},
                          blend_params=bp50),
              HistoryItem("filmicrgb", {})]
    hist_full = [HistoryItem("exposure", {"exposure": 1.5}),
                 HistoryItem("rawdenoise", {"threshold": 0.5}),
                 HistoryItem("filmicrgb", {})]
    hist_off = [HistoryItem("exposure", {"exposure": 1.5}),
                HistoryItem("filmicrgb", {})]

    def run(hist):
        p = Pipeline(meta, hist)
        fn = jax.jit(p.trace_fn())
        return np.asarray(fn(ops_base.pad_to(raw, p.spec_in), p.coeffs()))

    out_b = run(hist_b)
    out_full = run(hist_full)
    out_off = run(hist_off)
    # the blended result must sit strictly between off and full
    d_full = np.abs(out_b - out_full).mean()
    d_off = np.abs(out_b - out_off).mean()
    assert np.isfinite(out_b).all()
    assert d_full > 1e-7 and d_off > 1e-7
    # 50% opacity: roughly halfway
    assert np.abs(out_b - 0.5 * (out_full + out_off)).mean() < 5e-3
