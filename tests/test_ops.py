"""Per-op unit tests against numpy mirrors (reference test style:
tests/unittests/iop/* — deterministic synthetic inputs, exact expectations)."""

import numpy as np
import pytest

from ansel_tpu.core.types import CFAPattern, Colorspace, ImageSpec, RawMeta
from ansel_tpu.ops import base as ob
from ansel_tpu.ops.exposure import Exposure, ExposureParams
from ansel_tpu.ops.highlights import Highlights, HighlightsParams
from ansel_tpu.ops.rawprepare import RawPrepare, RawPrepareParams
from ansel_tpu.ops.temperature import Temperature, TemperatureParams


def _ctx(meta=None):
    return ob.PlanContext(meta=meta or RawMeta(width=128, height=64))


def _raw_spec(w=128, h=64, cfa=CFAPattern.RGGB):
    return ImageSpec(width=w, height=h, colorspace=Colorspace.RAW,
                     channels=1, cfa=cfa)


def test_rawprepare_black_white(rng):
    meta = RawMeta(width=128, height=64, black_levels=(512, 513, 514, 515),
                   white_point=15000)
    op = RawPrepare()
    p = RawPrepareParams(raw_black_level_separate=(512, 513, 514, 515),
                         raw_white_point=15000)
    ctx = _ctx(meta)
    spec = _raw_spec()
    plan = op.plan(ctx, spec, p)
    c = op.coeffs(ctx, plan, p)
    raw = rng.uniform(0, 15000, (64, 128)).astype(np.float32)
    out = np.asarray(op.apply(raw, c, plan, ctx))[:64, :128]
    sub = np.array([[512, 513], [514, 515]], np.float32)
    expected = (raw - np.tile(sub, (32, 64))) / (15000 - np.tile(sub, (32, 64)))
    assert np.allclose(out, expected, atol=1e-6)


def test_rawprepare_crop_shifts_cfa():
    meta = RawMeta(width=128, height=64)
    op = RawPrepare()
    p = RawPrepareParams(x=1, y=1, width=1, height=1,
                         raw_black_level_separate=(0, 0, 0, 0),
                         raw_white_point=100)
    ctx = _ctx(meta)
    plan = op.plan(ctx, _raw_spec(), p)
    assert plan.spec_out.width == 126 and plan.spec_out.height == 62
    assert plan.spec_out.cfa is CFAPattern.BGGR
    raw = np.arange(64 * 128, dtype=np.float32).reshape(64, 128)
    c = op.coeffs(ctx, plan, p)
    out = np.asarray(op.apply(raw, c, plan, ctx))
    assert out[0, 0] == raw[1, 1] / 100.0


def test_temperature_bayer(rng):
    meta = RawMeta(width=128, height=64)
    op = Temperature()
    p = TemperatureParams(red=2.0, green=1.0, blue=1.5, g2=1.1)
    ctx = _ctx(meta)
    spec = _raw_spec()
    plan = op.plan(ctx, spec, p)
    c = op.coeffs(ctx, plan, p)
    raw = rng.uniform(0, 1, spec.array_shape).astype(np.float32)
    out = np.asarray(op.apply(raw, c, plan, ctx))
    # RGGB: (0,0)=R*2, (0,1)=G*1, (1,0)=G2*1.1, (1,1)=B*1.5
    assert np.allclose(out[0, 0], raw[0, 0] * 2.0)
    assert np.allclose(out[0, 1], raw[0, 1] * 1.0)
    assert np.allclose(out[1, 0], raw[1, 0] * 1.1, rtol=1e-6)
    assert np.allclose(out[1, 1], raw[1, 1] * 1.5)
    assert ctx.processed_maximum == (2.0, 1.0, 1.5)


def test_temperature_nan_g2_falls_back_to_green():
    op = Temperature()
    p = TemperatureParams(red=2.0, green=1.3, blue=1.5, g2=float("nan"))
    assert op._commit(p)[3] == 1.3


def test_highlights_clip():
    meta = RawMeta(width=128, height=64)
    op = Highlights()
    ctx = _ctx(meta)
    ctx.processed_maximum = (2.0, 1.0, 1.5)
    p = HighlightsParams(clip=0.9)
    spec = _raw_spec()
    plan = op.plan(ctx, spec, p)
    c = op.coeffs(ctx, plan, p)
    x = np.linspace(0, 3, 64 * 128, dtype=np.float32).reshape(64, 128)
    out = np.asarray(op.apply(x, c, plan, ctx))
    assert out.max() == pytest.approx(0.9 * 1.0)
    assert ctx.processed_maximum == (0.9, 0.9, 0.9)


def test_exposure_matches_reference_formula(rng):
    meta = RawMeta(width=128, height=64, exposure_bias=1.0)
    op = Exposure()
    ctx = _ctx(meta)
    p = ExposureParams(black=-0.01, exposure=1.5)
    spec = _raw_spec()
    plan = op.plan(ctx, spec, p)
    c = op.coeffs(ctx, plan, p)
    x = rng.uniform(0, 1, (8, 128)).astype(np.float32)
    out = np.asarray(op.apply(x, c, plan, ctx))
    scale = 1.0 / (2.0 ** (-1.5) - (-0.01))
    assert np.allclose(out, (x + 0.01) * scale, rtol=1e-6)


def test_exposure_bias_compensation():
    meta = RawMeta(width=128, height=64, exposure_bias=1.0)
    op = Exposure()
    p = ExposureParams(exposure=1.0, compensate_exposure_bias=1)
    # effective exposure = 0 -> scale 1
    assert op._scale(_ctx(meta), p) == pytest.approx(1.0)


def test_gaussian_iir_matches_dense_fir():
    """Deriche IIR (pixel/gaussian.c mirror) ~= dense Gaussian, interior."""
    import jax.numpy as jnp

    from ansel_tpu.pixel.blur import gaussian_iir

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (3, 64, 128)).astype(np.float32))
    out = np.asarray(gaussian_iir(x, 10.0))
    t = np.arange(-50, 51)
    k = np.exp(-0.5 * (t / 10.0) ** 2)
    k /= k.sum()
    ref = np.asarray(x)
    for ax in (1, 2):
        ref = np.apply_along_axis(
            lambda r: np.convolve(np.pad(r, 50, mode="edge"), k,
                                  "valid")[:len(r)], ax, ref)
    err = np.abs(out - ref)[:, 12:-12, 12:-12]
    assert err.max() < 0.02, err.max()
    # DC preserved
    assert abs(out.mean() - np.asarray(x).mean()) < 5e-3
