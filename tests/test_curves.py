"""Curve interpolator + rgbcurve tests."""

import numpy as np

from ansel_tpu.pixel import curves


def test_identity_curve():
    lut = curves.sample_curve([0.0, 1.0], [0.0, 1.0], curves.MONOTONE_HERMITE)
    t = np.linspace(0, 1, curves.LUT_SIZE)
    assert np.allclose(lut, t, atol=1e-6)


def test_monotone_hermite_is_monotone():
    lut = curves.sample_curve([0.0, 0.2, 0.5, 1.0], [0.0, 0.4, 0.45, 1.0],
                              curves.MONOTONE_HERMITE)
    assert np.all(np.diff(lut) >= -1e-7)


def test_cubic_passes_through_nodes():
    xs = [0.0, 0.25, 0.6, 1.0]
    ys = [0.0, 0.35, 0.5, 1.0]
    for ct in (curves.CUBIC_SPLINE, curves.CATMULL_ROM,
               curves.MONOTONE_HERMITE):
        lut = curves.sample_curve(xs, ys, ct)
        t = np.linspace(0, 1, curves.LUT_SIZE)
        for x, y in zip(xs, ys):
            i = np.argmin(np.abs(t - x))
            assert abs(lut[i] - y) < 2e-3, (ct, x)


def test_extrapolation_is_linear():
    lut = curves.sample_curve([0.0, 0.5], [0.0, 0.25], curves.CATMULL_ROM,
                              lut_max=2.0)
    t = np.linspace(0, 2.0, curves.LUT_SIZE)
    # slope 0.5 continues past the last node
    assert abs(lut[-1] - 1.0) < 2e-3


def test_apply_lut_matches_numpy():
    import jax.numpy as jnp

    lut = curves.sample_curve([0.0, 1.0], [0.0, 2.0], curves.CATMULL_ROM)
    x = jnp.asarray(np.linspace(0, 0.999, 128, dtype=np.float32).reshape(8, 16))
    y = np.asarray(curves.apply_lut(x, lut))
    assert np.allclose(y, 2.0 * np.asarray(x), atol=1e-3)


def test_rgbcurve_linked_preserves_ratios():
    import numpy as np

    from ansel_tpu.core.types import Colorspace, ImageSpec, RawMeta
    from ansel_tpu.ops import base as ob
    from ansel_tpu.ops.rgbcurve import RGBCurve, RGBCurveParams

    rng = np.random.default_rng(0)
    x = rng.uniform(0.05, 0.8, (3, 16, 128)).astype(np.float32)
    nodes = [0.0, 0.0, 0.5, 0.7, 1.0, 1.0] + [0.0] * (40 - 6)
    p = RGBCurveParams(curve_nodes=tuple(nodes * 3),
                       curve_num_nodes=(3, 2, 2))
    op = RGBCurve()
    ctx = ob.PlanContext(meta=RawMeta(width=128, height=16))
    spec = ImageSpec(width=128, height=16, colorspace=Colorspace.WORK_RGB)
    plan = op.plan(ctx, spec, p)
    out = np.asarray(op.apply(x, op.coeffs(ctx, plan, p), plan, ctx))
    # ratios preserved
    rin = x / x.sum(axis=0, keepdims=True)
    rout = out / out.sum(axis=0, keepdims=True)
    assert np.allclose(rin, rout, atol=1e-4)
    # midtones lifted
    assert out.mean() > x.mean()
