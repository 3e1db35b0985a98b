"""Filmic spline invariants (reference behavior contract,
filmicrgb.c:3614+): node interpolation, monotonicity, continuity."""

import numpy as np
import pytest

from ansel_tpu.core.types import Colorspace, ImageSpec, RawMeta
from ansel_tpu.ops import base as ob
from ansel_tpu.ops.filmicrgb import (CURVE_POLY_3, CURVE_POLY_4,
                                     CURVE_RATIONAL, CURVE_SIGMOID,
                                     FilmicParams, FilmicRGB, Spline,
                                     _spline_eval, compute_spline)


def _eval_curve(p: FilmicParams, xs: np.ndarray) -> np.ndarray:
    import jax.numpy as jnp

    s = compute_spline(p)
    c = {
        "M1": np.float32(s.M1), "M2": np.float32(s.M2), "M3": np.float32(s.M3),
        "M4": np.float32(s.M4), "M5": np.float32(s.M5),
        "lat_min": np.float32(s.latitude_min),
        "lat_max": np.float32(s.latitude_max),
    }
    sp = Spline(x=None, y=None, M1=None, M2=None, M3=None, M4=None, M5=None,
                types=(p.shadows, p.highlights))
    return np.asarray(_spline_eval(jnp.asarray(xs, jnp.float32), sp, c))


@pytest.mark.parametrize("shadows,highlights", [
    (CURVE_SIGMOID, CURVE_SIGMOID),
    (CURVE_POLY_3, CURVE_POLY_3),
    (CURVE_POLY_4, CURVE_POLY_4),
    (CURVE_RATIONAL, CURVE_RATIONAL),
])
def test_spline_hits_nodes(shadows, highlights):
    p = FilmicParams(shadows=shadows, highlights=highlights)
    s = compute_spline(p)
    xs = np.array(s.x, np.float32)
    ys = _eval_curve(p, xs)
    # grey node on the linear segment; toe/shoulder transitions are the
    # segment endpoints so they evaluate on the linear part
    assert ys[2] == pytest.approx(s.y[2], abs=1e-5)
    assert ys[1] == pytest.approx(s.y[1], abs=1e-4)
    assert ys[3] == pytest.approx(s.y[3], abs=1e-4)
    # endpoint targets (exact for sigmoid/rational, approximate for polys)
    tol = 1e-3 if shadows in (CURVE_SIGMOID, CURVE_RATIONAL) else 2e-2
    assert abs(ys[0] - s.y[0]) < tol
    tol = 1e-3 if highlights in (CURVE_SIGMOID, CURVE_RATIONAL) else 2e-2
    assert abs(ys[4] - s.y[4]) < tol


def test_spline_monotone_default():
    p = FilmicParams()
    xs = np.linspace(0.0, 1.0, 513, dtype=np.float32)
    ys = _eval_curve(p, xs)
    assert np.all(np.diff(ys) > -1e-6)


def test_spline_continuous_at_transitions():
    p = FilmicParams()
    s = compute_spline(p)
    for x0 in (s.latitude_min, s.latitude_max):
        lo = _eval_curve(p, np.array([x0 - 1e-4], np.float32))[0]
        hi = _eval_curve(p, np.array([x0 + 1e-4], np.float32))[0]
        assert abs(hi - lo) < 1e-3


def test_filmic_op_maps_grey_to_target():
    meta = RawMeta(width=128, height=64)
    op = FilmicRGB()
    p = FilmicParams()
    ctx = ob.PlanContext(meta=meta)
    ctx.notes["work_profile"] = "rec2020"
    spec = ImageSpec(width=128, height=64, colorspace=Colorspace.WORK_RGB)
    plan = op.plan(ctx, spec, p)
    c = op.coeffs(ctx, plan, p)
    x = np.full(spec.array_shape, 0.1845, np.float32)
    out = np.asarray(op.apply(x, c, plan, ctx))
    s = compute_spline(p)
    target = s.y[2] ** p.output_power
    assert np.allclose(out, target, rtol=5e-3)


def test_filmic_monotone_on_grey_ramp():
    meta = RawMeta(width=256, height=8)
    op = FilmicRGB()
    p = FilmicParams()
    ctx = ob.PlanContext(meta=meta)
    spec = ImageSpec(width=256, height=8, colorspace=Colorspace.WORK_RGB)
    plan = op.plan(ctx, spec, p)
    c = op.coeffs(ctx, plan, p)
    ramp = np.exp2(np.linspace(-10, 5, 256, dtype=np.float32))
    x = np.broadcast_to(ramp, (3, 8, 256)).astype(np.float32)
    out = np.asarray(op.apply(x, c, plan, ctx))
    line = out[1, 0, :]
    assert np.all(np.diff(line) > -1e-5)
    assert line[0] < 0.02 and line[-1] > 0.9


def test_v4_v5_exact_paths_differ_from_v3():
    """v6/v7 color science runs the Ych gamut mapping, not the V3 chroma
    alias (filmic_chroma_v4 :2131, filmic_v5 :2227)."""
    import jax.numpy as jnp

    from ansel_tpu.core.types import Colorspace, ImageSpec, RawMeta
    from ansel_tpu.ops import base as ob
    from ansel_tpu.ops.filmicrgb import FilmicParams, FilmicRGB

    def run(p, x):
        op = FilmicRGB()
        ctx = ob.PlanContext(meta=RawMeta(width=x.shape[2],
                                          height=x.shape[1]), scale=1.0)
        spec = ImageSpec(width=x.shape[2], height=x.shape[1],
                         colorspace=Colorspace.WORK_RGB)
        plan = op.plan(ctx, spec, p)
        return np.asarray(op.apply(jnp.asarray(x),
                                   op.coeffs(ctx, plan, p), plan, ctx))

    rng = np.random.default_rng(1)
    x = np.exp2(rng.uniform(-6, 2, (3, 32, 64))).astype(np.float32) * 0.18
    outs = {v: run(FilmicParams(version=v), x) for v in (2, 3, 4)}
    assert all(np.isfinite(o).all() for o in outs.values())
    assert not np.allclose(outs[2], outs[3], atol=1e-4)
    assert not np.allclose(outs[3], outs[4], atol=1e-4)
    # neutral grays must stay achromatic through the Ych mapping
    g = np.full((3, 8, 16), 0.18, np.float32)
    for v in (3, 4):
        og = run(FilmicParams(version=v), g)
        assert np.abs(og - og.mean(axis=0)).max() < 2e-3, v
    # bipolar saturation: negative desaturates vs zero (v6 science)
    sat0 = run(FilmicParams(version=3, saturation=0.0), x)
    satn = run(FilmicParams(version=3, saturation=-80.0), x)
    def chroma(o):
        return np.abs(o - o.mean(axis=0, keepdims=True)).mean()
    assert chroma(satn) < chroma(sat0)


def test_reconstruction_statically_inert_when_unreachable():
    """With processed_maximum ~1, no pixel can pass the clip census ->
    plan disarms reconstruction and the AgX fused path stays available."""
    from ansel_tpu.ops.filmicrgb import FilmicParams, FilmicRGB

    op = FilmicRGB()
    ctx = ob.PlanContext(meta=RawMeta(width=64, height=48))
    spec = ImageSpec(width=64, height=48, colorspace=Colorspace.WORK_RGB)
    plan = op.plan(ctx, spec, FilmicParams())
    assert plan.static[5] is None
    assert op.pointwise_spec(plan, ctx) is not None  # AgX default fusable


def test_highlight_reconstruction_fills_clipped_plateau():
    """Armed reconstruction diffuses surroundings into a clipped blob
    (filmicrgb.c:2680-2780); unclipped pixels pass through unchanged."""
    import jax.numpy as jnp

    from ansel_tpu.ops.filmicrgb import FilmicParams, FilmicRGB

    H, W = 64, 96
    rng = np.random.default_rng(3)
    x = rng.uniform(0.1, 1.0, (3, H, W)).astype(np.float32)
    # white-clipped plateau way past the threshold
    x[:, 20:40, 30:60] = 60.0
    p = FilmicParams()
    op = FilmicRGB()
    ctx = ob.PlanContext(meta=RawMeta(width=W, height=H),
                         processed_maximum=(64.0, 64.0, 64.0))
    spec = ImageSpec(width=W, height=H, colorspace=Colorspace.WORK_RGB)
    plan = op.plan(ctx, spec, p)
    rec = plan.static[5]
    assert rec is not None and rec[0] >= 1
    c = op.coeffs(ctx, plan, p)
    y = np.asarray(op._reconstruct_highlights(jnp.asarray(x), c, rec))
    assert np.isfinite(y).all() and (y >= 0).all()
    # far-from-clipping pixels are untouched
    assert np.allclose(y[:, :8, :8], x[:, :8, :8], atol=1e-5)
    # magnitude is preserved (tone mapping compresses later) but the
    # flat plateau gains synthesized texture
    plateau = y[:, 25:35, 40:50]
    assert abs(plateau.mean() / 60.0 - 1.0) < 0.05
    assert plateau.std() > 1e-3


def test_highlight_reconstruction_census_early_out():
    """Armed but unclipped frame -> lax.cond false branch: identity."""
    import jax.numpy as jnp

    from ansel_tpu.ops.filmicrgb import FilmicParams, FilmicRGB

    rng = np.random.default_rng(4)
    x = rng.uniform(0.0, 1.5, (3, 32, 48)).astype(np.float32)
    op = FilmicRGB()
    ctx = ob.PlanContext(meta=RawMeta(width=48, height=32),
                         processed_maximum=(64.0, 64.0, 64.0))
    spec = ImageSpec(width=48, height=32, colorspace=Colorspace.WORK_RGB)
    p = FilmicParams()
    plan = op.plan(ctx, spec, p)
    c = op.coeffs(ctx, plan, p)
    y = np.asarray(op._reconstruct_highlights(jnp.asarray(x), c,
                                              plan.static[5]))
    assert np.array_equal(y, x)
