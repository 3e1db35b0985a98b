"""filmicrgb vs the float64 reference mirror (tests/mirrors/filmicrgb_ref).

Gates VERDICT r2 weak #4: the default tone-mapper had no reference-mirror
ΔE gate.  Reference: `/root/reference/src/iop/filmicrgb.c` (cites inside
the mirror).
"""

import numpy as np
import pytest

import jax

from ansel_tpu.io.synthetic import synth_raw
from ansel_tpu.ops.base import PlanContext, get_op
from ansel_tpu.core.types import Colorspace, ImageSpec
from ansel_tpu.ops import filmicrgb as f_op
from mirrors import filmicrgb_ref as ref


def _run_op(p, rgb):
    op = get_op("filmicrgb")
    h, w = rgb.shape[1:]
    spec = ImageSpec(height=h, width=w, channels=3,
                     colorspace=Colorspace.WORK_RGB)
    _, meta, _ = synth_raw(h=64, w=128)
    ctx = PlanContext(meta=meta, scale=1.0)
    plan = op.plan(ctx, spec, p)
    assert plan.static[5] is None, "reconstruction should be off"
    c = jax.tree.map(jax.numpy.asarray, op.coeffs(ctx, plan, p))
    pad = np.zeros((3, spec.pad_h, spec.pad_w), np.float32)
    pad[:, :h, :w] = rgb
    y = np.asarray(op.apply(jax.numpy.asarray(pad), c, plan, ctx))
    return y[:, :h, :w]


def _scene_rgb(seed=0, h=48, w=96):
    rng = np.random.default_rng(seed)
    # log-uniform scene-linear values across ~12 EV + some saturated colors
    ev = rng.uniform(-9.0, 3.0, (3, h, w))
    rgb = 0.1845 * (2.0 ** ev)
    return np.asarray(rgb, np.float32)


CASES = [
    # (name, params kwargs)
    ("v3_sigmoid_chroma_power", dict(
        version=2, preserve_color=ref.M_POWER,
        shadows=f_op.CURVE_SIGMOID, highlights=f_op.CURVE_SIGMOID)),
    ("v3_split", dict(
        version=2, preserve_color=0,
        shadows=f_op.CURVE_SIGMOID, highlights=f_op.CURVE_SIGMOID)),
    ("v2_poly_chroma_max", dict(
        version=1, preserve_color=ref.M_MAX_RGB,
        shadows=f_op.CURVE_POLY_4, highlights=f_op.CURVE_POLY_3,
        spline_kw=dict(contrast=1.5, latitude=33.0, balance=12.0))),
    ("v3_rational_euclid", dict(
        version=2, preserve_color=ref.M_EUCLIDEAN_V2,
        shadows=f_op.CURVE_RATIONAL, highlights=f_op.CURVE_RATIONAL,
        spline_kw=dict(contrast=1.3, latitude=25.0))),
]


@pytest.mark.parametrize("name,cfg", CASES, ids=[c[0] for c in CASES])
def test_filmic_pixel_path_matches_reference(name, cfg):
    from ansel_tpu.color import matrices as cm

    spline_kw = cfg.pop("spline_kw", {})
    common = dict(white_point_source=4.4, black_point_source=-7.75,
                  output_power=2.2, saturation=10.0, **spline_kw)
    p_op = f_op.FilmicParams(**common, **cfg)
    # spline_version travels with the op defaults; mirror must match it
    mirror_kw = dict(common)
    mirror_kw["preserve_color"] = cfg["preserve_color"]
    mirror_kw["version"] = cfg["version"]
    mirror_kw["shadows"] = cfg["shadows"]
    mirror_kw["highlights"] = cfg["highlights"]
    mirror_kw["spline_version"] = {
        f_op.SPLINE_V1: ref.SPLINE_V1, f_op.SPLINE_V2: ref.SPLINE_V2,
        f_op.SPLINE_V3: ref.SPLINE_V3}[p_op.spline_version]
    p_ref = ref.Params(**mirror_kw)

    rgb = _scene_rgb()
    got = _run_op(p_op, rgb)
    rgb_t = np.moveaxis(np.asarray(rgb, np.float64), 0, -1)
    if cfg["preserve_color"] == 0:
        want = ref.filmic_split_v2_v3(rgb_t, p_ref, cm.WORK_Y)
    else:
        want = ref.filmic_chroma_v2_v3(rgb_t, p_ref, cm.WORK_Y)
    want = np.moveaxis(want, -1, 0)
    err = np.abs(got - want)
    assert np.isfinite(got).all()
    assert err.max() < 2e-3, (name, err.max())
    assert err.mean() < 2e-4, (name, err.mean())
