"""colorequal: procedural CLUT build + application (colorequal.c +
colorequal_shared.c transcriptions)."""

import numpy as np

from ansel_tpu.color import colorrings as rings
from ansel_tpu.core.params import params_class
from ansel_tpu.core.types import Colorspace, ImageSpec, RawMeta
from ansel_tpu.ops.base import PlanContext, get_op
from ansel_tpu.ops.colorequal import MAXNODES, NUM_CHANNELS


def _params(**kw):
    cls = params_class("colorequal")
    return cls(**kw)


def _with_curve(ring, channel, nodes):
    """params with one active periodic curve."""
    curve = [0.0] * (3 * 3 * MAXNODES * 2)
    counts = [0] * 9
    base = (ring * NUM_CHANNELS + channel) * MAXNODES * 2
    for k, (x, y) in enumerate(nodes):
        curve[base + 2 * k] = x
        curve[base + 2 * k + 1] = y
    counts[ring * NUM_CHANNELS + channel] = len(nodes)
    return _params(curve=tuple(curve), curve_num_nodes=tuple(counts))


def test_ucs_jch_roundtrip():
    white = rings.graph_white()
    rng = np.random.default_rng(0)
    xyY = np.stack([rng.uniform(0.2, 0.45, 64), rng.uniform(0.25, 0.5, 64),
                    rng.uniform(0.05, 0.9, 64)], -1)
    JCH = rings.xyY_to_JCH(xyY, white)
    back = rings.JCH_to_xyY(JCH, white)
    assert np.allclose(back, xyY, atol=2e-4), np.abs(back - xyY).max()


def test_hlg_roundtrip():
    x = np.linspace(0.0, 1.0, 513)
    assert np.allclose(rings.hlg_eotf(rings.hlg_oetf(x)), x, atol=1e-6)


def test_neutral_curves_identity_clut():
    # y = 0.5 everywhere -> no hue shift; sat/brightness gain = 1
    p = _with_curve(1, 0, [(0.1, 0.5), (0.5, 0.5), (0.9, 0.5)])
    clut = rings.build_clut(p, level=16)
    lvl = 16
    g = np.arange(lvl) / (lvl - 1.0)
    rr, gg, bb = np.meshgrid(g, g, g, indexing="ij")
    ident = np.stack([rr, gg, bb], -1).reshape(lvl, lvl, lvl, 3)
    ident = ident.transpose(2, 1, 0, 3).reshape(-1, 3)
    assert np.abs(clut - ident).max() < 1e-4


def test_saturation_boost_increases_chroma():
    p = _with_curve(1, 1, [(0.1, 0.9), (0.5, 0.9), (0.9, 0.9)])  # sat x1.8
    op = get_op("colorequal")
    meta = RawMeta(width=32, height=16)
    ctx = PlanContext(meta=meta)
    spec = ImageSpec(width=32, height=16, colorspace=Colorspace.WORK_RGB,
                     channels=3)
    plan = op.plan(ctx, spec, p)
    assert plan.static is not None
    c = op.coeffs(ctx, plan, p)
    rng = np.random.default_rng(1)
    base = rng.uniform(0.2, 0.5, (1, 16, 32)).astype(np.float32)
    x = np.concatenate([base * 1.4, base, base * 0.8], 0).astype(np.float32)
    y = np.asarray(op.apply(x, c, plan, ctx))
    assert np.isfinite(y).all()
    chroma_in = x.max(0) - x.min(0)
    chroma_out = y.max(0) - y.min(0)
    assert chroma_out.mean() > chroma_in.mean() * 1.02, \
        (chroma_in.mean(), chroma_out.mean())


def test_neutral_params_plan_identity():
    p = _params()
    op = get_op("colorequal")
    meta = RawMeta(width=16, height=8)
    ctx = PlanContext(meta=meta)
    spec = ImageSpec(width=16, height=8, colorspace=Colorspace.WORK_RGB,
                     channels=3)
    plan = op.plan(ctx, spec, p)
    assert plan.static is None
