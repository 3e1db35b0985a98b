"""Windowed form tools (ops/_maskwin) must reproduce the full-plane
path: the window is an optimization, not a semantic change."""

import numpy as np
import pytest

from ansel_tpu.core.types import Colorspace, ImageSpec
from ansel_tpu.ops import _maskwin
from ansel_tpu.ops.base import PlanContext, get_op, pad_to
from ansel_tpu.ops.retouch import RetouchParams, pack_form
from ansel_tpu.ops.spots import SpotsParams
from ansel_tpu.pipeline import masks as mk


def _ctx_with_forms(spec, forms):
    ctx = PlanContext(meta=None, scale=1.0)
    ctx.notes["forms"] = forms
    return ctx


def _spec(h, w):
    return ImageSpec(height=h, width=w, channels=3,
                     colorspace=Colorspace.WORK_RGB)


def _img(spec, seed=0):
    rng = np.random.default_rng(seed)
    h, w = spec.height, spec.width
    base = rng.random((3, h, w), np.float32)
    # smooth it a bit so heal boundary conditions are stable
    base = (base + np.roll(base, 1, -1) + np.roll(base, 1, -2)) / 3.0
    return pad_to(base, spec)


def _run(op, ctx, spec, params, x):
    import jax.numpy as jnp

    plan = op.plan(ctx, spec, params)
    c = op.coeffs(ctx, plan, params)
    return np.asarray(op.apply(jnp.asarray(x), c, plan, ctx))


@pytest.mark.parametrize("algo", [1, 2])
def test_spots_windowed_matches_full(monkeypatch, algo):
    h, w = 96, 160
    spec = _spec(h, w)
    form = mk.Form(id=7, type=mk.MASK_CIRCLE | mk.MASK_CLONE,
                   nodes=[(0.4, 0.5, 0.08, 0.04)], src=(0.6, 0.55))
    forms = {7: form}
    p = SpotsParams(clone_id=(7,) + (0,) * 63,
                    clone_algo=(algo,) * 64)
    op = get_op("spots")
    x = _img(spec)

    ctx = _ctx_with_forms(spec, forms)
    out_win = _run(op, ctx, spec, p, x)
    # window must actually engage
    assert any(rec[5] is not None for rec in
               op.plan(ctx, spec, p).static)

    monkeypatch.setattr(_maskwin, "MAX_AREA_FRAC", -1.0)
    ctx2 = _ctx_with_forms(spec, forms)
    out_full = _run(op, ctx2, spec, p, x)
    assert op.plan(ctx2, spec, p).static[0][5] is None
    # identical outside the form, near-identical inside (same solver on
    # a window whose margin covers the heal boundary ring)
    assert np.max(np.abs(out_win - out_full)) < 2e-3
    assert np.allclose(out_win, x, atol=2e-3) is False  # it did something


def test_retouch_wavelet_windowed_matches_full(monkeypatch):
    h, w = 128, 192
    spec = _spec(h, w)
    form = mk.Form(id=9, type=mk.MASK_CIRCLE,
                   nodes=[(0.45, 0.5, 0.07, 0.03)], src=(0.45, 0.5))
    forms = {9: form}
    blob = pack_form(9, scale=2, algorithm=3, blur_radius=3.0)
    blob += b"\0" * (300 * 44 - len(blob))
    p = RetouchParams(rt_forms=blob, num_scales=3)
    op = get_op("retouch")
    x = _img(spec, seed=1)

    ctx = _ctx_with_forms(spec, forms)
    plan = op.plan(ctx, spec, p)
    assert plan.static[2] is not None  # wavelet window engaged
    out_win = _run(op, ctx, spec, p, x)

    monkeypatch.setattr(_maskwin, "MAX_AREA_FRAC", -1.0)
    ctx2 = _ctx_with_forms(spec, forms)
    assert op.plan(ctx2, spec, p).static[2] is None
    out_full = _run(op, ctx2, spec, p, x)
    assert np.max(np.abs(out_win - out_full)) < 2e-3
    assert not np.allclose(out_full, x, atol=1e-5)
