"""Highlight reconstruction: inpaint mode vs a sequential transcription of
the reference scan (interpolate_color, highlights/lch.c:206-300)."""

import numpy as np
import pytest

from ansel_tpu import HistoryItem
from ansel_tpu.core.types import CFAPattern
from ansel_tpu.io.synthetic import synth_raw
from ansel_tpu.ops import base as ops_base
from ansel_tpu.ops.highlights import MODE_INPAINT


def _interpolate_color_seq(inp, out, clipmap, dim, dir_, other, pass_):
    """Direct sequential transcription of interpolate_color."""
    H, W = inp.shape
    ratio = 1.0
    rng = range(W) if (dim == 0 and dir_ == 1) else \
        range(W - 1, -1, -1) if (dim == 0) else \
        range(H) if dir_ == 1 else range(H - 1, -1, -1)
    for k in rng:
        i, j = (k, other) if dim == 0 else (other, k)
        ni, nj = (i + dir_, j) if dim == 0 else (i, j + dir_)
        clip0 = clipmap[j, i]
        # border
        if i == 0 or i == W - 1 or j == 0 or j == H - 1:
            if pass_ == 3:
                out[j, i] = inp[j, i]
            continue
        clip1 = clipmap[nj, ni] if 0 <= ni < W and 0 <= nj < H else clip0
        v = inp[j, i]
        nv = inp[nj, ni]
        if v < clip0 and v > 1e-5:
            if nv < clip1 and nv > 1e-5:
                if k & 1:
                    ratio = (3.0 * ratio + v / nv) / 4.0
                else:
                    ratio = (3.0 * ratio + nv / v) / 4.0
        if v >= clip0 - 1e-5:
            if nv >= clip1 - 1e-5:
                add = max(clip0, clip1)
            elif k & 1:
                add = nv * ratio
            else:
                add = nv / ratio
            if pass_ == 0:
                out[j, i] = add
            elif pass_ == 3:
                out[j, i] = (out[j, i] + add) / 4.0
            else:
                out[j, i] += add
        else:
            if pass_ == 3:
                out[j, i] = inp[j, i]


def _inpaint_seq(inp, clipmap):
    out = inp.copy()
    H, W = inp.shape
    for j in range(H):
        _interpolate_color_seq(inp, out, clipmap, 0, 1, j, 0)
        _interpolate_color_seq(inp, out, clipmap, 0, -1, j, 1)
    for i in range(W):
        _interpolate_color_seq(inp, out, clipmap, 1, 1, i, 2)
        _interpolate_color_seq(inp, out, clipmap, 1, -1, i, 3)
    return out


def test_inpaint_matches_sequential_reference():
    rng = np.random.default_rng(11)
    H, W = 32, 48
    img = rng.uniform(0.05, 0.8, (H, W)).astype(np.float32)
    # burn a clipped blob
    img[10:18, 20:32] = 1.2
    clip = 1.0

    from ansel_tpu.core.types import Colorspace, ImageSpec, RawMeta
    from ansel_tpu.ops.base import PlanContext, get_op
    from ansel_tpu.core.params import params_class

    meta = RawMeta(width=W, height=H)
    ctx = PlanContext(meta=meta)
    spec = ImageSpec(width=W, height=H, colorspace=Colorspace.RAW,
                     channels=1, cfa=CFAPattern.RGGB)
    op = get_op("highlights")
    p = params_class("highlights")(mode=MODE_INPAINT, clip=clip)
    plan = op.plan(ctx, spec, p)
    c = op.coeffs(ctx, plan, p)
    got = np.asarray(op.apply(img, c, plan, ctx))

    # per-pixel clip map (all channels share pmax=1 here)
    clipmap = np.full((H, W), 0.995 * clip, np.float32)
    expected = _inpaint_seq(img.astype(np.float64), clipmap)
    assert np.allclose(got, expected, rtol=1e-4, atol=1e-4), \
        np.abs(got - expected).max()


def test_inpaint_reconstructs_gradient():
    """Clipped area in a gradient scene gets values above the clip level
    with structure, not a flat clamp."""
    raw, meta, _ = synth_raw(h=96, w=128, kind="gradients")
    from ansel_tpu.pipeline.engine import Pipeline

    hist = [HistoryItem("highlights", {"mode": MODE_INPAINT, "clip": 0.3}),
            HistoryItem("demosaic", {"demosaicing_method": 0})]
    pipe = Pipeline(meta, hist)
    import jax

    y = np.asarray(jax.jit(pipe.trace_fn())(
        ops_base.pad_to(raw, pipe.spec_in), pipe.coeffs()))
    assert np.isfinite(y).all()
    # reconstruction must exceed the hard clip somewhere
    hist_clip = [HistoryItem("highlights", {"mode": 0, "clip": 0.3}),
                 HistoryItem("demosaic", {"demosaicing_method": 0})]
    pipe2 = Pipeline(meta, hist_clip)
    y2 = np.asarray(jax.jit(pipe2.trace_fn())(
        ops_base.pad_to(raw, pipe2.spec_in), pipe2.coeffs()))
    assert y.max() > y2.max() * 1.02


def test_laplacian_reconstructs_clipped_gradient():
    """Guided-laplacian mode rebuilds a clipped highlight from the
    surrounding gradient (highlights/laplacian.c flow)."""
    import jax
    import jax.numpy as jnp

    from ansel_tpu.core.types import CFAPattern
    from ansel_tpu.kernels.highlights_laplacian import laplacian_reconstruct

    h, w = 128, 192
    yy, xx = np.mgrid[0:h, 0:w]
    # radial hot spot that saturates in the center
    r2 = ((yy - h / 2) ** 2 + (xx - w / 2) ** 2) / (h * h / 4)
    scene = 1.6 * np.exp(-2.0 * r2).astype(np.float32) + 0.1
    sel = np.array([[0, 1], [1, 2]])[yy % 2, xx % 2]
    gains = np.float32([1.0, 0.9, 0.8])
    mosaic = np.minimum(scene * gains[sel], 1.0).astype(np.float32)

    out = np.asarray(laplacian_reconstruct(
        jnp.asarray(mosaic), [0.995, 0.995, 0.995], CFAPattern.RGGB,
        scales_param=5, iterations=15, noise_level=0.0, solid_color=0.0))
    assert np.isfinite(out).all()
    clipped = mosaic >= 0.994
    # reconstruction must rebuild a dome above the clip plateau
    assert out[clipped].max() > 1.05
    assert out[clipped].mean() > mosaic[clipped].mean() + 0.003
    # pixels far from any clipped region stay untouched (the mask is
    # feathered 5x5 + resized, so only a border ring may blend)
    dil = clipped.copy()
    for _ in range(10):
        d = np.zeros_like(dil)
        d[1:] |= dil[:-1]; d[:-1] |= dil[1:]
        d[:, 1:] |= dil[:, :-1]; d[:, :-1] |= dil[:, 1:]
        dil |= d
    far = ~dil
    assert np.abs(out[far] - mosaic[far]).max() < 1e-3
