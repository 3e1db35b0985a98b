"""Demosaic quality invariants: constant-color exactness, smooth-gradient
reconstruction error bounds (the hermetic analog of the reference's
golden-image delta-E suite, tests/integration/README.md)."""

import numpy as np
import pytest

from ansel_tpu.core.types import CFAPattern
from ansel_tpu.kernels.rcd import rcd_demosaic
from ansel_tpu.ops.demosaic import bilinear_demosaic, ppg_demosaic


def _mosaic(img_chw, cfa):
    _, h, w = img_chw.shape
    out = np.empty((h, w), np.float32)
    for y in range(h):
        for x in range(w):
            out[y, x] = img_chw[cfa.color_at(y, x), y, x]
    return out


def _interior(a, b=8):
    return a[..., b:-b, b:-b]


@pytest.mark.parametrize("cfa", [CFAPattern.RGGB, CFAPattern.BGGR,
                                 CFAPattern.GRBG, CFAPattern.GBRG])
@pytest.mark.parametrize("method", ["bilinear", "ppg", "rcd"])
def test_constant_color_is_exact(cfa, method):
    img = np.ones((3, 32, 128), np.float32) * np.array(
        [0.25, 0.5, 0.75], np.float32
    ).reshape(3, 1, 1)
    mosaic = _mosaic(img, cfa)
    fn = {"bilinear": bilinear_demosaic, "ppg": ppg_demosaic,
          "rcd": rcd_demosaic}[method]
    out = np.asarray(fn(mosaic, cfa))
    assert np.allclose(_interior(out), _interior(img), atol=2e-5), method


@pytest.mark.parametrize("method,tol", [("bilinear", 0.02), ("ppg", 0.02),
                                        ("rcd", 0.01)])
def test_smooth_gradient_reconstruction(method, tol):
    h, w = 64, 128
    yy, xx = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w),
                         indexing="ij")
    img = np.stack([
        0.2 + 0.5 * xx, 0.3 + 0.4 * yy, 0.25 + 0.3 * (xx + yy) / 2
    ]).astype(np.float32)
    mosaic = _mosaic(img, CFAPattern.RGGB)
    from ansel_tpu.kernels.rcd import rcd_demosaic as rcd
    fn = {"bilinear": bilinear_demosaic, "ppg": ppg_demosaic, "rcd": rcd}[method]
    out = np.asarray(fn(mosaic, CFAPattern.RGGB))
    err = np.abs(_interior(out) - _interior(img)).max()
    assert err < tol, f"{method}: {err}"


def test_rcd_preserves_cfa_samples():
    rng = np.random.default_rng(3)
    img = rng.uniform(0.1, 0.9, (3, 32, 128)).astype(np.float32)
    # smooth it to be demosaicable
    from scipy.ndimage import gaussian_filter

    img = gaussian_filter(img, sigma=(0, 2, 2)).astype(np.float32)
    mosaic = _mosaic(img, CFAPattern.RGGB)
    out = np.asarray(rcd_demosaic(mosaic, CFAPattern.RGGB))
    # raw sample sites are passed through untouched
    for y in range(10, 14):
        for x in range(10, 14):
            c = CFAPattern.RGGB.color_at(y, x)
            assert out[c, y, x] == pytest.approx(mosaic[y, x], rel=1e-5)


def test_rcd_scaler_invariance():
    """Output must scale linearly with amplitude when scaler tracks it."""
    h, w = 32, 128
    rng = np.random.default_rng(5)
    from scipy.ndimage import gaussian_filter

    img = gaussian_filter(rng.uniform(0.1, 0.9, (3, h, w)), sigma=(0, 2, 2))
    mosaic = _mosaic(img.astype(np.float32), CFAPattern.RGGB)
    a = np.asarray(rcd_demosaic(mosaic, CFAPattern.RGGB, 1.0))
    b = np.asarray(rcd_demosaic(mosaic * 4.0, CFAPattern.RGGB, 4.0))
    assert np.allclose(b, 4.0 * a, rtol=1e-4, atol=1e-5)


# canonical X-Trans 6x6 pattern
XTRANS = (1, 0, 2, 1, 2, 0,
          2, 1, 1, 0, 1, 1,
          0, 1, 1, 2, 1, 1,
          1, 2, 0, 1, 0, 2,
          0, 1, 1, 2, 1, 1,
          2, 1, 1, 0, 1, 1)


def _xtrans_mosaic(img):
    _, h, w = img.shape
    out = np.empty((h, w), np.float32)
    for y in range(h):
        for x in range(w):
            out[y, x] = img[XTRANS[(y % 6) * 6 + (x % 6)], y, x]
    return out


def test_markesteijn_constant_exact():
    from ansel_tpu.kernels.markesteijn import xtrans_markesteijn

    img = np.full((3, 96, 132), 0.5, np.float32)
    out = np.asarray(xtrans_markesteijn(_xtrans_mosaic(img), XTRANS))
    assert np.allclose(out[:, 12:-12, 12:-12], 0.5, atol=1e-5)


def test_markesteijn_smooth_gradient():
    from scipy.ndimage import gaussian_filter

    from ansel_tpu.kernels.markesteijn import xtrans_markesteijn

    rng = np.random.default_rng(1)
    img = gaussian_filter(rng.uniform(0.1, 0.9, (3, 96, 132)),
                          sigma=(0, 3, 3)).astype(np.float32)
    out = np.asarray(xtrans_markesteijn(_xtrans_mosaic(img), XTRANS))
    err = np.abs(out[:, 12:-12, 12:-12] - img[:, 12:-12, 12:-12])
    assert err.mean() < 0.005 and err.max() < 0.06, (err.mean(), err.max())


def test_xtrans_vng_lite_runs():
    from ansel_tpu.kernels.markesteijn import xtrans_vng_lite

    img = np.full((3, 36, 132), 0.5, np.float32)
    out = np.asarray(xtrans_vng_lite(img[0], XTRANS))
    assert np.allclose(out[:, 6:-6, 6:-6], 0.5, atol=1e-5)


def test_cacorrect_reduces_synthetic_ca():
    """mosaic with R/B shifted ±1.5px vs G: correction shrinks the
    misalignment by >70%."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from ansel_tpu.core.params import params_class
    from ansel_tpu.core.types import CFAPattern, Colorspace, ImageSpec
    from ansel_tpu.io.synthetic import synth_raw
    from ansel_tpu.ops.base import PlanContext, get_op

    H, W = 512, 768
    rng = np.random.default_rng(0)
    base = rng.uniform(0.2, 0.8, (H // 8, W // 8)).astype(np.float32)
    scene_g = np.kron(base, np.ones((8, 8), np.float32))
    k = np.ones(5) / 5
    for ax in (0, 1):
        scene_g = np.apply_along_axis(
            lambda v: np.convolve(v, k, "same"), ax, scene_g
        ).astype(np.float32)

    def shift_x(img, s):
        xi = np.clip(np.arange(W) - s, 0, W - 1)
        x0 = np.floor(xi).astype(int)
        f = (xi - x0).astype(np.float32)
        x1 = np.clip(x0 + 1, 0, W - 1)
        return img[:, x0] * (1 - f) + img[:, x1] * f

    scenes = {0: shift_x(scene_g, 1.5), 1: scene_g, 2: shift_x(scene_g, -1.5)}
    cfa = CFAPattern.RGGB
    mosaic = np.empty((H, W), np.float32)
    for y in range(2):
        for x in range(2):
            mosaic[y::2, x::2] = scenes[cfa.color_at(y, x)][y::2, x::2]

    op = get_op("cacorrect")
    spec = ImageSpec(height=H, width=W, channels=1,
                     colorspace=Colorspace.RAW, cfa=cfa)
    _, meta, _ = synth_raw(h=64, w=128)
    p = params_class("cacorrect")()
    plan = op.plan(PlanContext(meta=meta), spec, p)
    out = np.asarray(jax.jit(
        lambda a: op.apply(a, None, plan, PlanContext(meta=meta)))(
            jnp.asarray(mosaic)))
    before = np.abs(mosaic[0::2, 0::2] - scene_g[0::2, 0::2]).mean()
    after = np.abs(out[0::2, 0::2] - scene_g[0::2, 0::2]).mean()
    assert after < 0.3 * before, (before, after)


def test_markesteijn_pallas_matches_scene():
    """Pallas tile kernel (interpret mode), 1-pass + 3-pass: constant scene
    exact, smooth scene close; 3-pass at least as good as 1-pass."""
    from scipy.ndimage import gaussian_filter

    from ansel_tpu.kernels.markesteijn_pallas import \
        xtrans_markesteijn_pallas

    img = np.full((3, 96, 384), 0.5, np.float32)
    out = np.asarray(xtrans_markesteijn_pallas(
        _xtrans_mosaic(img), XTRANS, passes=1, interpret=True))
    assert np.allclose(out[:, 24:-24, 24:-24], 0.5, atol=1e-5)

    rng = np.random.default_rng(1)
    img = gaussian_filter(rng.uniform(0.1, 0.9, (3, 96, 384)),
                          sigma=(0, 3, 3)).astype(np.float32)
    mosaic = _xtrans_mosaic(img)
    o1 = np.asarray(xtrans_markesteijn_pallas(mosaic, XTRANS, passes=1,
                                              interpret=True))
    o3 = np.asarray(xtrans_markesteijn_pallas(mosaic, XTRANS, passes=3,
                                              interpret=True))
    ref = img[:, 24:-24, 24:-24]
    e1 = np.abs(o1[:, 24:-24, 24:-24] - ref).mean()
    e3 = np.abs(o3[:, 24:-24, 24:-24] - ref).mean()
    assert e1 < 0.005 and e1 > 0, e1
    assert e3 < e1 * 1.10, (e1, e3)  # 3-pass must not be worse


def _remosaic(scene, pat_name):
    import numpy as np

    h, w = scene.shape[1:]
    yy, xx = np.mgrid[0:h, 0:w]
    sel_map = {"RGGB": [[0, 1], [1, 2]], "GRBG": [[1, 0], [2, 1]],
               "BGGR": [[2, 1], [1, 0]], "GBRG": [[1, 2], [0, 1]]}
    sel = np.array(sel_map[pat_name])[yy % 2, xx % 2]
    return np.take_along_axis(scene, sel[None], axis=0)[0]


def _smooth_scene(h=96, w=192):
    import numpy as np

    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([
        0.3 + 0.2 * np.sin(yy / 17.0) * np.cos(xx / 23.0),
        0.4 + 0.2 * np.cos(yy / 13.0),
        0.35 + 0.15 * np.sin(xx / 19.0)]).astype(np.float32)


def test_lmmse_reconstructs_smooth_scene():
    import numpy as np

    from ansel_tpu.core.types import CFAPattern
    from ansel_tpu.kernels.lmmse import lmmse_demosaic

    scene = _smooth_scene()
    for refine in (0, 2, 4):
        out = np.asarray(lmmse_demosaic(
            _remosaic(scene, "RGGB"), CFAPattern.RGGB, 1.0, refine))
        err = np.abs(out - scene)[:, 8:-8, 8:-8]
        psnr = -10 * np.log10(np.mean(err ** 2) + 1e-12)
        assert psnr > 45.0, (refine, psnr)


def test_vng4_reconstructs_smooth_scene():
    import numpy as np

    from ansel_tpu.core.types import CFAPattern
    from ansel_tpu.kernels.vng import vng4_demosaic

    scene = _smooth_scene()
    for pat in ("RGGB", "GRBG", "BGGR", "GBRG"):
        out = np.asarray(vng4_demosaic(
            _remosaic(scene, pat), CFAPattern[pat]))
        err = np.abs(out - scene)[:, 8:-8, 8:-8]
        psnr = -10 * np.log10(np.mean(err ** 2) + 1e-12)
        assert psnr > 45.0, (pat, psnr)


def test_flat_field_exact_for_lmmse_vng():
    import numpy as np

    from ansel_tpu.core.types import CFAPattern
    from ansel_tpu.kernels.lmmse import lmmse_demosaic
    from ansel_tpu.kernels.vng import vng4_demosaic

    flat = np.full((3, 64, 128), 0.25, np.float32)
    mosaic = _remosaic(flat, "RGGB")
    for out in (np.asarray(lmmse_demosaic(mosaic, CFAPattern.RGGB, 1.0, 0)),
                np.asarray(vng4_demosaic(mosaic, CFAPattern.RGGB))):
        assert np.allclose(out[:, 4:-4, 4:-4], 0.25, atol=2e-3)


def test_dual_demosaic_blends_vng_in_flat_areas():
    import numpy as np

    from ansel_tpu.core.types import CFAPattern, ImageSpec, RawMeta, Colorspace
    from ansel_tpu.ops import base as ob
    from ansel_tpu.ops.demosaic import DUAL_FLAG, RCD, Demosaic, DemosaicParams

    scene = _smooth_scene(64, 128)
    mosaic = _remosaic(scene, "RGGB") * 16000.0
    op = Demosaic()
    meta = RawMeta(width=128, height=64, cfa=CFAPattern.RGGB)
    ctx = ob.PlanContext(meta=meta, scale=1.0)
    spec = ImageSpec(width=128, height=64, colorspace=Colorspace.RAW,
                     cfa=CFAPattern.RGGB)
    p = DemosaicParams(demosaicing_method=RCD | DUAL_FLAG, dual_thrs=0.5)
    plan = op.plan(ctx, spec, p)
    c = op.coeffs(ctx, plan, p)
    out = np.asarray(op.apply(mosaic, c, plan, ctx))
    assert np.isfinite(out).all()
    err = np.abs(out / 16000.0 - scene)[:, 8:-8, 8:-8]
    psnr = -10 * np.log10(np.mean(err ** 2) + 1e-12)
    assert psnr > 40.0, psnr


def test_rcd_matches_reference_mirror():
    """Whole-image RCD vs the scalar numpy transcription of
    rcd_demosaic (rcd.c:274-560), interior compare."""
    import numpy as np

    from ansel_tpu.core.types import CFAPattern
    from ansel_tpu.kernels.rcd import rcd_demosaic
    from tests.mirrors.rcd_ref import rcd_ref

    rng = np.random.default_rng(9)
    H, W = 32, 48
    # smooth scene + noise, mosaiced RGGB
    yy, xx = np.meshgrid(np.linspace(0, 1, H), np.linspace(0, 1, W),
                         indexing="ij")
    scene = np.stack([0.3 + 0.4 * xx, 0.5 - 0.2 * yy + 0.2 * xx,
                      0.2 + 0.5 * yy])
    scene = scene + rng.normal(0, 0.02, scene.shape)
    scene = np.clip(scene, 0.0, 1.0).astype(np.float32)
    cfa = CFAPattern.RGGB
    sel = np.zeros((H, W), int)
    for r in range(2):
        for c in range(2):
            sel[r::2, c::2] = cfa.color_at(r, c)
    mosaic = np.take_along_axis(scene, sel[None], axis=0)[0]

    got = np.asarray(rcd_demosaic(mosaic, cfa))
    want = rcd_ref(mosaic.astype(np.float64),
                   lambda r, c: cfa.color_at(r % 2, c % 2))
    # rows/cols < 10 differ legitimately: the reference patches a PPG
    # border, the mirror leaves raw copies, the TPU kernel wraps — all
    # three only agree where the cascaded 4px stencils read pure-RCD data
    m = slice(10, H - 10), slice(10, W - 10)
    err = np.abs(got[:, m[0], m[1]] - want[:, m[0], m[1]]).max()
    assert err < 1e-3, err


def test_xtrans_vng_and_dual():
    """3-color VNG for X-Trans (vng.c filters==9 path) + X-Trans dual
    (dual.c:66 uses the generic vng_interpolate as the low-freq half)."""
    import jax.numpy as jnp

    from ansel_tpu.kernels.vng import xtrans_vng_demosaic

    XT = (1, 2, 0, 1, 0, 2,
          0, 1, 1, 2, 1, 1,
          2, 1, 1, 0, 1, 1,
          1, 0, 2, 1, 2, 0,
          2, 1, 1, 0, 1, 1,
          0, 1, 1, 2, 1, 1)
    h, w = 96, 132
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    r = 0.4 + 0.3 * np.sin(xx / 17)
    g = 0.5 + 0.25 * np.sin((xx + yy) / 23)
    b = 0.45 + 0.2 * np.cos(xx / 13)
    rgb = np.clip(np.stack([r, g, b]) + 0.01 * rng.random((3, h, w)),
                  0.02, 0.98).astype(np.float32)
    idx = np.asarray(XT).reshape(6, 6)
    sel = idx[np.arange(h)[:, None] % 6, np.arange(w)[None, :] % 6]
    mosaic = np.take_along_axis(rgb, sel[None], axis=0)[0]

    out = np.asarray(xtrans_vng_demosaic(jnp.asarray(mosaic), XT))
    m = 8
    mse = float(np.mean((out[:, m:-m, m:-m] - rgb[:, m:-m, m:-m]) ** 2))
    assert 10 * np.log10(1.0 / mse) > 38.0
    # measured sites pass through
    own = sel == 1
    assert np.allclose(out[1][own], mosaic[own], atol=1e-5)

    # X-Trans dual: VNG low-freq under the detail mask (no fallback)
    import dataclasses

    from ansel_tpu.core.params import params_class
    from ansel_tpu.core.types import CFAPattern, Colorspace, ImageSpec
    from ansel_tpu.io.synthetic import synth_raw
    from ansel_tpu.ops.base import PlanContext, get_op
    from ansel_tpu.ops.demosaic import DUAL_FLAG, MARKESTEIJN

    _, meta, _ = synth_raw(h=h, w=w)
    meta = dataclasses.replace(meta, xtrans=XT)
    op = get_op("demosaic")
    p = params_class("demosaic")(
        demosaicing_method=MARKESTEIJN | DUAL_FLAG, dual_thrs=0.2)
    spec = ImageSpec(height=h, width=w, channels=1,
                     colorspace=Colorspace.RAW, cfa=CFAPattern.XTRANS)
    ctx = PlanContext(meta=meta, scale=1.0)
    plan = op.plan(ctx, spec, p)
    import jax

    c = jax.tree.map(jnp.asarray, op.coeffs(ctx, plan, p))
    pad = np.zeros((spec.pad_h, spec.pad_w), np.float32)
    pad[:h, :w] = mosaic
    y = np.asarray(op.apply(jnp.asarray(pad), c, plan, ctx))[:, :h, :w]
    assert np.isfinite(y).all()
    mse2 = float(np.mean((y[:, m:-m, m:-m] - rgb[:, m:-m, m:-m]) ** 2))
    assert 10 * np.log10(1.0 / mse2) > 30.0
