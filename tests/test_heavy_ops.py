"""Tests for toneequal and diffuse (heavy-iterative stack, BASELINE cfg 3)."""

import numpy as np
import pytest

from ansel_tpu.core.types import Colorspace, ImageSpec, RawMeta
from ansel_tpu.ops import base as ob


def _run(op, p, x, scale=1.0):
    ctx = ob.PlanContext(meta=RawMeta(width=x.shape[2], height=x.shape[1]),
                         scale=scale)
    spec = ImageSpec(width=x.shape[2], height=x.shape[1],
                     colorspace=Colorspace.WORK_RGB)
    plan = op.plan(ctx, spec, p)
    c = op.coeffs(ctx, plan, p)
    return np.asarray(op.apply(x, c, plan, ctx))


def test_toneequal_neutral_is_identity():
    from ansel_tpu.ops.toneequal import ToneEqualParams, ToneEqualizer

    rng = np.random.default_rng(0)
    x = np.exp2(rng.uniform(-8, 0, (3, 64, 128))).astype(np.float32)
    out = _run(ToneEqualizer(), ToneEqualParams(), x)
    # the 9-slider -> 8-RBF least-squares fit has inherent ~2% ripple
    # (the reference's pseudo_solve has the same residual)
    assert np.allclose(out, x, rtol=3e-2), np.abs(out / x - 1).max()


def test_toneequal_lifts_shadows_only():
    from ansel_tpu.ops.toneequal import ToneEqualParams, ToneEqualizer

    x = np.full((3, 64, 128), 2.0**-7, np.float32)   # deep shadows
    y = np.full((3, 64, 128), 2.0**-1, np.float32)   # near whites
    p = ToneEqualParams(noise=1.0, ultra_deep_blacks=1.0, deep_blacks=1.0,
                        details=0)
    op = ToneEqualizer()
    out_shadow = _run(op, p, x)
    out_bright = _run(op, p, y)
    assert out_shadow.mean() / x.mean() > 1.5      # shadows lifted ~+1EV
    assert abs(out_bright.mean() / y.mean() - 1.0) < 0.1  # whites untouched


def test_toneequal_solve_factors_interpolates_gains():
    from ansel_tpu.ops.toneequal import (CENTERS_PARAMS, ToneEqualParams,
                                         solve_factors)

    p = ToneEqualParams(shadows=1.0)
    f = solve_factors(p)
    denom = 2.0 * p.smoothing**2
    from ansel_tpu.ops.toneequal import CENTERS_OPS

    # the reconstructed gain at the -4EV node must be close to 2^1
    w = np.exp(-((-4.0 - CENTERS_OPS) ** 2) / denom)
    # least-squares smooths a single raised slider; reference does the same
    assert 1.5 < (w * f).sum() < 2.1


def test_diffuse_zero_speeds_identity():
    from ansel_tpu.ops.diffuse import Diffuse, DiffuseParams

    rng = np.random.default_rng(1)
    x = rng.uniform(0.05, 0.8, (3, 64, 128)).astype(np.float32)
    out = _run(Diffuse(), DiffuseParams(iterations=1), x)
    # zero speeds and sharpness -> reconstruction is identity (max vs 0 aside)
    assert np.allclose(out, x, atol=1e-5), np.abs(out - x).max()


def test_diffuse_sharpen_increases_contrast():
    from ansel_tpu.ops.diffuse import Diffuse, DiffuseParams

    yy, xx = np.meshgrid(np.linspace(0, 1, 64), np.linspace(0, 1, 128),
                         indexing="ij")
    base = 0.3 + 0.2 * (xx > 0.5)
    x = np.broadcast_to(base, (3, 64, 128)).astype(np.float32)
    p = DiffuseParams(iterations=2, sharpness=0.5, radius=4)
    out = _run(Diffuse(), p, x)
    assert out.std() > x.std() * 1.02


def test_diffuse_blur_diffuses():
    from ansel_tpu.ops.diffuse import Diffuse, DiffuseParams

    rng = np.random.default_rng(2)
    x = (0.4 + 0.2 * rng.standard_normal((3, 64, 128))).astype(np.float32)
    x = np.clip(x, 0.01, 1.0)
    p = DiffuseParams(iterations=4, first=0.2, second=0.2, third=0.2,
                      fourth=0.2, radius=8)
    out = _run(Diffuse(), p, x)
    assert out.std() < x.std() * 0.9


def test_diffuse_pallas_matches_xla_path():
    """Pallas tile kernel (interpret) == whole-image XLA path, interior."""
    from ansel_tpu.kernels.diffuse_pallas import diffuse_iteration_pallas
    from ansel_tpu.ops.diffuse import Diffuse, DiffuseParams

    rng = np.random.default_rng(3)
    x = rng.uniform(0.05, 0.9, (3, 96, 256)).astype(np.float32)
    for aniso in (0.0, 2.0, -2.0):
        p = DiffuseParams(iterations=1, radius=2, first=0.1, second=-0.05,
                          third=0.1, fourth=0.05, sharpness=0.1,
                          regularization=1.0,
                          anisotropy_first=aniso, anisotropy_second=aniso,
                          anisotropy_third=-aniso, anisotropy_fourth=0.0)
        op = Diffuse()
        ctx = ob.PlanContext(meta=RawMeta(width=256, height=96), scale=1.0)
        spec = ImageSpec(width=256, height=96,
                         colorspace=Colorspace.WORK_RGB)
        plan = op.plan(ctx, spec, p)
        scales, iterations, modes, _ = plan.static
        c = op.coeffs(ctx, plan, p)
        ref = np.asarray(op.apply(x, c, plan, ctx))
        out = np.asarray(diffuse_iteration_pallas(
            x, c, scales, modes, interpret=True))
        # interior (the kernel edge-pads once; the XLA path re-pads per
        # blur stage -> results differ only inside the halo ring)
        halo = 3 * ((1 << scales) - 1)
        err = np.abs(out - ref)[:, halo:-halo, halo:-halo]
        assert err.max() < 1e-5, (aniso, err.max())


def test_diffuse_pde_matches_reference_mirror():
    """_pde_step vs a scalar numpy transcription of diffuse.c's
    heat_PDE_diffusion (:760-955) — all three isotropy modes, two
    dilations."""
    import jax.numpy as jnp
    import numpy as np

    from ansel_tpu.ops.diffuse import Diffuse
    from tests.mirrors.diffuse_ref import heat_pde_diffusion

    rng = np.random.default_rng(42)
    C, H, W = 3, 16, 24
    LF = rng.uniform(0.05, 1.0, (C, H, W)).astype(np.float32)
    HF = rng.normal(0.0, 0.05, (C, H, W)).astype(np.float32)
    aniso = np.float32([1.5, 0.0, 0.7, 2.2])
    modes = (1, 0, 2, 1)   # isophote, isotrope, gradient, isophote
    ABCD = np.float32([0.05, -0.03, 0.04, 0.02])
    for s in (0, 1):
        c = {
            "aniso": aniso,
            "ABCD": np.stack([ABCD] * (s + 1)),
            "strength": np.float32([1.1] * (s + 1)),
            "norm_reg": np.float32([0.3] * (s + 1)),
            "variance_threshold": np.float32(0.05),
        }
        got = np.asarray(Diffuse()._pde_step(
            jnp.asarray(HF), jnp.asarray(LF), c, s, modes))
        want = heat_pde_diffusion(
            HF.astype(np.float64), LF.astype(np.float64), aniso, modes,
            0.05, 1 << s, 0.3, ABCD, 1.1)
        err = np.abs(got - want).max()
        assert err < 5e-5, (s, err)


@pytest.mark.parametrize("method", range(7))
def test_toneequal_matches_reference_mirror(method):
    """details=NONE path vs the scalar mirror of luminance_mask.h +
    apply_toneequalizer (toneequal.c:763-797)."""
    import numpy as np

    from ansel_tpu.ops.toneequal import (ToneEqualizer, ToneEqualParams,
                                         solve_factors)
    from tests.mirrors.toneequal_ref import toneequal_ref

    rng = np.random.default_rng(5)
    img = rng.uniform(0.001, 1.2, (3, 12, 16)).astype(np.float32)
    p = ToneEqualParams(shadows=0.8, blacks=-0.5, midtones=0.3,
                        highlights=-0.4, details=0, method=method,
                        exposure_boost=0.5)
    op = ToneEqualizer()
    meta = RawMeta(width=16, height=12)
    ctx = ob.PlanContext(meta=meta)
    spec = ImageSpec(width=16, height=12, colorspace=Colorspace.WORK_RGB,
                     channels=3)
    plan = op.plan(ctx, spec, p)
    got = np.asarray(op.apply(img, op.coeffs(ctx, plan, p), plan, ctx))
    want = toneequal_ref(img.astype(np.float64), method,
                         2.0 ** p.exposure_boost, 0.0, 1.0,
                         solve_factors(p), p.smoothing)
    assert np.abs(got - want).max() < 2e-5
