"""denoiseprofile wavelet path vs the float64 reference mirror.

Gates VERDICT r2 weak #4 (no reference gate for denoiseprofile).
Reference: `/root/reference/src/iop/denoiseprofile.c` (cites inside the
mirror).
"""

import numpy as np
import pytest

import jax

from ansel_tpu.core.types import Colorspace, ImageSpec
from ansel_tpu.io.synthetic import synth_raw
from ansel_tpu.ops import denoiseprofile as dp_op
from ansel_tpu.ops.base import PlanContext, get_op
from mirrors import denoiseprofile_ref as ref


def _noisy_rgb(seed=0, h=64, w=128):
    rng = np.random.default_rng(seed)
    base = rng.random((h, w, 3)) * 0.6 + 0.02
    noise = rng.normal(0.0, 0.03, (h, w, 3)) * np.sqrt(base)
    return np.asarray(base + noise, np.float64)


@pytest.mark.parametrize("color_mode", [dp_op.MODE_RGB, dp_op.MODE_Y0U0V0],
                         ids=["rgb", "y0u0v0"])
def test_wavelet_path_matches_reference(color_mode):
    a, b = 1.5e-3, 2.0e-5
    p = dp_op.DenoiseProfileParams(
        a=(a, a, a), b=(b, b, b), strength=1.3, shadows=1.1, bias=0.2,
        mode=dp_op.MODE_WAVELETS, use_new_vst=1,
        wavelet_color_mode=color_mode)

    img = _noisy_rgb()
    h, w, _ = img.shape
    op = get_op("denoiseprofile")
    spec = ImageSpec(height=h, width=w, channels=3,
                     colorspace=Colorspace.CAMERA_RGB)
    _, meta, _ = synth_raw(h=h, w=w)
    ctx = PlanContext(meta=meta, scale=1.0)
    plan = op.plan(ctx, spec, p)
    max_scale = plan.static[0]
    assert 2 <= max_scale <= ref.BANDS  # size-derived, not hardcoded

    c = jax.tree.map(jax.numpy.asarray, op.coeffs(ctx, plan, p))
    # exact-size spec: pad==logical so detail-variance statistics match
    pad = np.zeros((3, spec.pad_h, spec.pad_w), np.float32)
    pad[:, :h, :w] = np.moveaxis(img, -1, 0)
    got = np.asarray(op.apply(jax.numpy.asarray(pad), c, plan, ctx))
    got = got[:, :h, :w]

    force = np.full((ref.BANDS, ref.BANDS), 0.5)  # default flat curves
    want = ref.process_wavelets(
        img, a=(a, a, a), b=(b, b, b), strength=1.3, shadows=1.1,
        bias=0.2, force=force, wb_coeffs=ctx.wb_coeffs,
        color_mode=color_mode, max_scale=max_scale)
    want = np.moveaxis(want, -1, 0)

    scale_mag = max(np.abs(want).max(), 1.0)
    err = np.abs(got - want) / scale_mag
    assert np.isfinite(got).all()
    assert err.max() < 5e-3, err.max()
    assert err.mean() < 5e-4, err.mean()


def test_wavelet_scale_count_matches_reference_rule():
    """plan()'s max_scale must follow the 20%-support rule, incl. the
    full-size export case (7 scales at 24MP, not a hardcoded 5)."""
    op = get_op("denoiseprofile")
    _, meta, _ = synth_raw(h=64, w=96)
    p = dp_op.DenoiseProfileParams(a=(1e-3,) * 3, b=(1e-5,) * 3)
    for (h, w) in ((64, 96), (512, 768), (4000, 6016)):
        spec = ImageSpec(height=h, width=w, channels=3,
                         colorspace=Colorspace.CAMERA_RGB)
        ctx = PlanContext(meta=meta, scale=1.0)
        got = op.plan(ctx, spec, p).static[0]
        assert got == max(ref.num_scales(h, w, 1.0), 1), (h, w, got)
