"""denoiseprofile tests: VST round-trip identity, actual noise reduction,
edge preservation."""

import numpy as np
import pytest

from ansel_tpu.core.types import Colorspace, ImageSpec, RawMeta
from ansel_tpu.ops import base as ob
from ansel_tpu.ops.denoiseprofile import (MODE_RGB, MODE_Y0U0V0,
                                          DenoiseProfile,
                                          DenoiseProfileParams)


def _run(p, x, wb=(2.0, 1.0, 1.5)):
    op = DenoiseProfile()
    ctx = ob.PlanContext(meta=RawMeta(width=x.shape[2], height=x.shape[1]))
    ctx.wb_coeffs = (*wb, wb[1])
    spec = ImageSpec(width=x.shape[2], height=x.shape[1],
                     colorspace=Colorspace.CAMERA_RGB)
    plan = op.plan(ctx, spec, p)
    c = op.coeffs(ctx, plan, p)
    return np.asarray(op.apply(x, c, plan, ctx))


@pytest.mark.parametrize("color_mode", [MODE_RGB, MODE_Y0U0V0])
def test_vst_roundtrip_identity_when_no_thresholding(color_mode):
    """With zero band forces the thresholds vanish asymptotically; instead
    test the analytic identity: precondition->sum(all details)+residual->
    backtransform == input when thresholds are zero. We emulate that with
    strength tiny (thresholds scale with noise estimate, smooth image ->
    std_x tiny -> thrs huge), so use a smooth ramp and check shape/finite +
    the VST inverse on an unthresholded path via a flat image."""
    x = np.full((3, 64, 128), 0.25, np.float32)
    p = DenoiseProfileParams(a=(4e-4, 4e-4, 4e-4), b=(1e-4, 1e-4, 1e-4),
                             wavelet_color_mode=color_mode)
    out = _run(p, x)
    # flat image must stay (numerically) flat and unbiased
    assert np.isfinite(out).all()
    assert abs(out.mean() - 0.25) < 5e-3
    assert out.std() < 1e-3


def test_denoise_reduces_noise_keeps_edges():
    rng = np.random.default_rng(0)
    h, w = 96, 128
    clean = np.full((3, h, w), 0.2, np.float32)
    clean[:, :, w // 2:] = 0.6  # vertical edge
    noisy = clean + rng.normal(0, 0.03, clean.shape).astype(np.float32)
    p = DenoiseProfileParams(a=(1e-3, 1e-3, 1e-3), b=(0.0, 0.0, 0.0),
                             strength=4.0, wavelet_color_mode=MODE_RGB)
    out = _run(p, noisy.astype(np.float32))
    # noise reduced in flat areas
    flat_in = noisy[:, 8:-8, 8 : w // 2 - 8]
    flat_out = out[:, 8:-8, 8 : w // 2 - 8]
    assert flat_out.std() < 0.6 * flat_in.std(), (flat_out.std(), flat_in.std())
    # edge magnitude preserved
    step_in = clean[:, :, w // 2 + 4].mean() - clean[:, :, w // 2 - 4].mean()
    step_out = out[:, 8:-8, w // 2 + 4].mean() - out[:, 8:-8, w // 2 - 4].mean()
    assert step_out > 0.7 * step_in
    # no gross bias
    assert abs(out.mean() - noisy.mean()) < 0.01


def test_denoise_in_pipeline():
    from ansel_tpu import HistoryItem
    from ansel_tpu.pipeline.engine import Pipeline
    from ansel_tpu.io.synthetic import synth_raw

    raw, meta, _ = synth_raw(h=64, w=128, noise_sigma=60.0)
    pipe = Pipeline(meta, [
        HistoryItem("denoiseprofile",
                    {"a": (4e-4,) * 3, "b": (1e-5,) * 3, "strength": 2.0}),
        HistoryItem("filmicrgb", {}),
    ])
    names = [s.name for s in pipe.stages]
    assert "denoiseprofile" in names
    i = names.index("denoiseprofile")
    assert names[i - 1] == "demosaic"  # CAMERA_RGB slot right after demosaic
