"""ΔE acceptance gates — the reference integration suite's methodology
(`/root/reference/tests/integration/deltae`: sRGB -> Lab(D65) -> CIEDE2000;
MAX dE 2.3, avg 2.3/3) applied against independent NumPy transcriptions of
the reference pixel math (tests/mirrors/)."""

import dataclasses

import numpy as np
import pytest

from ansel_tpu import HistoryItem
from ansel_tpu.color import matrices as cm
from ansel_tpu.core.params import params_class
from ansel_tpu.ops.base import PlanContext, get_op
from ansel_tpu.utils.deltae import (MAX_AVG_DELTA_E, MAX_DELTA_E, ciede2000,
                                    deltae_stats, srgb_to_lab)

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
from mirrors import channelmixerrgb_ref as cmx_ref  # noqa: E402


def _display_encode(work_rgb):
    """Shared work-RGB -> display sRGB path for both DUT and oracle."""
    lin = np.clip(np.asarray(work_rgb, np.float64), 0.0, None)
    M = cm.rgb_to_rgb_matrix("rec2020", "srgb")
    srgb = np.einsum("dc,c...->d...", M, lin)
    srgb = np.clip(srgb, 0.0, 1.0)
    return np.where(srgb <= 0.0031308, srgb * 12.92,
                    1.055 * srgb ** (1.0 / 2.4) - 0.055)


def test_ciede2000_reference_vectors():
    # Sharma/Wu/Dalal published test pairs
    cases = [
        ((50.0, 2.6772, -79.7751), (50.0, 0.0, -82.7485), 2.0425),
        ((50.0, -1.3802, -84.2814), (50.0, 0.0, -82.7485), 1.0000),
        ((35.0831, -44.1164, 3.7933), (35.0232, -40.0716, 1.5901), 1.8645),
        ((22.7233, 20.0904, -46.6940), (23.0331, 14.9730, -42.5619), 2.0373),
        ((2.0776, 0.0795, -1.1350), (0.9033, -0.0636, -0.5514), 0.9082),
    ]
    for l1, l2, exp in cases:
        got = float(ciede2000(np.array(l1), np.array(l2)))
        assert abs(got - exp) < 1e-4


@pytest.mark.parametrize("adaptation", [0, 1, 2, 3, 4])
def test_channelmixerrgb_vs_reference_mirror(adaptation):
    rng = np.random.default_rng(42)
    img = rng.random((3, 48, 64), dtype=np.float32) * 1.2

    pdict = dict(
        red=(0.9, 0.08, 0.02), green=(0.05, 1.0, -0.05),
        blue=(0.0, 0.1, 0.9),
        saturation=(0.1, -0.05, 0.02), lightness=(0.02, 0.0, -0.02),
        grey=(0.0, 0.0, 0.0),
        normalize_R=0, normalize_G=0, normalize_B=0,
        normalize_sat=0, normalize_light=0, normalize_grey=1,
        adaptation=adaptation, x=0.310, y=0.329,
        gamut=1.0, clip=1, version=2)

    # oracle
    coef = cmx_ref.commit(pdict)
    expected = cmx_ref.process(
        img.transpose(1, 2, 0).astype(np.float64),
        cm.XYZ_FROM_WORK, cm.WORK_FROM_XYZ, coef).transpose(2, 0, 1)

    # DUT: the op's CPU jax path through plan/coeffs/apply
    op = get_op("channelmixerrgb")
    cls = params_class("channelmixerrgb")
    p = cls(**{k: v for k, v in pdict.items()
               if k in {f.name for f in dataclasses.fields(cls)}},
            illuminant=7, temperature=5003.0)  # CUSTOM -> use (x, y)
    from ansel_tpu.core.types import CFAPattern, Colorspace, ImageSpec, \
        RawMeta

    meta = RawMeta(width=64, height=48)
    ctx = PlanContext(meta=meta)
    spec = ImageSpec(width=64, height=48, colorspace=Colorspace.WORK_RGB,
                     channels=3)
    plan = op.plan(ctx, spec, p)
    c = op.coeffs(ctx, plan, p)
    got = np.asarray(op.apply(img, c, plan, ctx))

    mx, avg, _ = deltae_stats(_display_encode(expected),
                              _display_encode(got))
    assert mx < 0.25, f"adaptation={adaptation}: max dE {mx}"
    assert avg < 0.05, f"adaptation={adaptation}: avg dE {avg}"


def test_channelmixerrgb_grey_mode_mirror():
    rng = np.random.default_rng(3)
    img = rng.random((3, 32, 40), dtype=np.float32)
    pdict = dict(red=(1.0, 0.0, 0.0), green=(0.0, 1.0, 0.0),
                 blue=(0.0, 0.0, 1.0), saturation=(0.0, 0.0, 0.0),
                 lightness=(0.0, 0.0, 0.0), grey=(0.3, 0.6, 0.1),
                 normalize_R=0, normalize_G=0, normalize_B=0,
                 normalize_sat=0, normalize_light=0, normalize_grey=1,
                 adaptation=0, x=0.33, y=0.33, gamut=1.0, clip=1, version=2)
    coef = cmx_ref.commit(pdict)
    expected = cmx_ref.process(img.transpose(1, 2, 0).astype(np.float64),
                               cm.XYZ_FROM_WORK, cm.WORK_FROM_XYZ,
                               coef).transpose(2, 0, 1)
    op = get_op("channelmixerrgb")
    cls = params_class("channelmixerrgb")
    p = cls(**{k: v for k, v in pdict.items()
               if k in {f.name for f in dataclasses.fields(cls)}},
            illuminant=7, temperature=5003.0)
    from ansel_tpu.core.types import Colorspace, ImageSpec, RawMeta

    meta = RawMeta(width=40, height=32)
    ctx = PlanContext(meta=meta)
    spec = ImageSpec(width=40, height=32, colorspace=Colorspace.WORK_RGB,
                     channels=3)
    plan = op.plan(ctx, spec, p)
    got = np.asarray(op.apply(img, op.coeffs(ctx, plan, p), plan, ctx))
    mx, avg, _ = deltae_stats(_display_encode(expected),
                              _display_encode(got))
    assert mx < 0.25 and avg < 0.05


def test_end_to_end_config1_deltae_gate():
    """BASELINE config 1 stack rendered twice (fused vs per-op path) must
    agree within the integration-suite thresholds — guards the Pallas
    fusion path and provides the end-to-end ΔE harness plumbing."""
    from ansel_tpu.io.synthetic import synth_raw
    from ansel_tpu.pipeline import engine as eng

    raw, meta, _ = synth_raw(h=96, w=128, kind="gradients")
    hist = [HistoryItem("exposure", {"exposure": 0.5}),
            HistoryItem("channelmixerrgb", {}),
            HistoryItem("filmicrgb", {}),
            HistoryItem("demosaic", {"demosaicing_method": 0})]
    pipe = eng.Pipeline(meta, hist)
    import jax

    from ansel_tpu.ops import base as ops_base

    x = ops_base.pad_to(raw, pipe.spec_in)
    coeffs = pipe.coeffs()
    y_plain = np.asarray(jax.jit(pipe.trace_fn())(x, coeffs))

    eng._FORCE_FUSION_INTERPRET = True
    try:
        pipe2 = eng.Pipeline(meta, hist)
        y_fused = np.asarray(jax.jit(pipe2.trace_fn())(x, pipe2.coeffs()))
    finally:
        eng._FORCE_FUSION_INTERPRET = False
    mx, avg, _ = deltae_stats(np.clip(y_plain, 0, 1), np.clip(y_fused, 0, 1))
    assert mx < MAX_DELTA_E and avg < MAX_AVG_DELTA_E, (mx, avg)
