"""Tests for the creative/corrective op batch (velvia, vibrance, sharpen,
monochrome, graduatednd, channelmixerrgb, flip, crop) + Lab conversion."""

import numpy as np
import pytest

from ansel_tpu.core.types import CFAPattern, Colorspace, ImageSpec, RawMeta
from ansel_tpu.ops import base as ob


def _ctx(w=128, h=64, **kw):
    return ob.PlanContext(meta=RawMeta(width=w, height=h, **kw))


def _spec(w=128, h=64, cs=Colorspace.WORK_RGB):
    return ImageSpec(width=w, height=h, colorspace=cs)


def _run(op, p, x, ctx=None, spec=None):
    ctx = ctx or _ctx()
    spec = spec or _spec()
    plan = op.plan(ctx, spec, p)
    c = op.coeffs(ctx, plan, p)
    return np.asarray(op.apply(x, c, plan, ctx)), plan


def test_lab_roundtrip():
    import jax.numpy as jnp

    from ansel_tpu.color import matrices as cm
    from ansel_tpu.color import transforms as tr

    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.uniform(0.01, 1.0, (3, 8, 128)), jnp.float32)
    white = cm.PIPE_WHITE_XYZ  # pipeline Lab is D50-referenced
    lab = tr.xyz_to_lab(tr.apply_matrix(rgb, cm.XYZ_FROM_WORK), white)
    back = tr.apply_matrix(tr.lab_to_xyz(lab, white), cm.WORK_FROM_XYZ)
    assert np.allclose(np.asarray(back), np.asarray(rgb), atol=2e-5)
    # grey has zero chroma
    grey = jnp.full((3, 8, 128), 0.18, jnp.float32)
    lab_g = tr.xyz_to_lab(tr.apply_matrix(grey, cm.XYZ_FROM_WORK), white)
    assert np.abs(np.asarray(lab_g[1:])).max() < 0.2


def test_velvia_boosts_saturation():
    from ansel_tpu.ops.velvia import Velvia, VelviaParams

    x = np.full((3, 64, 128), 0.4, np.float32)
    x[0] += 0.1  # slightly red
    out, _ = _run(Velvia(), VelviaParams(strength=50.0), x)
    assert out[0].mean() > x[0].mean()  # red pushed up
    assert out[1].mean() < x[1].mean()


def test_velvia_zero_strength_identity():
    from ansel_tpu.ops.velvia import Velvia, VelviaParams

    x = np.random.default_rng(0).uniform(0, 1, (3, 64, 128)).astype(np.float32)
    out, _ = _run(Velvia(), VelviaParams(strength=0.0), x)
    assert np.allclose(out, np.clip(x, 0, 1), atol=1e-6)


def test_vibrance_scales_chroma():
    from ansel_tpu.ops.vibrance import Vibrance, VibranceParams

    lab = np.zeros((3, 64, 128), np.float32)
    lab[0] = 50.0
    lab[1] = 30.0
    lab[2] = -20.0
    out, _ = _run(Vibrance(), VibranceParams(amount=50.0), lab,
                  spec=_spec(cs=Colorspace.LAB))
    sw = np.sqrt(30.0**2 + 20.0**2) / 256.0
    assert np.allclose(out[1], 30.0 * (1 + 0.5 * sw), rtol=1e-5)
    assert np.allclose(out[0], 50.0 * (1 - 0.5 * sw * 0.25), rtol=1e-5)


def test_sharpen_increases_local_contrast():
    from ansel_tpu.ops.sharpen import Sharpen, SharpenParams

    lab = np.zeros((3, 64, 128), np.float32)
    lab[0] = 40.0
    lab[0][:, 64:] = 60.0  # step edge
    out, _ = _run(Sharpen(), SharpenParams(radius=2.0, amount=1.0,
                                           threshold=0.0),
                  lab, spec=_spec(cs=Colorspace.LAB))
    # overshoot on both sides of the edge
    assert out[0][:, 63].min() < 40.0 - 0.5
    assert out[0][:, 64].max() > 60.0 + 0.5
    assert np.allclose(out[1:], lab[1:])


def test_graduatednd_darkens_along_gradient():
    from ansel_tpu.ops.graduatednd import GraduatedND, GraduatedNDParams

    x = np.full((3, 64, 128), 0.5, np.float32)
    out, _ = _run(GraduatedND(), GraduatedNDParams(density=2.0, rotation=0.0),
                  x)
    col = out[1, :, 10]
    # positive density darkens the top (sky) at rotation 0
    assert col[0] < col[-1]
    assert col.min() >= 0.5 / 4.5  # max 2 EV attenuation via 1/(c+c1*4)
    assert col.max() <= 0.5 + 1e-5


def test_channelmixerrgb_identity_when_neutral():
    from ansel_tpu.ops.channelmixerrgb import (ChannelMixerRGB,
                                               ChannelMixerRGBParams)
    from ansel_tpu.color.illuminants import ILLUMINANT_PIPE

    rng = np.random.default_rng(1)
    x = rng.uniform(0.01, 1.0, (3, 64, 128)).astype(np.float32)
    p = ChannelMixerRGBParams(illuminant=ILLUMINANT_PIPE, gamut=0.0)
    out, _ = _run(ChannelMixerRGB(), p, x)
    assert np.allclose(out, x, atol=2e-4), np.abs(out - x).max()


def test_channelmixerrgb_warm_illuminant_shifts_blue():
    from ansel_tpu.ops.channelmixerrgb import (ChannelMixerRGB,
                                               ChannelMixerRGBParams)

    x = np.full((3, 64, 128), 0.4, np.float32)
    # scene illuminant = tungsten A -> adaptation must cool the image
    p = ChannelMixerRGBParams(illuminant=1, gamut=0.0)
    out, _ = _run(ChannelMixerRGB(), p, x)
    assert out[2].mean() > out[0].mean()  # blue boosted vs red


def test_channelmixer_grey_projection():
    from ansel_tpu.ops.channelmixerrgb import (ChannelMixerRGB,
                                               ChannelMixerRGBParams)
    from ansel_tpu.color.illuminants import ILLUMINANT_PIPE

    rng = np.random.default_rng(1)
    x = rng.uniform(0.01, 1.0, (3, 64, 128)).astype(np.float32)
    p = ChannelMixerRGBParams(illuminant=ILLUMINANT_PIPE, gamut=0.0,
                              grey=(0.3, 0.5, 0.2, 0.0))
    out, _ = _run(ChannelMixerRGB(), p, x)
    assert np.allclose(out[0], out[1]) and np.allclose(out[1], out[2])


def test_flip_geometry():
    from ansel_tpu.ops.flip import Flip, FlipParams, SWAP_XY, FLIP_X

    x = np.arange(3 * 64 * 128, dtype=np.float32).reshape(3, 64, 128)
    spec = _spec()
    ctx = _ctx()
    op = Flip()
    p = FlipParams(orientation=SWAP_XY | FLIP_X)
    plan = op.plan(ctx, spec, p)
    assert plan.spec_out.width == 64 and plan.spec_out.height == 128
    out = np.asarray(op.apply(x, None, plan, ctx))
    v = out[:, :128, :64]
    expected = np.flip(np.swapaxes(x[:, :64, :128], 1, 2), axis=-1)
    assert np.array_equal(v, expected)


def test_crop_fractions():
    from ansel_tpu.ops.crop import Crop, CropParams

    x = np.random.default_rng(0).uniform(0, 1, (3, 64, 128)).astype(np.float32)
    op = Crop()
    p = CropParams(cx=0.25, cy=0.25, cw=0.75, ch=0.75)
    plan = op.plan(_ctx(), _spec(), p)
    assert plan.spec_out.width == 64 and plan.spec_out.height == 32
    out = np.asarray(op.apply(x, None, plan, _ctx()))
    assert np.array_equal(out[:, :32, :64], x[:, 16:48, 32:96])


def test_lab_op_inserts_conversions():
    from ansel_tpu import HistoryItem
    from ansel_tpu.pipeline.engine import Pipeline
    from ansel_tpu.io.synthetic import synth_raw

    raw, meta, _ = synth_raw(h=64, w=128)
    pipe = Pipeline(meta, [HistoryItem("vibrance", {"amount": 30.0}),
                           HistoryItem("filmicrgb", {})])
    names = [s.name for s in pipe.stages]
    i = names.index("vibrance")
    assert names[i - 1] == "_convert"
    assert names[i + 1] == "_convert"  # back to work RGB for filmic
    assert pipe.stages[i - 1].plan.static == (Colorspace.WORK_RGB,
                                              Colorspace.LAB)


def test_colorbalancergb_identity_when_neutral():
    # regression: out_mat must be XYZ->work (the JzAzBz stage hands back
    # XYZ, not LMS); with the LMS->work matrix the default params mangled
    # saturated colors (hue flips on e.g. [1.2, 1.2, 0.05])
    from ansel_tpu.ops.colorbalancergb import (ColorBalanceRGB,
                                               ColorBalanceRGBParams)

    g = np.linspace(0.05, 1.2, 8, dtype=np.float32)
    R, G, B = np.meshgrid(g, g, g, indexing="ij")
    x = np.stack([R, G, B]).reshape(3, 64, 8)
    out, _ = _run(ColorBalanceRGB(), ColorBalanceRGBParams(), x,
                  spec=ImageSpec(height=64, width=8, channels=3,
                                 colorspace=Colorspace.WORK_RGB))
    assert np.abs(out - x).max() < 5e-3, np.abs(out - x).max()


def test_colorbalancergb_shadow_lift_raises_shadows():
    from ansel_tpu.ops.colorbalancergb import (ColorBalanceRGB,
                                               ColorBalanceRGBParams)

    x = np.full((3, 64, 128), 0.05, np.float32)
    p = ColorBalanceRGBParams(shadows_Y=0.3)
    out, _ = _run(ColorBalanceRGB(), p, x)
    assert out.mean() > x.mean() * 1.1


def test_cacorrectrgb_aligns_fringed_edges():
    import jax

    from ansel_tpu.ops.cacorrectrgb import CACorrectRGB, CACorrectRGBParams

    g = np.zeros((96, 128), np.float32)
    g[:, 64:] = 1.0
    r = np.zeros_like(g)
    r[:, 62:] = 1.0  # red edge shifted left
    b = np.zeros_like(g)
    b[:, 66:] = 1.0  # blue edge shifted right
    x = np.stack([r, g, b]) * 0.8 + 0.05
    p = CACorrectRGBParams(strength=2.0)
    out, _ = _run(CACorrectRGB(), p, x,
                  spec=ImageSpec(height=96, width=128, channels=3,
                                 colorspace=Colorspace.CAMERA_RGB))
    row = out[:, 48, :]
    edges = [int(np.argmax(row[c] > 0.45)) for c in range(3)]
    assert edges == [64, 64, 64], edges  # all channels align to the guide
    # flat areas untouched
    assert np.abs(out[:, :, :40] - x[:, :, :40]).max() < 0.02
