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
    # JzAzBz formula: neutral is identity in-gamut.  The dt UCS v5
    # default formula soft-clips high saturations even when neutral
    # (reference behavior) and is mirror-tested separately.
    out, _ = _run(ColorBalanceRGB(),
                  ColorBalanceRGBParams(saturation_formula=0), x,
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


def test_colorbalancergb_dtucs_mirror():
    """dt UCS saturation branch vs a numpy mirror of
    colorbalancergb.c:841-884 with the exact 360-entry gamut LUT (ours
    evaluates a Fourier fit of the same LUT)."""
    import numpy as np

    from ansel_tpu.color import matrices as cm
    from ansel_tpu.ops import colorbalancergb as C

    def mirror(xyz, lut, L_white, boost_s=0.0, boost_b=0.0):
        X, Y, Z = xyz
        s = np.maximum(X + Y + Z, 1e-12)
        xy = np.stack([X / s, Y / s], -1).reshape(-1, 2)
        Up, Vp = C._xyY_to_ucs_uv_np(xy)
        Up = Up.reshape(X.shape)
        Vp = Vp.reshape(X.shape)
        M2 = Up * Up + Vp * Vp
        H = np.arctan2(Vp, Up)
        Yh = np.maximum(Y, 1e-12) ** 0.631651345306265
        L_star = 2.098883786377 * Yh / (Yh + 1.12426773749357)
        J = L_star / L_white
        Cc = 15.932993652962535 * L_star ** 0.6523997524738018 \
            * M2 ** 0.6007557017508491 / L_white
        B = J * (Cc ** 1.33654221029386 + 1.0)
        radius = np.hypot(Cc, B)
        sin_T = np.where(radius > 0, Cc / radius, 0.0)
        cos_T = np.where(radius > 0, B / radius, 0.0)
        P = np.maximum(Cc, np.finfo(np.float32).tiny)
        W = sin_T * Cc + cos_T * B
        a = np.maximum(1.0 + boost_s, 0.0)
        b = np.maximum(1.0 + boost_b, 0.0)
        max_a = np.hypot(P, W) / P
        soft, norm = 0.5 * max_a, max_a - 0.5 * max_a
        a = np.where(a > soft, soft + (1 - np.exp(-(a - soft) / norm))
                     * norm, a)
        P_p = (a - 1.0) * P
        W_p = np.sqrt(np.maximum(P * P * (1 - a * a), 0.0) + W * W) * b
        C2 = np.maximum(cos_T * P_p + sin_T * W_p, 0.0)
        B2 = np.maximum(-sin_T * P_p + cos_T * W_p, 0.0)
        J2 = B2 / (C2 ** 1.33654221029386 + 1.0)
        # exact LUT lookup with linear interpolation (lookup_gamut)
        xt = (360 - 1) * (H + np.pi) / (2 * np.pi)
        x0 = np.floor(xt).astype(int) % 360
        x1 = np.ceil(xt).astype(int) % 360
        f = xt - np.floor(xt)
        maxM2 = lut[x0] * (1 - f) + lut[x1] * f
        max_chroma = 15.932993652962535 \
            * np.maximum(J2 * L_white, 1e-12) ** 0.6523997524738018 \
            * maxM2 ** 0.6007557017508491 / L_white
        B_bound = J2 * (max_chroma ** 1.33654221029386 + 1.0)
        S_bound = max_chroma / np.maximum(B_bound, 1e-20)
        S = np.where(B2 > 0, C2 / np.maximum(B2, 1e-20), 0.0)
        soft, norm = 0.8 * S_bound, 0.2 * S_bound
        S = np.where(S > soft, soft + (1 - np.exp(-(S - soft)
                                                  / np.maximum(norm, 1e-12)))
                     * np.maximum(norm, 1e-12), S)
        C3 = S * B2
        J3 = B2 / (C3 ** 1.33654221029386 + 1.0)
        L3 = J3 * L_white
        M3 = np.maximum(C3 * L_white / (15.932993652962535
                        * np.maximum(L3, 1e-12) ** 0.6523997524738018),
                        0.0) ** 0.8322850678616855
        Up3, Vp3 = M3 * np.cos(H), M3 * np.sin(H)
        Us3 = -5.037522385190711 * Up3 - 2.504856328185843 * Vp3
        Vs3 = 4.760029407436461 * Up3 + 2.874012963239247 * Vp3
        U3 = -1.49217352929 * Us3 / (np.abs(Us3) - 1.39656225667)
        V3 = -1.52488637914 * Vs3 / (np.abs(Vs3) - 1.4513954287)
        xd_n = (0.167171472114775 * U3 + 0.141299802443708 * V3
                - 0.00801531300850582)
        yd_n = (-0.150959086409163 * U3 - 0.155185060382272 * V3
                - 0.00843312433578007)
        dd = (0.940254742367256 * U3 + V3 - 0.0256325967652889)
        xd, yd = xd_n / dd, yd_n / dd
        Y3 = np.maximum(1.12426773749357 * L3
                        / np.maximum(2.098883786377 - L3, 1e-9),
                        0.0) ** 1.5831518565279648
        X3 = xd * Y3 / np.maximum(yd, 1e-9)
        Z3 = (1 - xd - yd) * Y3 / np.maximum(yd, 1e-9)
        return np.stack([X3, Y3, Z3])

    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    xyz = rng.uniform(0.05, 0.9, (3, 24, 24)).astype(np.float32)
    m = cm.XYZ_D50_TO_D65 @ cm.XYZ_FROM_WORK
    lut = C._gamut_lut(1, m)
    Lw = 2.098883786377 * 2.0 ** 0.631651345306265 \
        / (2.0 ** 0.631651345306265 + 1.12426773749357)
    op = C.ColorBalanceRGB()
    for bs, bb in ((0.0, 0.0), (0.4, 0.0), (0.0, 0.3), (-0.3, 0.2)):
        want = mirror(xyz.astype(np.float64), lut, Lw, bs, bb)
        got = np.asarray(op._saturation_dtucs(
            jnp.asarray(xyz),
            {"L_white": np.float32(Lw),
             "gamut_f": C._fourier_fit(lut)},
            jnp.full(xyz.shape[1:], bs), jnp.full(xyz.shape[1:], bb)))
        err = np.abs(got - want)
        # tolerance covers the Fourier-vs-LUT boundary difference
        assert err.max() < 0.035, (bs, bb, err.max())
        assert np.median(err) < 2e-3, (bs, bb, np.median(err))
