"""Per-op mask + blend stage — the reference's blending engine.

Reference: `/root/reference/src/develop/blend.{c,h}` (params v11,
blend.h:199-238; mode enum blend.h:63-110), per-colorspace pixel loops in
`src/develop/blends/blendif_{lab,rgb_hsl,rgb_jzczhz}.c`:

  * parametric ("blendif") masks: per-channel trapezoid factors with
    precomputed slopes (dt_develop_blendif_process_parameters,
    blend.c:202-236; _blendif_compute_factor, blendif_rgb_jzczhz.c:42-72),
    boost factors in EV, per-channel polarity bits (blendif >> 16)
  * mask post-processing: Gaussian blur, guided-filter feathering,
    opacity-normalized contrast/brightness tone curve
    (blend.c:614-642), combine inversion
  * ~30 blend modes applied with per-pixel local opacity

Drawn (vector) masks and raster side-band masks are scheduled next;
mask_mode SHAPE/RASTER currently contribute a uniform 1.0 shape mask.
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
import numpy as np

from ..color import matrices as cm
from ..color import spaces as sp
from ..color import transforms as tr
from ..core.params import cfield, params
from ..core.types import Colorspace

# blend colorspace ids (blend.h:54-61)
CS_NONE, CS_RAW, CS_LAB, CS_RGB_DISPLAY, CS_RGB_SCENE = range(5)

# mask modes (blend.h:112-120)
MASK_DISABLED = 0
MASK_ENABLED = 1
MASK_SHAPE = 2
MASK_PARAMETRIC = 4
MASK_RASTER = 8

COMBINE_INV = 0x01
COMBINE_INCL = 0x02
COMBINE_MASKS_POS = 0x04

BLENDIF_SIZE = 16
BLEND_REVERSE = 0x80000000
BLEND_MODE_MASK = 0xFF

# modes (blend.h:63-110)
(B_DISABLED, B_NORMAL_OB, B_LIGHTEN, B_DARKEN, B_MULTIPLY, B_AVERAGE, B_ADD,
 B_SUBTRACT, B_DIFFERENCE, B_SCREEN, B_OVERLAY, B_SOFTLIGHT, B_HARDLIGHT,
 B_VIVIDLIGHT, B_LINEARLIGHT, B_PINLIGHT, B_LIGHTNESS, B_CHROMATICITY,
 B_HUE, B_COLOR) = range(0x14)
B_COLORADJUST = 0x16
B_HSV_VALUE = 0x1C
B_HSV_COLOR = 0x1D
B_DIFFERENCE2 = 0x17
B_NORMAL2 = 0x18
B_BOUNDED = 0x19
B_LAB_LIGHTNESS = 0x1A
B_LAB_COLOR = 0x1B
B_LAB_L = 0x1E
B_LAB_A = 0x1F
B_LAB_B = 0x20
B_RGB_R = 0x21
B_RGB_G = 0x22
B_RGB_B = 0x23
B_SUBTRACT_INVERSE = 0x25
B_DIVIDE = 0x26
B_DIVIDE_INVERSE = 0x27
B_GEOMETRIC_MEAN = 0x28
B_HARMONIC_MEAN = 0x29


@params(op="_blend", version=11)
@dataclasses.dataclass
class BlendParams:
    """dt_develop_blend_params_t v11 (blend.h:199-238)."""

    mask_mode: int = cfield("I", MASK_DISABLED)
    blend_cst: int = cfield("i", CS_NONE)
    blend_mode: int = cfield("I", B_NORMAL2)
    blend_parameter: float = cfield("f", 0.0)
    opacity: float = cfield("f", 100.0)
    mask_combine: int = cfield("I", 0)
    mask_id: int = cfield("I", 0)
    blendif: int = cfield("I", 0)
    feathering_radius: float = cfield("f", 0.0)
    feathering_guide: int = cfield("I", 1)
    blur_radius: float = cfield("f", 0.0)
    contrast: float = cfield("f", 0.0)
    brightness: float = cfield("f", 0.0)
    details: float = cfield("f", 0.0)
    reserved: tuple = cfield("3I", (0, 0, 0))
    blendif_parameters: tuple = cfield(f"{4 * BLENDIF_SIZE}f",
                                       (0.0,) * (4 * BLENDIF_SIZE))
    blendif_boost_factors: tuple = cfield(f"{BLENDIF_SIZE}f",
                                          (0.0,) * BLENDIF_SIZE)
    raster_mask_source: str = cfield("s:20", "")
    raster_mask_instance: int = cfield("i", 0)
    raster_mask_id: int = cfield("i", 0)
    raster_mask_invert: int = cfield("i", 0)


def decode_blend_params(raw: bytes):
    if raw is None:
        return None
    try:
        return BlendParams.codec.decode(bytes(raw))
    except Exception:
        return None


def blend_is_active(bp: BlendParams) -> bool:
    return bp is not None and bp.mask_mode != MASK_DISABLED


def prepare_parameters(bp: BlendParams) -> np.ndarray:
    """-> (16, 6) trapezoid params with precomputed slopes
    (dt_develop_blendif_process_parameters, blend.c:202-236)."""
    out = np.zeros((BLENDIF_SIZE, 6), np.float32)
    for i in range(BLENDIF_SIZE):
        if not (bp.blendif & (1 << i)):
            continue
        offset = 0.0
        if bp.blend_cst == CS_LAB and i in (1, 2, 5, 6):
            offset = 0.5
        boost = 2.0 ** bp.blendif_boost_factors[i]
        p = [(bp.blendif_parameters[i * 4 + k] - offset) * boost
             for k in range(4)]
        s_up = 1.0 / max(0.001, p[1] - p[0])
        s_dn = 1.0 / max(0.001, p[3] - p[2])
        if (bp.blendif_parameters[i * 4] <= 0.0
                and bp.blendif_parameters[i * 4 + 1] <= 0.0):
            p[0], p[1] = -np.inf, -np.inf
        if (bp.blendif_parameters[i * 4 + 2] >= 1.0
                and bp.blendif_parameters[i * 4 + 3] >= 1.0):
            p[2], p[3] = np.inf, np.inf
        out[i] = (*p, s_up, s_dn)
    return out


def _factor(value, prm, invert):
    p0, p1, p2, p3, s_up, s_dn = (prm[k] for k in range(6))
    f = jnp.where(
        value <= p0, 0.0,
        jnp.where(value < p1, (value - p0) * s_up,
                  jnp.where(value <= p2, 1.0,
                            jnp.where(value < p3, 1.0 - (value - p2) * s_dn,
                                      0.0))))
    return 1.0 - f if invert else f


def _atan2(y, x):
    """Pallas-safe atan2 (TPU Mosaic has no atan lowering): minimax poly,
    |err| < 2e-7 rad — inside every blend tolerance.  Shared by the XLA
    and fused-kernel paths so they agree bit-for-bit."""
    from ..kernels.pointwise import atan2_full

    return atan2_full(y, x)


def _scene_channels(rgb, y_weights, needed=None):
    """channel values for CS_RGB_SCENE (blendif_rgb_jzczhz.c).
    Pallas-safe: scalar-FMA gray, nested-list matrix.  With `needed`
    (static channel-id set) the JzCzhz trio is skipped when unused —
    the fused kernel shouldn't pay two matrix applies + pows for dead
    channels."""
    w = [float(v) for v in np.asarray(y_weights).reshape(-1)[:3]]
    gray = w[0] * rgb[0] + w[1] * rgb[1] + w[2] * rgb[2]
    out = {0: gray, 1: rgb[0], 2: rgb[1], 3: rgb[2]}
    if needed is None or needed & {8, 9, 10}:
        xyz = tr.apply_matrix(
            jnp.maximum(rgb, 0.0),
            (cm.XYZ_D50_TO_D65 @ cm.XYZ_FROM_WORK).tolist())
        jab = sp.xyz_to_jzazbz(xyz)
        out[8] = jab[0]
        out[9] = jnp.sqrt(jab[1] ** 2 + jab[2] ** 2)
        out[10] = _atan2(jab[2], jab[1]) / (2.0 * math.pi) + 0.5
    return out


def _lab_channels(lab):
    L = lab[0] / 100.0
    a = lab[1] / 256.0
    b = lab[2] / 256.0
    C = jnp.sqrt(lab[1] ** 2 + lab[2] ** 2) / (128.0 * math.sqrt(2.0))
    h = _atan2(lab[2], lab[1]) / (2.0 * math.pi) + 0.5
    return {0: L, 1: a, 2: b, 8: C, 9: h}


def compute_mask(a, b, bp: BlendParams, prm, cst: int, y_weights,
                 drawn=None, raster=None, rawdetail=None):
    """drawn + parametric mask in [0,1] incl. opacity and post-processing.
    Combine semantics follow blendif_rgb_hsl.c:236-340: the drawn mask is
    the base, the parametric factors form `temp`, and INCL/INV pick the
    composition."""
    opacity = min(max(bp.opacity / 100.0, 0.0), 1.0)
    incl = bool(bp.mask_combine & COMBINE_INCL)
    inv = bool(bp.mask_combine & COMBINE_INV)

    if bp.mask_mode & MASK_RASTER:
        # raster side-band: the mask IS an upstream module's blend mask
        # (blend.c:_develop_blend_init_raster_mask:509-545).  The engine
        # resolves the source and hard-errors on a NAMED source that is
        # missing; an EMPTY source fills the mask (blend.c:540-543).
        if raster is None:
            fill = 0.0 if bp.raster_mask_invert else 1.0
            return jnp.full_like(a[0], fill * opacity)
        mask = (1.0 - raster) if bp.raster_mask_invert else raster
        return mask * opacity

    # base (drawn) mask (blend.c:_develop_blend_init_drawn_mask)
    if bp.mask_mode & MASK_SHAPE:
        if drawn is not None:
            base = drawn
            if bp.mask_combine & COMBINE_MASKS_POS:
                base = 1.0 - base
        else:
            base = jnp.full_like(
                a[0], 0.0 if bp.mask_combine & COMBINE_MASKS_POS else 1.0)
    else:
        base = jnp.full_like(a[0], 0.0 if incl else 1.0)

    parametric = bool(bp.mask_mode & MASK_PARAMETRIC)
    temp = jnp.ones_like(a[0])
    if parametric:
        chans_in = (_lab_channels(a) if cst == CS_LAB
                    else _scene_channels(a, y_weights))
        chans_out = (_lab_channels(b) if cst == CS_LAB
                     else _scene_channels(b, y_weights))
        out_offset = 4
        for i, val in chans_in.items():
            if bp.blendif & (1 << i):
                temp = temp * _factor(
                    val, prm[i],
                    bool(bp.blendif & (1 << (16 + i))) ^ incl)
        for i, val in chans_out.items():
            j = i + out_offset
            if bp.blendif & (1 << j):
                temp = temp * _factor(
                    val, prm[j],
                    bool(bp.blendif & (1 << (16 + j))) ^ incl)

    if parametric:
        if incl:
            mask = ((1.0 - base) * temp if inv
                    else 1.0 - (1.0 - base) * temp)
        else:
            mask = (1.0 - base * temp) if inv else base * temp
    else:
        mask = (1.0 - base) if inv else base
    mask = mask * opacity

    # details slider: refine by the demosaic-stage raw-detail mask
    # (blend.c:_refine_with_detail_mask:349-358 + _detail_mask_threshold)
    if abs(bp.details) > 1e-6 and rawdetail is not None:
        from ..pixel import detail as detail_mod

        want_detail = bp.details > 0.0
        thr = 0.005 * (bp.details ** 2 if want_detail
                       else 1.0 - abs(bp.details) ** 0.5)
        dm = detail_mod.detail_mask(rawdetail, max(thr, 1e-6),
                                    detail=want_detail)
        mask = mask * dm

    # post: feathering (guided filter on the blend input's luma) then blur
    if bp.feathering_radius > 0.1:
        from ..pixel.guided import guided_filter

        w = jnp.asarray(y_weights, a.dtype).reshape(3, 1, 1)
        guide = jnp.sum((a if cst != CS_LAB else a / 100.0) * w, axis=0)
        r = max(1, int(bp.feathering_radius))
        mask = jnp.clip(guided_filter(guide, mask, r, 1e-4), 0.0, 1.0)
    if bp.blur_radius > 0.1:
        from ..pixel.blur import gaussian_blur

        mask = gaussian_blur(mask, bp.blur_radius)
    if abs(bp.contrast) >= 0.01 or abs(bp.brightness) >= 0.01:
        # opacity-normalized sigmoid tone curve (blend.c:614-642)
        e = math.exp(3.0 * bp.contrast)
        x = mask / max(opacity, 1e-6)
        x = 2.0 * x - 1.0
        br = bp.brightness
        if br > 0.0:
            x = jnp.minimum((x + br) / (1.0 - br), 1.0)
        elif br < 0.0:
            x = jnp.maximum((x + br) / (1.0 + br), -1.0)
        mask = jnp.clip(
            (x * e / (1.0 + (e - 1.0) * jnp.abs(x))) / 2.0 + 0.5, 0.0, 1.0
        ) * opacity
    return mask


def _luma(rgb, y_weights):
    """Pallas-safe luma: three scalar FMAs (no captured weight array)."""
    w = [float(v) for v in np.asarray(y_weights).reshape(-1)[:3]]
    return w[0] * rgb[0] + w[1] * rgb[1] + w[2] * rgb[2]


def _mode_fn(mode: int, p: float, cst: int):
    """b-over-a blend value (before local-opacity lerp)."""
    pw = 2.0 ** p

    def lab_pack(L, ab_src):
        return lambda a, b: jnp.stack([L(a, b), ab_src(a, b)[0],
                                       ab_src(a, b)[1]])

    table = {
        B_NORMAL2: lambda a, b: b * pw,
        B_NORMAL_OB: lambda a, b: b * pw,
        B_DISABLED: lambda a, b: b * pw,
        B_BOUNDED: lambda a, b: jnp.clip(b * pw, 0.0, 1.0),
        B_LIGHTEN: lambda a, b: jnp.maximum(a, b * pw),
        B_DARKEN: lambda a, b: jnp.minimum(a, b * pw),
        B_MULTIPLY: lambda a, b: a * b * pw,
        B_AVERAGE: lambda a, b: (a + b) / 2.0,
        B_ADD: lambda a, b: a + pw * b,
        B_SUBTRACT: lambda a, b: jnp.maximum(a - pw * b, 0.0),
        B_SUBTRACT_INVERSE: lambda a, b: jnp.maximum(b - pw * a, 0.0),
        B_DIFFERENCE: lambda a, b: jnp.abs(a - b),
        B_DIFFERENCE2: lambda a, b: jnp.abs(a - b),
        B_SCREEN: lambda a, b: 1.0 - (1.0 - a) * (1.0 - b * pw),
        B_DIVIDE: lambda a, b: a / jnp.maximum(pw * b, 1e-6),
        B_DIVIDE_INVERSE: lambda a, b: b / jnp.maximum(pw * a, 1e-6),
        B_GEOMETRIC_MEAN: lambda a, b: jnp.sqrt(jnp.maximum(a * b, 0.0)),
        B_HARMONIC_MEAN: lambda a, b: 2.0 * a * b
        / jnp.maximum(a + b, 1e-6),
        B_OVERLAY: lambda a, b: jnp.where(
            a > 0.5, 1.0 - 2.0 * (1.0 - a) * (1.0 - b), 2.0 * a * b),
        B_HARDLIGHT: lambda a, b: jnp.where(
            b > 0.5, 1.0 - 2.0 * (1.0 - a) * (1.0 - b), 2.0 * a * b),
        B_SOFTLIGHT: lambda a, b: jnp.where(
            b > 0.5, 1.0 - (1.0 - a) * (1.0 - (b - 0.5)),
            a * (b + 0.5)),
        B_LINEARLIGHT: lambda a, b: a + 2.0 * b - 1.0,
        B_VIVIDLIGHT: lambda a, b: jnp.where(
            b > 0.5,
            a / jnp.maximum(2.0 * (1.0 - b), 1e-6),
            1.0 - (1.0 - a) / jnp.maximum(2.0 * b, 1e-6)),
        B_PINLIGHT: lambda a, b: jnp.where(
            b > 0.5, jnp.maximum(a, 2.0 * (b - 0.5)),
            jnp.minimum(a, 2.0 * b)),
    }
    return table.get(mode)


def apply_blend(a, b, bp: BlendParams, prm, cst: int, y_weights,
                drawn=None, raster=None, rawdetail=None,
                return_mask=False):
    """a = module input, b = module output, both (3, H, W) in the blend
    colorspace -> blended result (optionally also the final mask, for
    the raster side-band)."""
    mask2d = compute_mask(a, b, bp, prm, cst, y_weights, drawn=drawn,
                          raster=raster, rawdetail=rawdetail)
    out = _apply_blend_mode(a, b, bp, cst, y_weights, mask2d[None])
    return (out, mask2d) if return_mask else out


# ---- hue/color-family helpers (blendif_rgb_hsl.c / blendif_lab.c) ----

def _rgb_to_hsl(rgb):
    r, g, b = rgb[0], rgb[1], rgb[2]
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    l = 0.5 * (mx + mn)
    d = mx - mn
    s = jnp.where(d < 1e-9, 0.0,
                  jnp.where(l > 0.5, d / jnp.maximum(2.0 - mx - mn, 1e-9),
                            d / jnp.maximum(mx + mn, 1e-9)))
    dd = jnp.maximum(d, 1e-9)
    hr = jnp.where(g < b, (g - b) / dd + 6.0, (g - b) / dd)
    hg = (b - r) / dd + 2.0
    hb = (r - g) / dd + 4.0
    h = jnp.where(mx == r, hr, jnp.where(mx == g, hg, hb)) / 6.0
    h = jnp.where(d < 1e-9, 0.0, h)
    return jnp.stack([h, s, l])


def _hsl_to_rgb(hsl):
    h, s, l = hsl[0], hsl[1], hsl[2]
    q = jnp.where(l < 0.5, l * (1.0 + s), l + s - l * s)
    p = 2.0 * l - q

    def hue2rgb(t):
        t = jnp.mod(t + 1.0, 1.0)
        return jnp.where(
            t < 1.0 / 6.0, p + (q - p) * 6.0 * t,
            jnp.where(t < 0.5, q,
                      jnp.where(t < 2.0 / 3.0,
                                p + (q - p) * (2.0 / 3.0 - t) * 6.0, p)))

    gray = hsl[1] < 1e-9
    return jnp.stack([jnp.where(gray, l, hue2rgb(h + 1.0 / 3.0)),
                      jnp.where(gray, l, hue2rgb(h)),
                      jnp.where(gray, l, hue2rgb(h - 1.0 / 3.0))])


def _rgb_to_hsv(rgb):
    r, g, b = rgb[0], rgb[1], rgb[2]
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    d = mx - mn
    dd = jnp.maximum(d, 1e-9)
    hr = jnp.mod((g - b) / dd, 6.0)
    hg = (b - r) / dd + 2.0
    hb = (r - g) / dd + 4.0
    h = jnp.where(mx == r, hr, jnp.where(mx == g, hg, hb)) / 6.0
    h = jnp.where(d < 1e-9, 0.0, h)
    s = jnp.where(mx < 1e-9, 0.0, d / jnp.maximum(mx, 1e-9))
    return jnp.stack([h, s, mx])


def _hsv_to_rgb(hsv):
    h, s, v = jnp.mod(hsv[0], 1.0) * 6.0, hsv[1], hsv[2]
    i = jnp.minimum(jnp.floor(h), 5.0)  # float sextant: Pallas-safe selects
    f = h - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))

    def pick(c0, c1, c2, c3, c4, c5):
        out = c5
        for k, ck in ((4.0, c4), (3.0, c3), (2.0, c2), (1.0, c1), (0.0, c0)):
            out = jnp.where(i <= k, ck, out)
        return out

    return jnp.stack([pick(v, q, p, p, t, v),
                      pick(t, v, v, q, p, p),
                      pick(p, p, t, v, v, q)])


def _hue_mix(ha, hb, op):
    """Blend hue along the shortest distance on the color circle
    (blendif_rgb_hsl.c:724-727); op = per-pixel opacity."""
    d = jnp.abs(ha - hb)
    s = jnp.where(d > 0.5, -op * (1.0 - d) / jnp.maximum(d, 1e-9), op)
    return jnp.mod(ha * (1.0 - s) + hb * s + 1.0, 1.0)


def _lab_to_lch01(lab):
    """Scaled Lab (L/100, ab/128) -> (L, C, h01) like dt_Lab_2_LCH."""
    L = lab[0] / 100.0
    a_ = lab[1] / 128.0
    b_ = lab[2] / 128.0
    c = jnp.sqrt(a_ * a_ + b_ * b_)
    h = jnp.mod(_atan2(b_, a_) / (2.0 * np.pi) + 1.0, 1.0)
    return L, c, h


def _lch01_to_lab(L, c, h):
    ang = 2.0 * np.pi * h
    return jnp.stack([L * 100.0, jnp.cos(ang) * c * 128.0,
                      jnp.sin(ang) * c * 128.0])


def _blend_hue_family(a, b, mode, cst, mask):
    """HUE / COLOR / COLORADJUST / HSV_VALUE / HSV_COLOR — the opacity
    acts on the polar components, not as a final lerp (blendif_lab.c:
    874-977, blendif_rgb_hsl.c:707-858)."""
    op = mask[0] if getattr(mask, "ndim", 0) == 3 else mask
    if cst == CS_LAB:
        La, Ca, Ha = _lab_to_lch01(a)
        Lb, Cb, Hb = _lab_to_lch01(b)
        if mode == B_HUE:
            return _lch01_to_lab(La, Ca, _hue_mix(Ha, Hb, op))
        if mode == B_COLOR:
            return _lch01_to_lab(La, Ca * (1 - op) + Cb * op,
                                 _hue_mix(Ha, Hb, op))
        if mode == B_COLORADJUST:
            return _lch01_to_lab(Lb, Ca * (1 - op) + Cb * op,
                                 _hue_mix(Ha, Hb, op))
        # HSV modes are display-RGB only; fall back to the lightness mix
        if mode == B_HSV_VALUE:
            return jnp.stack([La * (1 - op) * 100.0 + Lb * op * 100.0,
                              a[1], a[2]])
        return jnp.stack([a[0], b[1] * op + a[1] * (1 - op),
                          b[2] * op + a[2] * (1 - op)])
    ca = jnp.clip(a, 0.0, 1.0)
    cb = jnp.clip(b, 0.0, 1.0)
    if mode in (B_HSV_VALUE, B_HSV_COLOR):
        ta = _rgb_to_hsv(a)
        tb = _rgb_to_hsv(b)
        if mode == B_HSV_VALUE:
            out = jnp.stack([ta[0], ta[1],
                             ta[2] * (1 - op) + tb[2] * op])
        else:
            xa = ta[1] * jnp.cos(2 * np.pi * ta[0])
            ya = ta[1] * jnp.sin(2 * np.pi * ta[0])
            xb = tb[1] * jnp.cos(2 * np.pi * tb[0])
            yb = tb[1] * jnp.sin(2 * np.pi * tb[0])
            xc = xa * (1 - op) + xb * op
            yc = ya * (1 - op) + yb * op
            h = jnp.mod(_atan2(yc, xc) / (2 * np.pi) + 1.0, 1.0)
            out = jnp.stack([h, jnp.sqrt(xc * xc + yc * yc), ta[2]])
        return _hsv_to_rgb(out)
    ta = _rgb_to_hsl(ca)
    tb = _rgb_to_hsl(cb)
    if mode == B_HUE:
        out = jnp.stack([_hue_mix(ta[0], tb[0], op), ta[1], ta[2]])
    elif mode == B_COLOR:
        out = jnp.stack([_hue_mix(ta[0], tb[0], op),
                         ta[1] * (1 - op) + tb[1] * op, ta[2]])
    else:  # B_COLORADJUST: lightness from module output
        out = jnp.stack([_hue_mix(ta[0], tb[0], op),
                         ta[1] * (1 - op) + tb[1] * op, tb[2]])
    return jnp.clip(_hsl_to_rgb(out), 0.0, 1.0)


def apply_blend_raw(a, b, bp: BlendParams, drawn=None):
    """RAW blend colorspace (blend.h:57 DEVELOP_BLEND_CS_RAW,
    blendif_raw.c): single-channel mosaic, drawn mask + global opacity
    only (no parametric channels), elementwise mode table."""
    opacity = min(max(bp.opacity / 100.0, 0.0), 1.0)
    if bp.mask_mode & MASK_SHAPE and drawn is not None:
        base = drawn
        if bp.mask_combine & COMBINE_MASKS_POS:
            base = 1.0 - base
    else:
        base = jnp.ones_like(a)
    if bp.mask_combine & COMBINE_INV:
        base = 1.0 - base
    mask = base * opacity
    mode = bp.blend_mode & BLEND_MODE_MASK
    aa, bb = (b, a) if bp.blend_mode & BLEND_REVERSE else (a, b)
    fn = _mode_fn(mode, bp.blend_parameter, CS_RGB_SCENE)
    if fn is None:
        fn = _mode_fn(B_NORMAL2, bp.blend_parameter, CS_RGB_SCENE)
    return aa * (1.0 - mask) + fn(aa, bb) * mask


def blend_fusable_pointwise(bp: BlendParams, cst: int) -> bool:
    """True when this blend is pure per-pixel math — no drawn/raster
    mask, no spatial mask post-processing (feathering / blur / details
    refinement) — so the engine may fold it into the fused Pallas
    pointwise chain.  The reference applies blending as one more stage
    of the per-pixel node loop (pixelpipe_cpu.c:18-100); this is the
    TPU equivalent: the blend rides the same VMEM tile as the op."""
    if bp is None or bp.mask_mode == MASK_DISABLED:
        return False
    if cst not in (CS_LAB, CS_RGB_SCENE):
        return False
    if bp.mask_mode & (MASK_SHAPE | MASK_RASTER):
        return False
    if bp.feathering_radius > 0.1 or bp.blur_radius > 0.1:
        return False
    if abs(bp.details) > 1e-6:
        return False
    return True


def apply_blend_pointwise(a, b, bp: BlendParams, prm, cst: int, y_weights):
    """Pallas-safe apply_blend for the fused pointwise chain.

    Every blend parameter is STATIC (history-side): the trapezoid rows
    arrive via `prm` (numpy (16,6)) and unroll to float immediates, and
    a uniform (non-parametric) mask collapses to a Python scalar at
    trace time so the lerp folds into the mode math.  Equality with
    apply_blend is gated by tests/test_blend_fusion.py."""
    opacity = min(max(bp.opacity / 100.0, 0.0), 1.0)
    incl = bool(bp.mask_combine & COMBINE_INCL)
    inv = bool(bp.mask_combine & COMBINE_INV)
    base = 0.0 if incl else 1.0  # no drawn mask in the fusable subset

    in_ids = {0, 1, 2, 8, 9} if cst == CS_LAB else {0, 1, 2, 3, 8, 9, 10}
    need_in = {i for i in in_ids if bp.blendif & (1 << i)}
    need_out = {i for i in in_ids if bp.blendif & (1 << (i + 4))}
    parametric = bool(bp.mask_mode & MASK_PARAMETRIC)

    temp = None
    if parametric and (need_in or need_out):
        prm = np.asarray(prm)

        def factors(x, ids, offset):
            nonlocal temp
            chans = (_lab_channels(x) if cst == CS_LAB
                     else _scene_channels(x, y_weights, needed=ids))
            for i in sorted(ids):
                j = i + offset
                f = _factor(chans[i], [float(v) for v in prm[j]],
                            bool(bp.blendif & (1 << (16 + j))) ^ incl)
                temp = f if temp is None else temp * f

        factors(a, need_in, 0)
        factors(b, need_out, 4)

    if temp is None:
        mask = (1.0 - base) if inv else base
    elif incl:
        mask = (1.0 - base) * temp if inv else 1.0 - (1.0 - base) * temp
    else:
        mask = (1.0 - base * temp) if inv else base * temp
    mask = mask * opacity

    if abs(bp.contrast) >= 0.01 or abs(bp.brightness) >= 0.01:
        # opacity-normalized sigmoid tone curve (blend.c:614-642)
        e = math.exp(3.0 * bp.contrast)
        x = mask / max(opacity, 1e-6)
        x = 2.0 * x - 1.0
        br = bp.brightness
        if isinstance(mask, float):
            if br > 0.0:
                x = min((x + br) / (1.0 - br), 1.0)
            elif br < 0.0:
                x = max((x + br) / (1.0 + br), -1.0)
            mask = min(max((x * e / (1.0 + (e - 1.0) * abs(x))) / 2.0
                           + 0.5, 0.0), 1.0) * opacity
        else:
            if br > 0.0:
                x = jnp.minimum((x + br) / (1.0 - br), 1.0)
            elif br < 0.0:
                x = jnp.maximum((x + br) / (1.0 + br), -1.0)
            mask = jnp.clip(
                (x * e / (1.0 + (e - 1.0) * jnp.abs(x))) / 2.0 + 0.5,
                0.0, 1.0) * opacity

    mask3 = mask if isinstance(mask, float) else mask[None]
    return _apply_blend_mode(a, b, bp, cst, y_weights, mask3)


def _apply_blend_mode(a, b, bp: BlendParams, cst: int, y_weights, mask):
    mode = bp.blend_mode & BLEND_MODE_MASK
    if bp.blend_mode & BLEND_REVERSE:
        a, b = b, a
    p = bp.blend_parameter

    if mode in (B_HUE, B_COLOR, B_COLORADJUST, B_HSV_VALUE, B_HSV_COLOR):
        return _blend_hue_family(a, b, mode, cst, mask)

    # channel-replace modes
    if mode in (B_RGB_R, B_RGB_G, B_RGB_B, B_LAB_L, B_LAB_A, B_LAB_B):
        ch = {B_RGB_R: 0, B_RGB_G: 1, B_RGB_B: 2,
              B_LAB_L: 0, B_LAB_A: 1, B_LAB_B: 2}[mode]
        # explicit channel stack (Pallas-safe; .at[].set is not)
        blended = jnp.stack([b[k] * (2.0**p) if k == ch else a[k]
                             for k in range(3)])
        return a * (1.0 - mask) + blended * mask
    if mode in (B_LIGHTNESS, B_LAB_LIGHTNESS):
        if cst == CS_LAB:
            blended = jnp.stack([b[0], a[1], a[2]])
        else:
            la, lb = (_luma(v, y_weights) for v in (a, b))
            blended = a * (lb / jnp.maximum(la, 1e-6))[None]
        return a * (1.0 - mask) + blended * mask
    if mode in (B_CHROMATICITY, B_LAB_COLOR):
        if cst == CS_LAB:
            blended = jnp.stack([a[0], b[1], b[2]])
        else:
            la, lb = (_luma(v, y_weights) for v in (a, b))
            blended = b * (la / jnp.maximum(lb, 1e-6))[None]
        return a * (1.0 - mask) + blended * mask

    fn = _mode_fn(mode, p, cst)
    if fn is None:
        fn = _mode_fn(B_NORMAL2, p, cst)
    return a * (1.0 - mask) + fn(a, b) * mask
