"""Independent NumPy transcription of the reference channelmixerrgb pixel
math, used as the ΔE oracle for ansel_tpu/ops/channelmixerrgb.py.

Transcribed from:
  * `/root/reference/src/iop/channelmixerrgb.c` — loop_switch (:757-960),
    gamut_mapping (:633-700), luma_chroma (:701-756), commit_params
    (:3000-3060: MIX/saturation/lightness/grey normalization, illuminant
    LMS, Bradford exponent p)
  * `/root/reference/src/pixel/chromatic_adaptation.h` — Bradford/CAT16
    LMS matrices and the D50-referenced adaptation products.

Float64 throughout (the oracle should be more precise than the DUT).
"""

from __future__ import annotations

import numpy as np

ADAPT_LINEAR_BRADFORD, ADAPT_CAT16, ADAPT_FULL_BRADFORD, ADAPT_XYZ, \
    ADAPT_RGB = 0, 1, 2, 3, 4
V1, V2, V3 = 0, 1, 2

XYZ_TO_BRADFORD = np.array([[0.8951, 0.2664, -0.1614],
                            [-0.7502, 1.7135, 0.0367],
                            [0.0389, -0.0685, 1.0296]])
BRADFORD_TO_XYZ = np.array([[0.9870, -0.1471, 0.1600],
                            [0.4323, 0.5184, 0.0493],
                            [-0.0085, 0.0400, 0.9685]])
XYZ_TO_CAT16 = np.array([[0.401288, 0.650173, -0.051461],
                         [-0.250268, 1.204414, 0.045854],
                         [-0.002079, 0.048952, 0.953127]])
CAT16_TO_XYZ = np.array([[1.862068, -1.011255, 0.149187],
                         [0.38752, 0.621447, -0.008974],
                         [-0.015841, -0.034123, 1.049964]])
D50_BRADFORD = np.array([0.996078, 1.020646, 0.818155])
D50_CAT16 = np.array([0.994535, 1.000997, 0.833036])
D50_XYZ = np.array([0.9642119944211994, 1.0, 0.8251882845188288])

NORM_MIN = 1.52587890625e-05
INV_SQRT3 = 1.0 / np.sqrt(3.0)


def xyz_to_lms(xyz, kind):
    if kind in (ADAPT_LINEAR_BRADFORD, ADAPT_FULL_BRADFORD):
        return xyz @ XYZ_TO_BRADFORD.T
    if kind == ADAPT_CAT16:
        return xyz @ XYZ_TO_CAT16.T
    return xyz.copy()


def lms_to_xyz(lms, kind):
    if kind in (ADAPT_LINEAR_BRADFORD, ADAPT_FULL_BRADFORD):
        return lms @ BRADFORD_TO_XYZ.T
    if kind == ADAPT_CAT16:
        return lms @ CAT16_TO_XYZ.T
    return lms.copy()


def illuminant_xy_to_XYZ(x, y):
    return np.array([x / y, 1.0, (1.0 - x - y) / y])


def commit(params: dict):
    """commit_params mirror -> runtime coefficient dict.

    params keys mirror the struct: red/green/blue/saturation/lightness/
    grey (3-tuples), normalize_* (bool), adaptation, x, y, gamut, clip,
    version.  The illuminant is taken from (x, y) directly (the
    DT_ILLUMINANT_* resolution table is exercised separately).
    """
    g = lambda k, d=None: params.get(k, d)
    norm_R = sum(g("red")) if g("normalize_R") else 1.0
    norm_G = sum(g("green")) if g("normalize_G") else 1.0
    norm_B = sum(g("blue")) if g("normalize_B") else 1.0
    norm_sat = sum(g("saturation")) / 3.0 if g("normalize_sat") else 0.0
    norm_light = sum(g("lightness")) / 3.0 if g("normalize_light") else 0.0
    norm_grey = sum(g("grey"))
    apply_grey = any(v != 0.0 for v in g("grey"))
    if not g("normalize_grey") or norm_grey == 0.0:
        norm_grey = 1.0

    MIX = np.stack([np.asarray(g("red")) / norm_R,
                    np.asarray(g("green")) / norm_G,
                    np.asarray(g("blue")) / norm_B])
    saturation = -np.asarray(g("saturation")) + norm_sat
    lightness = np.asarray(g("lightness")) - norm_light
    grey = np.asarray(g("grey")) / norm_grey
    if g("version") == V1:
        sat = np.asarray(g("saturation"))
        saturation = np.array([-sat[2] + norm_sat, -sat[1] + norm_sat,
                               -sat[0] + norm_sat])

    gamut = 0.0 if g("gamut") == 0.0 else 1.0 / g("gamut")
    XYZ = illuminant_xy_to_XYZ(g("x"), g("y"))
    illuminant = xyz_to_lms(XYZ, g("adaptation"))
    p = (0.818155 / illuminant[2]) ** 0.0834
    return dict(MIX=MIX, saturation=saturation, lightness=lightness,
                grey=grey, apply_grey=apply_grey, gamut=gamut,
                clip=bool(g("clip")), adaptation=g("adaptation"),
                version=g("version"), illuminant=illuminant, p=p)


def gamut_mapping(xyz, compression, clip):
    """channelmixerrgb.c:633-700, vectorized over (..., 3)."""
    s = xyz.sum(-1)
    Y = xyz[..., 1]
    ok = (s > 0) & (Y > 0)
    ss = np.where(ok, s, 1.0)
    x = xyz[..., 0] / ss
    y = np.where(ok, Y / ss, 1.0)
    uv_den = -2.0 * x + 12.0 * y + 3.0
    u = 4.0 * x / uv_den
    v = 9.0 * y / uv_den
    D50 = (0.20915914598542354, 0.488075320769787)
    du, dv = D50[0] - u, D50[1] - v
    Delta = Y * (du * du + dv * dv)
    corr = 0.0 if compression == 0.0 else \
        np.power(np.maximum(Delta, 0.0), compression)
    tmp_u = corr * du + u
    tmp_v = corr * dv + v
    u = np.where(u > D50[0], np.maximum(tmp_u, D50[0]),
                 np.minimum(tmp_u, D50[0]))
    v = np.where(v > D50[1], np.maximum(tmp_v, D50[1]),
                 np.minimum(tmp_v, D50[1]))
    xy_den = 6.0 * u - 16.0 * v + 12.0
    x = 9.0 * u / xy_den
    y = 4.0 * v / xy_den
    if clip:
        x = np.maximum(x, 0.0)
        y = np.maximum(y, 0.0)
    y = np.maximum(y, NORM_MIN)
    scale = x + y
    bad = scale >= 1.0
    x = np.where(bad, x / scale, x)
    y = np.where(bad, y / scale, y)
    out = np.stack([Y * x / y, Y, Y * (1.0 - x - y) / y], axis=-1)
    return np.where(ok[..., None], out, 0.0)


def luma_chroma(lms, saturation, lightness, version):
    """channelmixerrgb.c:701-756, vectorized over (..., 3)."""
    norm = np.sqrt((lms * lms).sum(-1))
    avg = np.maximum(lms.mean(-1), NORM_MIN)
    ok = (norm > 0) & (avg > 0)
    mix = lms @ np.asarray(lightness)
    n = norm * INV_SQRT3 if version == V3 else norm
    ratios = lms / np.maximum(n, 1e-30)[..., None]
    if version == V1:
        coeff = ((1.0 - ratios) ** 2 @ np.asarray(saturation))
    else:
        coeff = (ratios @ np.asarray(saturation)) / 3.0
    min_ratio = np.minimum(ratios, 0.0)
    out = np.maximum((1.0 - ratios) * coeff[..., None] + ratios, min_ratio)
    if version == V3:
        n = n / np.maximum(np.sqrt((out * out).sum(-1)) * INV_SQRT3, 1e-30)
    n = n * np.maximum(1.0 + mix / avg, 0.0)
    out = out * n[..., None]
    return np.where(ok[..., None], out, lms)


def _scale_of_Y(Y):
    """_downscale_vector_simd's guard (chromatic_adaptation.h:293-297)."""
    valid = (Y > NORM_MIN) & np.isfinite(Y)
    return np.where(valid, Y + NORM_MIN, NORM_MIN)


def process(rgb, RGB_to_XYZ, XYZ_to_RGB, coef):
    """loop_switch mirror: (..., 3) pipeline RGB -> (..., 3)."""
    kind = coef["adaptation"]
    clip = coef["clip"]
    illuminant = coef["illuminant"]
    MIX = coef["MIX"]
    x = np.maximum(rgb, 0.0) if clip else np.asarray(rgb, np.float64)

    if kind in (ADAPT_FULL_BRADFORD, ADAPT_LINEAR_BRADFORD, ADAPT_CAT16):
        xyz = x @ np.asarray(RGB_to_XYZ).T
        sc = _scale_of_Y(xyz[..., 1:2])
        lms = xyz_to_lms(xyz, kind) / sc
        if kind == ADAPT_FULL_BRADFORD:
            t = lms / illuminant
            t2 = np.where(t[..., 2] > 0,
                          np.power(np.maximum(t[..., 2], 0), coef["p"]),
                          t[..., 2])
            t = np.concatenate([t[..., :2], t2[..., None]], -1)
            lms = D50_BRADFORD * t
        elif kind == ADAPT_LINEAR_BRADFORD:
            lms = D50_BRADFORD * (lms / illuminant)
        else:
            lms = D50_CAT16 * (lms / illuminant)
        lms = lms * sc
        mixed = lms @ MIX.T
        xyz = lms_to_xyz(mixed, kind)
    elif kind == ADAPT_XYZ:
        xyz = x @ np.asarray(RGB_to_XYZ).T
        sc = _scale_of_Y(xyz[..., 1:2])
        xyz = (D50_XYZ * ((xyz / sc) / illuminant)) * sc
        xyz = xyz @ MIX.T
    else:  # ADAPT_RGB: mix in RGB, then to XYZ
        xyz = (x @ MIX.T) @ np.asarray(RGB_to_XYZ).T

    xyz = gamut_mapping(xyz, coef["gamut"], clip)

    if kind in (ADAPT_FULL_BRADFORD, ADAPT_LINEAR_BRADFORD, ADAPT_CAT16,
                ADAPT_XYZ):
        work = xyz_to_lms(xyz, kind)
    else:
        work = xyz @ np.asarray(XYZ_to_RGB).T
    if clip:
        work = np.maximum(work, 0.0)
    work = luma_chroma(work, coef["saturation"], coef["lightness"],
                       coef["version"])
    if clip:
        work = np.maximum(work, 0.0)

    if coef["apply_grey"]:
        gm = np.maximum(work @ np.asarray(coef["grey"]), 0.0)
        return np.repeat(gm[..., None], 3, axis=-1)
    # tail (:917-947): back to XYZ, clip, XYZ->RGB, clip
    if kind in (ADAPT_FULL_BRADFORD, ADAPT_LINEAR_BRADFORD, ADAPT_CAT16,
                ADAPT_XYZ):
        xyz = lms_to_xyz(work, kind)
    else:
        xyz = work @ np.asarray(RGB_to_XYZ).T
    if clip:
        xyz = np.maximum(xyz, 0.0)
    out = xyz @ np.asarray(XYZ_to_RGB).T
    if clip:
        out = np.maximum(out, 0.0)
    return out
