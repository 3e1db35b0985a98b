"""Independent NumPy transcription of the reference filmicrgb pixel math,
used as the oracle for ansel_tpu/ops/filmicrgb.py.

Transcribed from `/root/reference/src/iop/filmicrgb.c`:
  * dt_iop_filmic_rgb_compute_spline        :3614-3933
  * filmic_v3_compute_geometry / nodes      :475-556
  * filmic_sigmoid_scale                    :3602-3611
  * commit_params (contrast clamp, sigmas,
    saturation scaling)                     :3935-4027
  * log_tonemapping / filmic_spline         :1025-1139
  * filmic_desaturate_v1 / _v2              :1141-1169
  * get_pixel_norm variants                 :927-1016
  * filmic_split_v2_v3 / filmic_chroma_v2_v3:1553-1716

Float64 throughout (the oracle should be more precise than the DUT).
Scalar/vectorized numpy on purpose — unambiguous, test-only.
"""

from __future__ import annotations

import dataclasses

import numpy as np

# curve types (filmicrgb.c dt_iop_filmicrgb_curve_type_t)
POLY_4, POLY_3, RATIONAL, SIGMOID = 0, 1, 2, 3
# spline versions
SPLINE_V1, SPLINE_V2, SPLINE_V3 = 0, 1, 2
# norm methods (dt_iop_filmicrgb_methods_type_t order in filmicrgb.h)
M_NONE, M_MAX_RGB, M_LUMINANCE, M_POWER, M_EUCLIDEAN_V1, \
    M_EUCLIDEAN_V2 = 0, 1, 2, 3, 4, 5
CSCI_V1, CSCI_V2, CSCI_V3 = 0, 1, 2

NORM_MIN = 1.52587890625e-05
SAFETY_MARGIN = 0.01
INV_SQRT3 = 1.0 / np.sqrt(3.0)
SIGMOID_TOE_POWER = 1.5


@dataclasses.dataclass
class Params:
    grey_point_source: float = 18.45
    black_point_source: float = -8.0
    white_point_source: float = 4.0
    reconstruct_threshold: float = 6.0
    reconstruct_feather: float = 3.0
    security_factor: float = 0.0
    grey_point_target: float = 18.45
    black_point_target: float = 0.01517634
    white_point_target: float = 100.0
    output_power: float = 4.0
    latitude: float = 10.0
    contrast: float = 1.18
    saturation: float = 0.0
    balance: float = 0.0
    preserve_color: int = M_POWER
    version: int = CSCI_V3
    custom_grey: int = 0
    shadows: int = SIGMOID
    highlights: int = SIGMOID
    spline_version: int = SPLINE_V3


@dataclasses.dataclass
class Spline:
    x: np.ndarray = None
    y: np.ndarray = None
    M1: np.ndarray = None   # each (3,): [toe, shoulder, linear]
    M2: np.ndarray = None
    M3: np.ndarray = None
    M4: np.ndarray = None
    M5: np.ndarray = None
    latitude_min: float = 0.0
    latitude_max: float = 0.0
    type: tuple = (SIGMOID, SIGMOID)


def sigmoid_scale(limit_x, limit_y, tx, ty, slope, power):
    projected_rise = slope * max(1e-6, limit_x - tx)
    actual_rise = max(1e-6, limit_y - ty)
    base = max(1e-6, actual_rise ** -power - projected_rise ** -power)
    return min(1e9, base ** (-1.0 / power))


def _v3_geometry(p: Params):
    if p.custom_grey:
        grey_display = (np.clip(p.grey_point_target, p.black_point_target,
                                p.white_point_target) / 100.0) \
            ** (1.0 / p.output_power)
    else:
        grey_display = 0.1845 ** (1.0 / p.output_power)
    dr = p.white_point_source - p.black_point_source
    grey_log = abs(p.black_point_source) / dr
    black_display = (np.clip(p.black_point_target, 0.0,
                             p.grey_point_target) / 100.0) \
        ** (1.0 / p.output_power)
    white_display = (max(p.white_point_target, p.grey_point_target)
                     / 100.0) ** (1.0 / p.output_power)
    slope = p.contrast * dr / 8.0
    min_contrast = max(1.0,
                       (white_display - grey_display) / (1.0 - grey_log),
                       (grey_display - black_display) / grey_log)
    min_contrast += SAFETY_MARGIN
    contrast = slope / (p.output_power
                        * grey_display ** (p.output_power - 1.0))
    clamped = np.clip(contrast, min_contrast, 100.0)
    contrast = float(clamped)
    intercept = grey_display - contrast * grey_log
    sm = SAFETY_MARGIN * (white_display - black_display)
    xmin = (black_display + sm - intercept) / contrast
    xmax = (white_display - sm - intercept) / contrast
    return dict(grey_display=grey_display, grey_log=grey_log,
                black_display=black_display, white_display=white_display,
                contrast=contrast, intercept=intercept, xmin=xmin,
                xmax=xmax)


def _v3_nodes(p: Params):
    g = _v3_geometry(p)
    latitude = np.clip(p.latitude, 0.0, 100.0) / 100.0
    balance = np.clip(p.balance, -50.0, 50.0) / 100.0
    toe_log = (1.0 - latitude) * g["grey_log"] + latitude * g["xmin"]
    shoulder_log = (1.0 - latitude) * g["grey_log"] + latitude * g["xmax"]
    if balance > 0.0:
        corr = 2.0 * balance * (shoulder_log - g["grey_log"])
    else:
        corr = 2.0 * balance * (g["grey_log"] - toe_log)
    toe_log = max(toe_log - corr, g["xmin"])
    shoulder_log = min(shoulder_log - corr, g["xmax"])
    toe_display = toe_log * g["contrast"] + g["intercept"]
    shoulder_display = shoulder_log * g["contrast"] + g["intercept"]
    return g, toe_log, shoulder_log, toe_display, shoulder_display


def compute_spline(p: Params) -> Spline:
    if p.custom_grey:
        grey_display = (np.clip(p.grey_point_target, p.black_point_target,
                                p.white_point_target) / 100.0) \
            ** (1.0 / p.output_power)
    else:
        grey_display = 0.1845 ** (1.0 / p.output_power)
    white_source = p.white_point_source
    black_source = p.black_point_source
    dr = white_source - black_source
    black_log = 0.0
    grey_log = abs(p.black_point_source) / dr
    white_log = 1.0

    if p.spline_version == SPLINE_V1:
        black_display = np.clip(p.black_point_target, 0.0,
                                p.grey_point_target) / 100.0
        white_display = max(p.white_point_target,
                            p.grey_point_target) / 100.0
    else:
        black_display = (np.clip(p.black_point_target, 0.0,
                                 p.grey_point_target) / 100.0) \
            ** (1.0 / p.output_power)
        white_display = (max(p.white_point_target, p.grey_point_target)
                         / 100.0) ** (1.0 / p.output_power)

    balance = np.clip(p.balance, -50.0, 50.0) / 100.0
    if p.spline_version < SPLINE_V3:
        latitude = np.clip(p.latitude, 0.0, 100.0) / 100.0 * dr
        contrast = np.clip(p.contrast, 1.00001, 6.0)
        # commit_params' pre-clamp for old splines (filmicrgb.c:3960-3966)
        if contrast < grey_display / grey_log:
            contrast = 1.0001 * grey_display / grey_log
        toe_log = grey_log - latitude / dr * abs(black_source / dr)
        shoulder_log = grey_log + latitude / dr * abs(white_source / dr)
        intercept = grey_display - contrast * grey_log
        toe_display = toe_log * contrast + intercept
        shoulder_display = shoulder_log * contrast + intercept
        norm = np.sqrt(contrast * contrast + 1.0)
        coeff = -((2.0 * latitude) / dr) * balance
        toe_display += coeff * contrast / norm
        shoulder_display += coeff * contrast / norm
        toe_log += coeff / norm
        shoulder_log += coeff / norm
    else:
        g, toe_log, shoulder_log, toe_display, shoulder_display = \
            _v3_nodes(p)
        contrast = g["contrast"]

    s = Spline()
    s.x = np.array([black_log, toe_log, grey_log, shoulder_log, white_log])
    s.y = np.array([black_display, toe_display, grey_display,
                    shoulder_display, white_display])
    s.latitude_min = s.x[1]
    s.latitude_max = s.x[3]
    s.type = (p.shadows, p.highlights)
    M1 = np.zeros(3)
    M2 = np.zeros(3)
    M3 = np.zeros(3)
    M4 = np.zeros(3)
    M5 = np.zeros(3)
    M2[2] = contrast
    M1[2] = s.y[1] - M2[2] * s.x[1]
    Tl = s.x[1]
    Sl = s.x[3]

    if p.shadows == SIGMOID or p.highlights == SIGMOID:
        M3[2] = s.y[0]
        M4[2] = s.y[4]

    slope = M2[2]
    if p.shadows == SIGMOID:
        tx, ty, y0 = s.x[1], s.y[1], s.y[0]
        dx = max(1e-6, tx)
        dy = max(1e-6, ty - y0)
        M1[0] = -sigmoid_scale(1.0, 1.0 - y0, 1.0 - tx, 1.0 - ty, slope,
                               SIGMOID_TOE_POWER)
        M2[0] = SIGMOID_TOE_POWER
        M4[0] = slope * dx / dy
        M3[0] = dy / dx ** M4[0]
        M5[0] = 1.0 if dy / dx > slope else 0.0
    elif p.shadows == POLY_4:
        A = np.array([[0, 0, 0, 0, 1],
                      [0, 0, 0, 1, 0],
                      [Tl**4, Tl**3, Tl**2, Tl, 1],
                      [4*Tl**3, 3*Tl**2, 2*Tl, 1, 0],
                      [12*Tl**2, 6*Tl, 2, 0, 0]], float)
        b = np.array([s.y[0], 0.0, s.y[1], M2[2], 0.0])
        sol = np.linalg.solve(A, b)
        M5[0], M4[0], M3[0], M2[0], M1[0] = sol
    elif p.shadows == POLY_3:
        A = np.array([[0, 0, 0, 1],
                      [Tl**3, Tl**2, Tl, 1],
                      [3*Tl**2, 2*Tl, 1, 0],
                      [6*Tl, 2, 0, 0]], float)
        b = np.array([s.y[0], s.y[1], M2[2], 0.0])
        sol = np.linalg.solve(A, b)
        M5[0] = 0.0
        M4[0], M3[0], M2[0], M1[0] = sol
    else:  # rational
        x = s.x[1] - s.x[0]
        y = s.y[1] - s.y[0]
        g_ = contrast
        b_ = g_ / (2.0 * y) + (np.sqrt((x * g_ / y + 1.0) ** 2 - 4.0)
                               - 1.0) / (2.0 * x)
        c_ = y / g_ * (b_ * x * x + x) / (b_ * x * x + x - (y / g_))
        M1[0] = c_ * g_
        M2[0] = b_
        M3[0] = c_
        M4[0] = s.y[1]

    if p.highlights == SIGMOID:
        sx, sy, y4 = s.x[3], s.y[3], s.y[4]
        dx = max(1e-6, 1.0 - sx)
        dy = max(1e-6, y4 - sy)
        M4[1] = slope * dx / dy
        M3[1] = dy / dx ** M4[1]
        M5[1] = 1.0
    elif p.highlights == POLY_3:
        A = np.array([[1, 1, 1, 1],
                      [Sl**3, Sl**2, Sl, 1],
                      [3*Sl**2, 2*Sl, 1, 0],
                      [6*Sl, 2, 0, 0]], float)
        b = np.array([s.y[4], s.y[3], M2[2], 0.0])
        sol = np.linalg.solve(A, b)
        M5[1] = 0.0
        M4[1], M3[1], M2[1], M1[1] = sol
    elif p.highlights == POLY_4:
        A = np.array([[1, 1, 1, 1, 1],
                      [4, 3, 2, 1, 0],
                      [Sl**4, Sl**3, Sl**2, Sl, 1],
                      [4*Sl**3, 3*Sl**2, 2*Sl, 1, 0],
                      [12*Sl**2, 6*Sl, 2, 0, 0]], float)
        b = np.array([s.y[4], 0.0, s.y[3], M2[2], 0.0])
        sol = np.linalg.solve(A, b)
        M5[1], M4[1], M3[1], M2[1], M1[1] = sol
    else:  # rational
        x = s.x[4] - s.x[3]
        y = s.y[4] - s.y[3]
        g_ = contrast
        b_ = g_ / (2.0 * y) + (np.sqrt((x * g_ / y + 1.0) ** 2 - 4.0)
                               - 1.0) / (2.0 * x)
        c_ = y / g_ * (b_ * x * x + x) / (b_ * x * x + x - (y / g_))
        M1[1] = c_ * g_
        M2[1] = b_
        M3[1] = c_
        M4[1] = s.y[3]

    s.M1, s.M2, s.M3, s.M4, s.M5 = M1, M2, M3, M4, M5
    return s


def commit(p: Params):
    """commit_params analog -> data dict (filmicrgb.c:3935-4027)."""
    if p.custom_grey:
        grey_source = p.grey_point_source / 100.0
    else:
        grey_source = 0.1845
    dr = p.white_point_source - p.black_point_source
    spline = compute_spline(p)
    if p.version >= 3:  # CSCI_V4 in the full enum
        saturation = p.saturation / 100.0
    else:
        saturation = 2.0 * p.saturation / 100.0 + 1.0
    return dict(
        grey_source=grey_source, black_source=p.black_point_source,
        dynamic_range=dr, output_power=p.output_power,
        saturation=saturation,
        sigma_toe=(spline.latitude_min / 3.0) ** 2,
        sigma_shoulder=((1.0 - spline.latitude_max) / 3.0) ** 2,
        spline=spline)


def log_tonemapping(x, grey, black, dynamic_range):
    return np.clip((np.log2(x / grey) - black) / dynamic_range, 0.0, 1.0)


def filmic_spline(x, s: Spline):
    x = np.asarray(x, float)
    M1, M2, M3, M4, M5 = s.M1, s.M2, s.M3, s.M4, s.M5

    # linear latitude
    res = M1[2] + x * M2[2]

    def eval_toe(xv):
        t = s.type[0]
        if t == SIGMOID:
            if M5[0] != 0.0:
                return M3[2] + np.maximum(
                    0.0, M3[0] * np.maximum(xv, 0.0) ** M4[0])
            ty = s.latitude_min * M2[2] + M1[2]
            # clip: this branch is only selected where u >= 0
            u = np.maximum(M2[2] * (xv - s.latitude_min) / M1[0], 0.0)
            return M1[0] * (u / (1.0 + u ** M2[0]) ** (1.0 / M2[0])) + ty
        if t == POLY_4:
            return M1[0] + xv * (M2[0] + xv * (M3[0] + xv * (M4[0]
                                                             + xv * M5[0])))
        if t == POLY_3:
            return M1[0] + xv * (M2[0] + xv * (M3[0] + xv * M4[0]))
        xi = s.latitude_min - xv
        rat = xi * (xi * M2[0] + 1.0)
        return M4[0] - M1[0] * rat / (rat + M3[0])

    def eval_shoulder(xv):
        t = s.type[1]
        if t == SIGMOID:
            if M5[1] != 0.0:
                return M4[2] - np.maximum(
                    0.0, M3[1] * np.maximum(1.0 - xv, 0.0) ** M4[1])
            ty = s.latitude_max * M2[2] + M1[2]
            u = np.maximum(M2[2] * (xv - s.latitude_max) / M1[1], 0.0)
            return M1[1] * (u / (1.0 + u ** M2[1]) ** (1.0 / M2[1])) + ty
        if t == POLY_4:
            return M1[1] + xv * (M2[1] + xv * (M3[1] + xv * (M4[1]
                                                             + xv * M5[1])))
        if t == POLY_3:
            return M1[1] + xv * (M2[1] + xv * (M3[1] + xv * M4[1]))
        xi = xv - s.latitude_max
        rat = xi * (xi * M2[1] + 1.0)
        return M4[1] + M1[1] * rat / (rat + M3[1])

    res = np.where(x < s.latitude_min, eval_toe(x), res)
    res = np.where(x > s.latitude_max, eval_shoulder(x), res)
    return res


def desaturate_v1(x, sigma_toe, sigma_shoulder, saturation):
    key_toe = np.exp(-0.5 * x * x / sigma_toe)
    key_shoulder = np.exp(-0.5 * (1.0 - x) ** 2 / sigma_shoulder)
    return 1.0 - np.clip((key_toe + key_shoulder) / saturation, 0.0, 1.0)


def desaturate_v2(x, sigma_toe, sigma_shoulder, saturation):
    sat2 = 0.5 / np.sqrt(saturation)
    key_toe = np.exp(-x * x / sigma_toe * sat2)
    key_shoulder = np.exp(-(1.0 - x) ** 2 / sigma_shoulder * sat2)
    return saturation - (key_toe + key_shoulder) * saturation


def pixel_norm(rgb, variant, y_weights):
    """rgb (..., 3)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    if variant == M_MAX_RGB:
        return np.maximum(np.maximum(r, g), b)
    if variant == M_LUMINANCE:
        return (y_weights[0] * r + y_weights[1] * g + y_weights[2] * b)
    if variant == M_POWER:
        a = np.abs(rgb)
        num = (a ** 3).sum(-1)
        den = (a ** 2).sum(-1)
        return num / np.maximum(den, 1e-12)
    if variant == M_EUCLIDEAN_V1:
        return np.sqrt((rgb ** 2).sum(-1))
    if variant == M_EUCLIDEAN_V2:
        return np.sqrt((rgb ** 2).sum(-1)) * INV_SQRT3
    return (y_weights[0] * r + y_weights[1] * g + y_weights[2] * b)


def filmic_split_v2_v3(rgb, p: Params, y_weights):
    """rgb (..., 3) scene-linear -> display, filmicrgb.c:1553-1591."""
    d = commit(p)
    s = d["spline"]
    temp = log_tonemapping(np.maximum(rgb, NORM_MIN), d["grey_source"],
                           d["black_source"], d["dynamic_range"])
    lum = (temp * np.asarray(y_weights)).sum(-1)
    desat = desaturate_v2(lum, d["sigma_toe"], d["sigma_shoulder"],
                          d["saturation"])
    out = np.empty_like(temp)
    for c in range(3):
        v = lum + desat * (temp[..., c] - lum)
        out[..., c] = np.clip(filmic_spline(v, s), s.y[0], s.y[4]) \
            ** d["output_power"]
    return out


def filmic_chroma_v2_v3(rgb, p: Params, y_weights):
    """rgb (..., 3) scene-linear -> display, filmicrgb.c:1648-1716."""
    d = commit(p)
    s = d["spline"]
    norm = np.maximum(pixel_norm(rgb, p.preserve_color, y_weights),
                      NORM_MIN)[..., None]
    ratios = rgb / norm
    min_r = ratios.min(-1, keepdims=True)
    ratios = np.where(min_r < 0.0, ratios - min_r, ratios)
    nl = log_tonemapping(norm[..., 0], d["grey_source"],
                         d["black_source"], d["dynamic_range"])
    desat = desaturate_v2(nl, d["sigma_toe"], d["sigma_shoulder"],
                          d["saturation"])
    nl = np.clip(filmic_spline(nl, s), s.y[0], s.y[4]) ** d["output_power"]
    ratios = np.maximum(
        ratios + (1.0 - ratios) * (1.0 - desat[..., None]), 0.0)
    if p.version == CSCI_V3:
        nl = nl / np.maximum(pixel_norm(ratios, p.preserve_color,
                                        y_weights), NORM_MIN)
    out = ratios * nl[..., None]
    max_pix = out.max(-1, keepdims=True)
    pen_ratios = np.maximum(ratios + (1.0 - max_pix), 0.0)
    out = np.where(max_pix > 1.0, pen_ratios * nl[..., None], out)
    return out
