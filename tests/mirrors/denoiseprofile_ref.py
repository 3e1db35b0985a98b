"""Independent NumPy transcription of the reference denoiseprofile wavelet
path, used as the oracle for ansel_tpu/ops/denoiseprofile.py.

Transcribed from `/root/reference/src/iop/denoiseprofile.c`:
  * precondition / backtransform (legacy VST)        :851-898
  * precondition_v2 / backtransform_v2               :924-1023
  * precondition_Y0U0V0 / backtransform_Y0U0V0       :1025-1092
  * compute_wb_factors                               :1097-1128
  * set_up_conversion_matrices                       :1169-1221
  * variance_stabilizing_xform (BayesShrink thrs)    :1222-1286
  * process_wavelets driver                          :1288-1446
and `/root/reference/src/pixel/eaw.c`:
  * dn_weight :181-195, eaw_dn_decompose :242-333, eaw_synthesize :157-175

dn_weight uses the reference's fast_mexp2f bit-trick EXACTLY (the
reduced-precision float variant, math.h:306-316) — the former
exact-exp2 deviation is gone; this mirror validates the
structure of the math, not the C's fast-approx ULPs.

Float64 throughout; vectorized numpy with explicit clamped index arrays
(unambiguous, test-only).  Images are (H, W, 3).
"""

from __future__ import annotations

import numpy as np

BANDS = 7
P_FULCRUM = 0.05
MODE_RGB, MODE_Y0U0V0 = 0, 1
CH_ALL, CH_R, CH_G, CH_B, CH_Y0, CH_U0V0 = 0, 1, 2, 3, 4, 5
FILTER5 = np.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0


# ------------------------------------------------------------------ VST

def precondition_v2(img, a, p, b, wb):
    expon = -np.asarray(p) / 2 + 1
    denom = (-np.asarray(p) + 2) * np.sqrt(a)
    return 2.0 * np.maximum(img / wb + b, 0.0) ** expon / denom


def backtransform_v2(buf, a, p, b, bias, wb):
    p = np.asarray(p)
    expon = 1.0 / (1.0 - p / 2.0)
    denom = 4.0 / (np.sqrt(a) * (2.0 - p))
    x = np.maximum(buf, 0.0)
    delta = x * x + bias
    z1 = (x + np.sqrt(np.maximum(delta, 0.0))) / denom
    return wb * (z1 ** expon - b)


def precondition_y0u0v0(img, a, p, b, to_yuv):
    expon = -np.asarray(p) / 2 + 1
    scale = 2.0 / ((-np.asarray(p) + 2) * np.sqrt(a))
    tmp = np.maximum(img + b, 0.0) ** expon * scale
    return tmp @ np.asarray(to_yuv).T


def backtransform_y0u0v0(buf, a, p, b, bias, wb, to_rgb):
    p = np.asarray(p)
    bias_wb = bias * np.asarray(wb)
    expon = 1.0 / (1.0 - p / 2.0)
    scale = (np.sqrt(a) * (2.0 - p)) / 4.0
    rgb = buf @ np.asarray(to_rgb).T
    x = np.maximum(rgb, 0.0)
    delta = x * x + bias_wb
    z1 = (x + np.sqrt(np.maximum(delta, 0.0))) * scale
    return z1 ** expon - b


def compute_wb_factors(temp_coeffs, fix_norm=True, wb_adaptive=True,
                       processed_maximum=(1.0, 1.0, 1.0),
                       weights=(2.0, 1.0, 2.0)):
    tc = np.asarray(temp_coeffs[:3], float)
    wb_mean = tc.sum() / 3.0
    if fix_norm:
        if wb_mean != 0.0 and wb_adaptive:
            return tc.copy()
        if wb_mean == 0.0:
            return np.ones(3)
        return np.full(3, wb_mean)
    return np.asarray(weights) * np.asarray(processed_maximum[:3])


def conversion_matrices(wb):
    to_yuv = np.array([[1 / 3, 1 / 3, 1 / 3],
                       [0.5, 0.0, -0.5],
                       [0.25, -0.5, 0.25]], float)
    sum_invwb = (1 / wb[0] + 1 / wb[1] + 1 / wb[2]) * np.sqrt(3.0)
    to_yuv[0] = [sum_invwb / wb[0], sum_invwb / wb[1], sum_invwb / wb[2]]
    stddev_u0 = np.sqrt(0.25 * wb[0] ** 2 + 0.25 * wb[2] ** 2)
    stddev_v0 = np.sqrt(0.0625 * wb[0] ** 2 + 0.25 * wb[1] ** 2
                        + 0.0625 * wb[2] ** 2)
    to_yuv[1] /= stddev_u0
    to_yuv[2] /= stddev_v0
    try:
        to_rgb = np.linalg.inv(to_yuv)
    except np.linalg.LinAlgError:
        stddev_y0 = np.sqrt((wb ** 2).sum() / 9.0)
        to_yuv[0] = 1.0 / (3.0 * stddev_y0)
        to_rgb = np.linalg.inv(to_yuv)
    return to_yuv, to_rgb


# ------------------------------------------------------------- wavelets

def dn_weight2(d2, inv_sigma2):
    """dn_weight with squared color distance d2 (eaw.c:181-195); exact
    fast_mexp2f (math.h:306-316), bit-exact numpy transcription."""
    x = np.maximum(0.0, d2 * inv_sigma2 * 0.02 - 9.0).astype(np.float32)
    i1 = np.float32(float(0x3F800000))
    i2 = np.float32(float(0x3F000000))
    k0f = i1 + x * (i2 - i1)
    k = np.where(k0f >= np.float32(float(0x800000)),
                 k0f.astype(np.int32), 0).astype(np.int32)
    return k.view(np.float32)


def eaw_dn_decompose(img, scale, inv_sigma2):
    """img (H, W, 3) -> (coarse, detail, sum_squared(3,))."""
    H, W, _ = img.shape
    mult = 1 << scale
    ys = np.arange(H)
    xs = np.arange(W)
    wgt = np.zeros((H, W, 1))
    acc = np.zeros_like(img)
    for jj in range(5):
        yidx = np.clip(ys + mult * (jj - 2), 0, H - 1)
        for ii in range(5):
            xidx = np.clip(xs + mult * (ii - 2), 0, W - 1)
            px2 = img[yidx][:, xidx]
            d2 = ((img - px2) ** 2).sum(-1)
            w = (FILTER5[ii] * FILTER5[jj]
                 * dn_weight2(d2, inv_sigma2))[..., None]
            wgt += w
            acc += w * px2
    coarse = acc / wgt
    detail = img - coarse
    sum_sq = (detail ** 2).sum(axis=(0, 1))
    return coarse, detail, sum_sq


def eaw_synthesize(acc, detail, thrs, boost=(1.0, 1.0, 1.0)):
    amount = (np.maximum(detail - thrs, 0.0)
              + np.minimum(detail + thrs, 0.0))
    return acc + np.asarray(boost) * amount


def variance_stabilizing_xform(scale, max_scale, npixels, sum_y2, force,
                               color_mode):
    """-> per-channel thresholds (denoiseprofile.c:1222-1286)."""
    varf = np.sqrt(2.0 + 2.0 * 16.0 + 36.0) / 16.0
    sigma_band = varf ** scale
    sb2 = sigma_band * sigma_band
    var_y = np.asarray(sum_y2) / (npixels - 1.0)
    std_x = np.sqrt(np.maximum(1e-6, var_y - sb2))
    adjt = np.full(3, 8.0)
    offset_scale = BANDS - max_scale
    band_index = BANDS - (scale + offset_scale + 1)
    if color_mode == MODE_RGB:
        adjt *= 4.0 * force[CH_ALL][band_index] ** 2
        adjt[0] *= 4.0 * force[CH_R][band_index] ** 2
        adjt[1] *= 4.0 * force[CH_G][band_index] ** 2
        adjt[2] *= 4.0 * force[CH_B][band_index] ** 2
    else:
        adjt[0] *= 4.0 * force[CH_Y0][band_index] ** 2
        adjt[1] *= 4.0 * force[CH_U0V0][band_index] ** 2
        adjt[2] *= 4.0 * force[CH_U0V0][band_index] ** 2
    return adjt * sb2 / std_x


def num_scales(buf_h, buf_w, in_scale=1.0):
    """max_scale selection (process_wavelets, denoiseprofile.c:1300-1316)."""
    max_scale = 0
    supp0 = min(2 * (2 << (BANDS - 1)) + 1, max(buf_h, buf_w) * 0.2)
    i0 = np.log2((supp0 - 1.0) * 0.5)
    while max_scale < BANDS:
        supp = 2 * (2 << max_scale) + 1
        supp_in = supp * (1.0 / in_scale)
        i_in = np.log2((supp_in - 1) * 0.5) - 1.0
        if 1.0 - (i_in + 0.5) / i0 < 0.0:
            break
        max_scale += 1
    return max_scale


def process_wavelets(img, *, a, b, strength, shadows, bias, force,
                     wb_coeffs, color_mode=MODE_Y0U0V0, in_scale=1.0,
                     max_scale=None):
    """Full wavelet pipeline, new VST (use_new_vst), (H, W, 3) in/out."""
    H, W, _ = img.shape
    if max_scale is None:
        max_scale = num_scales(H, W, in_scale)
    wb = compute_wb_factors(wb_coeffs)
    p = np.maximum(shadows + 0.1 * np.log(in_scale / wb), 0.0)
    compensate_p = P_FULCRUM / P_FULCRUM ** shadows
    to_yuv, to_rgb = conversion_matrices(wb)
    compensate_strength = 1.0 if color_mode == MODE_RGB else 2.5
    s = strength * compensate_strength * in_scale
    to_yuv = to_yuv / s
    to_rgb = to_rgb * s
    wb = wb * s
    aa = a[1] * compensate_p

    if color_mode == MODE_RGB:
        buf1 = precondition_v2(img, aa, p, b[1], wb)
    else:
        buf1 = precondition_y0u0v0(img, aa, p, b[1], to_yuv)

    out = np.zeros_like(img)
    npixels = H * W
    for scale in range(max_scale):
        varf = np.sqrt(2.0 + 2.0 * 16.0 + 36.0) / 16.0
        sigma_band = varf ** scale
        coarse, detail, sum_y2 = eaw_dn_decompose(
            buf1, scale, 1.0 / (sigma_band * sigma_band))
        thrs = variance_stabilizing_xform(scale, max_scale, npixels,
                                          sum_y2, force, color_mode)
        out = eaw_synthesize(out, detail, thrs)
        buf1 = coarse

    out = out + buf1
    bias_term = bias - 0.5 * np.log(in_scale)
    if color_mode == MODE_RGB:
        return backtransform_v2(out, aa, p, b[1], bias_term, wb)
    return backtransform_y0u0v0(out, aa, p, b[1], bias_term, wb, to_rgb)
