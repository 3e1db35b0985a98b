"""NumPy transcription of the reference non-local-means core.

Source: `/root/reference/src/pixel/nlmeans_core.c`
  * scatter()            :94-103   (search-lattice spreading)
  * define_patches()     :105-144
  * pixel_difference()   :155-166
  * gh() = dt_fast_mexp2f :84-87  (math/math.h:290-301)
  * weight application   :398-433  (both variants: iop nlmeans
    center_weight < 0, denoiseprofile center_weight >= 0)

Border semantics transcribed exactly: a patch whose shifted CENTER
falls outside the image contributes nothing at that pixel (row/col_min
/max clamps :376-382), and patch-box taps outside the image contribute
zero to the distortion (the "value of zero" sliding-window edge rows,
:436-460).  The production implementation edge-pads instead — tests
compare the interior (ring > max_shift + radius excluded), where the
two are identical.

Transcription manifest: loops restructured to whole-array numpy ops;
the sliding-window column-sum algorithm is replaced by a direct
zero-padded box sum (algebraically identical); float32 arithmetic and
the dt_fast_mexp2f bit trick are kept exactly.
"""

from __future__ import annotations

import math

import numpy as np


def dt_fast_mexp2f(x):
    """math/math.h:290-301 — integer-arithmetic 2^-x approximation."""
    x = np.asarray(x, np.float32)
    prod = (x * np.float32(float(0x3F000000 - 0x3F800000)))
    k0 = 0x3F800000 + prod.astype(np.int64)  # int64: avoid UB-ish wrap
    k = np.where(k0 >= 0x800000, k0, 0).astype(np.int32)
    return k.view(np.float32)


def scatter(scale: float, scattering: float, i1: int, i2: int) -> int:
    """nlmeans_core.c:94-103 — C int truncation of the full float
    expression; note |i1|^3 and the scale factor on the WHOLE sum."""
    a1, a2 = abs(i1), abs(i2)
    s = (1 if i1 > 0 else -1 if i1 < 0 else 0)
    return int(scale * ((a1 * a1 * a1 + 7.0 * a1 * math.sqrt(a2)) * s
                        * scattering / 6.0 + i1))


def define_patches(search_radius: int, scale: float, scattering: float):
    """-> list of (srow, scol) (define_patches :105-144, decimate=0)."""
    out = []
    for r_i in range(-search_radius, search_radius + 1):
        for c_i in range(-search_radius, search_radius + 1):
            out.append((scatter(scale, scattering, r_i, c_i),
                        scatter(scale, scattering, c_i, r_i)))
    return out


def nlmeans_ref(img: np.ndarray, patch_radius: int, search_radius: int,
                sharpness: float, norm, center_weight: float = -1.0,
                scale: float = 1.0, scattering: float = 0.0
                ) -> np.ndarray:
    """(3, H, W) -> weighted patch average (3, H, W), reference border
    semantics.  center_weight < 0 = iop nlmeans variant; >= 0 =
    denoiseprofile variant (center norm = cw * (2P+1)^2, :146-152)."""
    img = np.asarray(img, np.float32)
    C, H, W = img.shape
    norm = np.asarray(norm, np.float32).reshape(3, 1, 1)
    P = patch_radius
    acc = np.zeros((4, H, W), np.float32)
    cw_norm = np.float32(center_weight * (2 * P + 1) ** 2)

    for srow, scol in define_patches(search_radius, scale, scattering):
        # per-pixel normed squared difference vs the shifted image,
        # zero where either endpoint leaves the frame
        d = np.zeros((H, W), np.float32)
        y0, y1 = max(0, -srow), min(H, H - srow)
        x0, x1 = max(0, -scol), min(W, W - scol)
        if y0 >= y1 or x0 >= x1:
            continue
        a = img[:, y0:y1, x0:x1]
        b = img[:, y0 + srow:y1 + srow, x0 + scol:x1 + scol]
        d[y0:y1, x0:x1] = np.sum((a - b) * (a - b)
                                 * norm, axis=0, dtype=np.float32)
        # box sum over the patch (taps outside the frame are zero)
        dp = np.pad(d, P)
        ii = np.zeros((H + 2 * P + 1, W + 2 * P + 1), np.float64)
        ii[1:, 1:] = dp.cumsum(0).cumsum(1)
        n = 2 * P + 1
        distortion = (ii[n:, n:] - ii[:-n, n:] - ii[n:, :-n]
                      + ii[:-n, :-n]).astype(np.float32)

        if center_weight < 0:
            wt = dt_fast_mexp2f(distortion * np.float32(sharpness))
        else:
            dis = (distortion + d * cw_norm) \
                / np.float32(1.0 + center_weight)
            wt = dt_fast_mexp2f(
                np.maximum(0.0, dis * np.float32(sharpness) - 2.0))
        # only pixels whose shifted center is in-frame accumulate
        m = np.zeros((H, W), np.float32)
        m[y0:y1, x0:x1] = 1.0
        wt = wt * m
        sh = np.zeros((3, H, W), np.float32)
        sh[:, y0:y1, x0:x1] = b
        acc[:3] += sh * wt[None]
        acc[3] += wt
    return acc[:3] / np.maximum(acc[3], 1e-12)[None]
