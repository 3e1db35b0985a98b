"""NumPy mirror of the reference tone-equalizer per-pixel math.

Transcribed (structure, not code) from
`/root/reference/src/pixel/luminance_mask.h` :71-200 (the 7 estimators +
linear_contrast) and `/root/reference/src/iop/toneequal.c` :763-797 (the
non-LUT apply_toneequalizer: gaussian RBF of the 8 factors over clamped
log2 luminance, correction clamped to [0.25, 4]).

Covers the details=NONE path (no guided-filter smoothing).  Scalar
loops on purpose — unambiguous, test-only.
"""

import numpy as np

MIN_FLOAT = 2.0 ** -16
CENTERS_OPS = np.linspace(-8.0, 0.0, 8)


def _linear_contrast(v, fulcrum, contrast):
    return max((v - fulcrum) * contrast + fulcrum, MIN_FLOAT)


def _estimate_pixel(rgb, method, eb, fulcrum, cb):
    r, g, b = (float(v) for v in rgb)
    if method == 0:      # mean
        lum = (r + g + b) / 3.0
    elif method == 1:    # HSL lightness
        lum = (max(r, g, b) + min(r, g, b)) / 2.0
    elif method == 2:    # HSV value
        lum = max(r, g, b)
    elif method == 3:    # L1
        lum = abs(r) + abs(g) + abs(b)
    elif method == 4:    # L2
        lum = np.sqrt(r * r + g * g + b * b)
    elif method == 5:    # power norm
        a = [abs(r), abs(g), abs(b)]
        lum = sum(v ** 3 for v in a) / sum(v ** 2 for v in a)
    else:                # geometric mean of |RGB|
        lum = (abs(r) * abs(g) * abs(b)) ** (1.0 / 3.0)
    return _linear_contrast(eb * lum, fulcrum, cb)


def toneequal_ref(img, method, exposure_boost, fulcrum, contrast_boost,
                  factors, smoothing):
    """img: (3, H, W) -> corrected (3, H, W); details=NONE path."""
    C, H, W = img.shape
    out = np.empty_like(img)
    denom = 2.0 * smoothing * smoothing
    for i in range(H):
        for j in range(W):
            lum = _estimate_pixel(img[:, i, j], method, exposure_boost,
                                  fulcrum, contrast_boost)
            ev = min(max(np.log2(lum), -8.0), 0.0)
            corr = sum(np.exp(-((ev - c) ** 2) / denom) * f
                       for c, f in zip(CENTERS_OPS, factors))
            corr = min(max(corr, 0.25), 4.0)
            out[:, i, j] = img[:, i, j] * corr
    return out
