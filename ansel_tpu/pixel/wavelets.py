"""À-trous (stationary) wavelet transforms.

Reference: `/root/reference/src/pixel/dwt.c` (B3-spline à-trous decompose
used by retouch/highlights), `src/pixel/eaw.c` (edge-aware wavelets used by
the atrous equalizer and denoiseprofile's wavelet path).

TPU form: each scale is a separable 5-tap dilated convolution
(`lax.conv_general_dilated` with rhs_dilation = 2^scale) — XLA maps dilated
convs directly; no gathers, no Python-level pixel loops.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

# B3-spline scaling kernel (the classic à-trous kernel, dwt.c / eaw.c)
B3 = (1.0 / 16.0, 4.0 / 16.0, 6.0 / 16.0, 4.0 / 16.0, 1.0 / 16.0)


def _sep_blur(x: jnp.ndarray, scale: int, kernel=B3) -> jnp.ndarray:
    """Separable dilated 5-tap blur on (..., H, W) with hole size 2^scale,
    as fused shifted adds (single-channel TPU convs im2col-pad to 128 lanes
    — see pixel/shifts.py)."""
    from .shifts import sep_filter

    return sep_filter(x, kernel, dilation=1 << scale)


def atrous_decompose(x: jnp.ndarray, scales: int) -> Tuple[List[jnp.ndarray], jnp.ndarray]:
    """-> ([detail_0 .. detail_{s-1}], residual).  x = sum(details) + residual."""
    details = []
    cur = x
    for s in range(scales):
        low = _sep_blur(cur, s)
        details.append(cur - low)
        cur = low
    return details, cur


def atrous_reconstruct(details: List[jnp.ndarray], residual: jnp.ndarray,
                       gains=None) -> jnp.ndarray:
    out = residual
    for i, d in enumerate(details):
        g = 1.0 if gains is None else gains[i]
        out = out + d * g
    return out


def eaw_dn_decompose(x: jnp.ndarray, scale: int, inv_sigma2):
    """One scale of the denoise edge-aware à-trous decompose
    (reference src/pixel/eaw.c:eaw_dn_decompose + dn_weight eaw.c:181-195):
    25-tap B3 blur whose taps are weighted by the color distance
    w = 2^-(max(0, |Δrgb|² * inv_sigma2 * 0.02 - 9)), shared across channels.

    x: (3, H, W).  -> (coarse, detail, sum_sq[3])
    """
    import jax as _jax

    from ..kernels.eaw_pallas import MAX_SCALE, eaw_dn_coarse_pallas

    if _jax.default_backend() == "tpu" and scale <= MAX_SCALE:
        coarse, detail = eaw_dn_coarse_pallas(x, scale, inv_sigma2)
        return coarse, detail, jnp.sum(detail**2, axis=(1, 2))

    from .fastmath import fast_mexp2f
    from .shifts import PaddedView

    d = 1 << scale
    k = jnp.asarray(B3, x.dtype)
    num = jnp.zeros_like(x)
    den = jnp.zeros_like(x[0])
    inv_sigma2 = jnp.asarray(inv_sigma2, x.dtype)
    pv = PaddedView(x, 2 * d)
    for iy in range(5):
        for ix in range(5):
            sh = pv.at((iy - 2) * d, (ix - 2) * d)
            dist2 = jnp.sum((sh - x) ** 2, axis=0)
            # dn_weight (eaw.c:194): fast_mexp2f, bit-exact
            wp = fast_mexp2f(
                jnp.maximum(0.0, dist2 * inv_sigma2 * 0.02 - 9.0))
            w = (k[iy] * k[ix]) * wp
            num = num + w[None] * sh
            den = den + w
    coarse = num / jnp.maximum(den, 1e-12)[None]
    detail = x - coarse
    sum_sq = jnp.sum(detail**2, axis=(1, 2))
    return coarse, detail, sum_sq


def eaw_synthesize(acc: jnp.ndarray, detail: jnp.ndarray, thrs, boost=None):
    """Soft-threshold shrinkage accumulate (reference eaw.c:157-175)."""
    t = jnp.asarray(thrs).reshape(-1, 1, 1)
    amount = jnp.maximum(detail - t, 0.0) + jnp.minimum(detail + t, 0.0)
    if boost is not None:
        amount = amount * jnp.asarray(boost).reshape(-1, 1, 1)
    return acc + amount


def eaw_decompose_scale(x: jnp.ndarray, scale: int, sharpen):
    """One scale of the edge-aware à-trous used by the atrous equalizer
    (reference src/pixel/eaw.c eaw_decompose): 25-tap B3 blur with
    per-channel photometric weights w = exp(-diff^2 * sharpen).
    -> (coarse, detail)."""
    import jax as _jax

    from ..kernels.eaw_pallas import MAX_SCALE, eaw_atrous_coarse_pallas

    if (_jax.default_backend() == "tpu" and scale <= MAX_SCALE
            and x.ndim == 3 and x.shape[0] == 3):
        return eaw_atrous_coarse_pallas(x, scale, sharpen)

    from .fastmath import dt_fast_expf
    from .shifts import PaddedView

    d = 1 << scale
    k = jnp.asarray(B3, x.dtype)
    num = jnp.zeros_like(x)
    den = jnp.zeros_like(x)
    sharpen = jnp.asarray(sharpen, x.dtype)
    pv = PaddedView(x, 2 * d)
    for iy in range(5):
        for ix in range(5):
            sh = pv.at((iy - 2) * d, (ix - 2) * d)
            sq = (sh - x) ** 2
            # weight() (eaw.c:29-42): dt_fast_expf; chroma weight
            # SHARED from the summed a/b squares
            w0 = dt_fast_expf(-sharpen * sq[0])
            wc = dt_fast_expf(-sharpen * (sq[1] + sq[2]))
            wgt = (k[iy] * k[ix]) * jnp.stack([w0, wc, wc])
            num = num + wgt * sh
            den = den + wgt
    low = num / jnp.maximum(den, 1e-9)
    return low, x - low


def eaw_decompose(x: jnp.ndarray, scales: int, sharpen: float = 0.0):
    """Multi-scale edge-aware à-trous decompose -> (details, residual)."""
    details = []
    cur = x
    for s in range(scales):
        low, det = eaw_decompose_scale(cur, s, sharpen)
        details.append(det)
        cur = low
    return details, cur
