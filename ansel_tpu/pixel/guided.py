"""Guided filter + exposure-independent variant.

Reference: `/root/reference/src/pixel/guided_filter.c` (He et al. guided
filter), `src/pixel/fast_guided_filter.h` (subsampled fast path),
`src/pixel/eigf.h` (exposure-independent guided filter used by toneequal).
All box means come from cumsum box filters -> fully fused XLA.
"""

from __future__ import annotations

import jax.numpy as jnp

from .blur import box_blur


def guided_filter(guide: jnp.ndarray, src: jnp.ndarray, radius: int,
                  eps: float) -> jnp.ndarray:
    """Classic guided filter on (H, W) planes."""
    mean_i = box_blur(guide, radius)
    mean_p = box_blur(src, radius)
    corr_ip = box_blur(guide * src, radius)
    corr_ii = box_blur(guide * guide, radius)
    # clamp: integral-image fp32 cancellation can push var slightly
    # negative; with var >= 0 and eps > 0 the quotient can't blow up
    var_i = jnp.maximum(corr_ii - mean_i * mean_i, 0.0)
    cov_ip = corr_ip - mean_i * mean_p
    a = cov_ip / (var_i + eps)
    b = mean_p - a * mean_i
    return box_blur(a, radius) * guide + box_blur(b, radius)


def eigf(guide: jnp.ndarray, src: jnp.ndarray, radius: int,
         feathering: float) -> jnp.ndarray:
    """Exposure-independent guided filter (reference src/pixel/eigf.h):
    normalizes the local variance by the local mean squared so the amount of
    smoothing no longer depends on absolute exposure — the core of
    toneequal's luminance mask."""
    mean_g = box_blur(guide, radius)
    mean_s = box_blur(src, radius)
    corr_gg = box_blur(guide * guide, radius)
    corr_gs = box_blur(guide * src, radius)
    var_g = jnp.maximum(corr_gg - mean_g * mean_g, 0.0)
    cov_gs = corr_gs - mean_g * mean_s
    # normalize by mean^2: exposure invariance
    norm = jnp.maximum(mean_g * mean_g, 1e-12)
    a = cov_gs / (var_g + feathering * norm)
    b = mean_s - a * mean_g
    return box_blur(a, radius) * guide + box_blur(b, radius)
