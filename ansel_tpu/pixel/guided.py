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


def fast_guided_filter(guide: jnp.ndarray, src: jnp.ndarray, radius: int,
                       eps: float, scaling: int = 4) -> jnp.ndarray:
    """Subsampled guided filter (reference
    `src/pixel/fast_guided_filter.h:280-344`): compute the (a, b) affine
    surface on a `scaling`-times-downsampled image with radius/scaling,
    then bilinear-upsample (a, b) and apply at full resolution.  The
    surface is low-frequency by construction (box means at radius), so
    the subsampling error is negligible while the box-filter work drops
    by scaling^2 (the reference uses scaling = 4 unconditionally; big
    radii here use 8 since the surface is even smoother)."""
    import jax

    if radius < 4 or scaling <= 1:
        return guided_filter(guide, src, radius, eps)
    s = int(scaling)
    H, W = guide.shape[-2:]
    Hp, Wp = -(-H // s) * s, -(-W // s) * s
    pad = ((0, Hp - H), (0, Wp - W))
    g = jnp.pad(guide, pad, mode="edge")
    p = jnp.pad(src, pad, mode="edge")
    # block-mean downsample (2D strided slices are poison on TPU;
    # a reshape block reduction is one relayout)
    gs = g.reshape(Hp // s, s, Wp // s, s).mean((1, 3))
    ps = p.reshape(Hp // s, s, Wp // s, s).mean((1, 3))
    r = max(1, radius // s)
    mean_i = box_blur(gs, r)
    mean_p = box_blur(ps, r)
    corr_ip = box_blur(gs * ps, r)
    corr_ii = box_blur(gs * gs, r)
    var_i = jnp.maximum(corr_ii - mean_i * mean_i, 0.0)
    cov_ip = corr_ip - mean_i * mean_p
    a = box_blur(cov_ip / (var_i + eps), r)
    b = box_blur(mean_p - (cov_ip / (var_i + eps)) * mean_i, r)
    a_full = jax.image.resize(a, (Hp, Wp), "linear")[..., :H, :W]
    b_full = jax.image.resize(b, (Hp, Wp), "linear")[..., :H, :W]
    return a_full * guide + b_full


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
