"""Fast local Laplacian filter.

Reference: `/root/reference/src/pixel/locallaplacian.c` (Paris/Hasinoff/
Kautz fast local-laplacian with num_gamma=6 remap samples,
locallaplacian.c:48,282-470): Gaussian pyramid of the input, 6 curve-
remapped pyramids (curve_scalar, locallaplacian.c:295-326: quadratic-bezier
shadow/highlight compression + Gaussian clarity boost), per-level Laplacian
linearly interpolated between the two bracketing gamma buffers, then
collapsed.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

NUM_GAMMA = 6
_K5 = np.array([1.0, 4.0, 6.0, 4.0, 1.0], np.float32) / 16.0


def _blur5(x):
    k = jnp.asarray(_K5, x.dtype)
    xp = jnp.pad(x[None, None], ((0, 0), (0, 0), (2, 2), (2, 2)), mode="edge")
    y = jax.lax.conv_general_dilated(
        xp, k.reshape(1, 1, 5, 1), (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    y = jax.lax.conv_general_dilated(
        y, k.reshape(1, 1, 1, 5), (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return y[0, 0]


def _reduce(x):
    return _blur5(x)[::2, ::2]


def _expand(x, shape):
    h, w = shape
    up = jnp.zeros((h, w), x.dtype)
    up = up.at[::2, ::2].set(x[: (h + 1) // 2, : (w + 1) // 2])
    return _blur5(up) * 4.0


def curve(x, g, sigma, shadows, highlights, clarity):
    """curve_scalar (locallaplacian.c:295-326), vectorized."""
    c = x - g
    t_s = jnp.clip(c / (2.0 * sigma), 0.0, 1.0)
    t_h = jnp.clip(-c / (2.0 * sigma), 0.0, 1.0)
    val_shadow = g + sigma * 2.0 * (1.0 - t_s) * t_s \
        + t_s * t_s * (sigma + sigma * shadows)
    val_highlight = g - sigma * 2.0 * (1.0 - t_h) * t_h \
        + t_h * t_h * (-sigma - sigma * highlights)
    val = jnp.where(c > 2.0 * sigma, g + sigma + shadows * (c - sigma),
                    jnp.where(c < -2.0 * sigma,
                              g - sigma + highlights * (c + sigma),
                              jnp.where(c > 0.0, val_shadow, val_highlight)))
    return val + clarity * c * jnp.exp(-c * c / (2.0 * sigma * sigma / 3.0))


def local_laplacian(L: jnp.ndarray, sigma: float, shadows: float,
                    highlights: float, clarity: float) -> jnp.ndarray:
    """(H, W) luminance in [0,1] -> filtered. Static pyramid depth from the
    image size (reference: down to ~4px, capped)."""
    h, w = L.shape
    n_levels = max(2, min(10, int(math.log2(max(min(h, w), 4))) - 1))

    # Gaussian pyramid of the input
    gpyr = [L]
    for _ in range(n_levels - 1):
        gpyr.append(_reduce(gpyr[-1]))

    gammas = [(k + 0.5) / NUM_GAMMA for k in range(NUM_GAMMA)]
    # remapped pyramids
    remap_pyrs = []
    for g in gammas:
        r = curve(L, g, sigma, shadows, highlights, clarity)
        pyr = [r]
        for _ in range(n_levels - 1):
            pyr.append(_reduce(pyr[-1]))
        remap_pyrs.append(pyr)

    # collapse: start from the input's coarsest gaussian level
    out = gpyr[-1]
    for lvl in range(n_levels - 2, -1, -1):
        shape = gpyr[lvl].shape
        out = _expand(out, shape)
        # laplacian of each gamma buffer at this level
        laps = [p[lvl] - _expand(p[lvl + 1], shape) for p in remap_pyrs]
        v = gpyr[lvl]
        # piecewise-linear interpolation between bracketing gammas
        step = 1.0 / NUM_GAMMA
        idx = jnp.clip((v - 0.5 * step) / step, 0.0, NUM_GAMMA - 1.0)
        # hat-weight linear interpolation, fully fused (no gathers)
        acc = jnp.zeros_like(v)
        for k in range(NUM_GAMMA):
            wk = jnp.maximum(0.0, 1.0 - jnp.abs(idx - k))
            acc = acc + wk * laps[k]
        out = out + acc
    return out
