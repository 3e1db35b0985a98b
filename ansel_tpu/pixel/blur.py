"""Blurs: box (integral-image cumsum), Gaussian (separable conv / iterated
box), used by guided filters, toneequal, lowpass, sharpen.

Reference: `/root/reference/src/pixel/box_filters.c` (multi-pass box blurs),
`src/pixel/gaussian.c` (IIR Gaussian).  The IIR recursion is serial per
scanline — hostile to the VPU — so the TPU version uses either a truncated
separable FIR (exact to float precision for moderate sigma) or 3 iterated
box filters via cumulative sums (O(1) per pixel at any radius, and XLA
lowers cumsum to an efficient parallel scan).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def box_blur_1d(x: jnp.ndarray, radius: int, axis: int) -> jnp.ndarray:
    """Mean over a (2r+1) window via padded cumsum — O(1)/pixel any radius."""
    if radius <= 0:
        return x
    n = x.shape[axis]
    pad = [(0, 0)] * x.ndim
    pad[axis] = (radius + 1, radius)
    xp = jnp.pad(x, pad, mode="edge")
    cs = jnp.cumsum(xp, axis=axis)
    hi = jax.lax.slice_in_dim(cs, 2 * radius + 1, 2 * radius + 1 + n, axis=axis)
    lo = jax.lax.slice_in_dim(cs, 0, n, axis=axis)
    return (hi - lo) / (2 * radius + 1)


def box_blur(x: jnp.ndarray, radius: int) -> jnp.ndarray:
    return box_blur_1d(box_blur_1d(x, radius, -2), radius, -1)


def gaussian_blur(x: jnp.ndarray, sigma: float, truncate: float = 4.0) -> jnp.ndarray:
    """Separable FIR Gaussian for moderate sigma; iterated cumsum box blur
    beyond (radius-independent cost — the TPU stand-in for the reference's
    IIR Gaussian, src/pixel/gaussian.c)."""
    if sigma <= 0:
        return x
    if sigma > 8.0:
        return fast_gaussian(x, sigma)
    r = max(1, int(math.ceil(truncate * sigma)))
    t = np.arange(-r, r + 1, dtype=np.float32)
    k = np.exp(-0.5 * (t / sigma) ** 2)
    k /= k.sum()
    from .shifts import sep_filter

    return sep_filter(x, [float(v) for v in k])


def fast_gaussian(x: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """3 iterated box blurs ~ Gaussian (radius from sigma, standard rule);
    preferable for very large sigma (cost independent of radius)."""
    if sigma <= 0:
        return x
    # ideal box width for 3 passes (W. Kaiser / classic derivation)
    wi = math.sqrt(4.0 * sigma * sigma / 3.0 + 1.0)
    r = max(1, int((wi - 1) / 2))
    y = x
    for _ in range(3):
        y = box_blur(y, r)
    return y
