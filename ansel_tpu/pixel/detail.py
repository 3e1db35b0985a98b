"""Raw-detail mask (scharr gradient magnitude -> sigmoid -> 9x9 blur).

Reference: `/root/reference/src/develop/masks/detail.c`
(dt_masks_calc_rawdetail_mask :283-315: sqrt-gamma luminance + scharr;
calcBlendFactor sigmoid :317-323; dt_masks_calc_detail_mask :325-335;
dt_masks_blur_9x9_coeff :159-196: disc-truncated gaussian, sigma 2).
Consumers: dual demosaic's blend mask (demosaic/dual.c:81-83) and the
blend details slider (develop/blend.c:381).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .shifts import PaddedView


def _blur_9x9_kernel(sigma: float = 2.0) -> np.ndarray:
    k = np.zeros((9, 9), np.float32)
    rng = (3.0 * 1.5) ** 2
    for dy in range(-4, 5):
        for dx in range(-4, 5):
            r2 = dy * dy + dx * dx
            if r2 <= rng:
                k[dy + 4, dx + 4] = np.exp(r2 / (-2.0 * sigma * sigma))
    return k / k.sum()


def blur_9x9(x: jnp.ndarray, sigma: float = 2.0) -> jnp.ndarray:
    k = _blur_9x9_kernel(sigma)
    p = PaddedView(x, 4)
    out = None
    for dy in range(-4, 5):
        for dx in range(-4, 5):
            w = float(k[dy + 4, dx + 4])
            if w == 0.0:
                continue
            t = w * p.at(dy, dx)
            out = t if out is None else out + t
    return jnp.clip(out, 0.0, 1.0)


def rawdetail_mask(rgb: jnp.ndarray, wb=(1.0, 1.0, 1.0)) -> jnp.ndarray:
    """(3, H, W) demosaiced camera RGB -> (H, W) scharr gradient plane
    (detail.c:283-315)."""
    val = (jnp.maximum(rgb[0], 0.0) / wb[0]
           + jnp.maximum(rgb[1], 0.0) / wb[1]
           + jnp.maximum(rgb[2], 0.0) / wb[2]) / 3.0
    t = jnp.sqrt(val)  # sqrt gamma: noise variance uniform
    p = PaddedView(t, 1)
    gx = (47.0 * (p.at(-1, -1) - p.at(-1, 1))
          + 162.0 * (p.at(0, -1) - p.at(0, 1))
          + 47.0 * (p.at(1, -1) - p.at(1, 1)))
    gy = (47.0 * (p.at(-1, -1) - p.at(1, -1))
          + 162.0 * (p.at(-1, 0) - p.at(1, 0))
          + 47.0 * (p.at(-1, 1) - p.at(1, 1)))
    return jnp.sqrt((gx / 256.0) ** 2 + (gy / 256.0) ** 2) / 16.0


def detail_mask(raw_mask: jnp.ndarray, threshold: float,
                detail: bool = True) -> jnp.ndarray:
    """Sigmoid blend factor + 9x9 blur (detail.c:317-335)."""
    blend = 1.0 / (1.0 + jnp.exp(16.0 - (16.0 / threshold) * raw_mask))
    if not detail:
        blend = 1.0 - blend
    return blur_9x9(blend, 2.0)
