"""Non-local means denoising core.

Reference: `/root/reference/src/pixel/nlmeans_core.c` — patch-SSD weighted
average over a (2K+1)^2 search window; two weightings:
  * iop variant (denoise non-local): w = 2^-(ssd * sharpness)
    (nlmeans_core.c:405)
  * denoiseprofile variant: w = 2^-(max(0, (ssd + center_diff*cp_norm)
    /(1+center_weight) * sharpness - 2)) (nlmeans_core.c:417-423)
with optional patch scattering (`scatter`, nlmeans_core.c:95-110).

TPU form: one fused pass per search offset — shifted view, per-channel
normed squared difference, patch box-sum via cumsum, weight, accumulate.
Whole-image XLA today; VMEM-resident Pallas variant is the scheduled
optimization.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from .blur import box_blur_1d


def _patch_sum(x: jnp.ndarray, radius: int) -> jnp.ndarray:
    n = (2 * radius + 1)
    return box_blur_1d(box_blur_1d(x, radius, -2), radius, -1) * (n * n)


def _scatter(scale: float, scattering: float, i1: int, i2: int):
    """reference scatter(): spread the search lattice without adding
    patches (nlmeans_core.c:95-110)."""
    if scattering <= 0.0:
        return i1, i2

    def s(a, b):
        return int(a * abs(a) * scattering / 6.0 * scale
                   + 7.0 * a * math.sqrt(abs(b)) * scattering / 6.0 * scale
                   + a)

    return s(i1, i2), s(i2, i1)


def nlmeans(img: jnp.ndarray, patch_radius: int, search_radius: int,
            sharpness, norm, center_weight: float = -1.0,
            scattering: float = 0.0, scale: float = 1.0) -> jnp.ndarray:
    """(3, H, W) -> (3, H, W) weighted patch average (not yet blended with
    the input — callers apply luma/chroma blending)."""
    norm = jnp.asarray(norm, img.dtype).reshape(3, 1, 1)
    acc = jnp.zeros_like(img)
    wsum = jnp.zeros_like(img[0])
    if center_weight >= 0.0:
        n = 2 * patch_radius + 1
        cp_norm = center_weight * n * n
    for dy in range(-search_radius, search_radius + 1):
        for dx in range(-search_radius, search_radius + 1):
            oy, ox = _scatter(scale, scattering, dy, dx)
            sh = img if (oy == 0 and ox == 0) else jnp.roll(
                img, (-oy, -ox), axis=(-2, -1))
            d2 = jnp.sum(norm * (img - sh) ** 2, axis=0)
            ssd = _patch_sum(d2, patch_radius)
            if center_weight < 0.0:
                w = jnp.exp2(-ssd * sharpness)
            else:
                dis = (ssd + d2 * cp_norm) / (1.0 + center_weight)
                w = jnp.exp2(-jnp.maximum(0.0, dis * sharpness - 2.0))
            acc = acc + sh * w[None]
            wsum = wsum + w
    return acc / jnp.maximum(wsum, 1e-12)[None]
