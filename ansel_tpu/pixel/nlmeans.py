"""Non-local means denoising core.

Reference: `/root/reference/src/pixel/nlmeans_core.c` — patch-SSD weighted
average over a (2K+1)^2 search window; two weightings:
  * iop variant (denoise non-local): w = 2^-(ssd * sharpness)
    (nlmeans_core.c:405)
  * denoiseprofile variant: w = 2^-(max(0, (ssd + center_diff*cp_norm)
    /(1+center_weight) * sharpness - 2)) (nlmeans_core.c:417-423)
with optional patch scattering (`scatter`, nlmeans_core.c:95-110).

TPU form: `lax.scan` over the search offsets — ONE shifted view lives at a
time (pad once, `dynamic_slice` per step), its SSD box-summed via cumsum,
weighted and accumulated.  An unrolled whole-image version holds every
shifted copy simultaneously and OOMs 16 GB HBM at 24 MP (the jnp.roll
trap, CLAUDE.md); the scan bounds liveness to a handful of (3, H, W)
buffers regardless of window size.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from .blur import box_blur_1d


def _patch_sum(x: jnp.ndarray, radius: int) -> jnp.ndarray:
    n = (2 * radius + 1)
    return box_blur_1d(box_blur_1d(x, radius, -2), radius, -1) * (n * n)


def _scatter(scale: float, scattering: float, i1: int, i2: int):
    """reference scatter() (nlmeans_core.c:94-103): |i1|^3 lattice
    spreading, the scale factor multiplying the WHOLE expression
    (including the base offset), C int truncation."""
    if scattering <= 0.0 and scale == 1.0:
        return i1, i2

    def s(a, b):
        aa, ab = abs(a), abs(b)
        sg = (a > 0) - (a < 0)
        return int(scale * ((aa * aa * aa + 7.0 * aa * math.sqrt(ab))
                            * sg * scattering / 6.0 + a))

    return s(i1, i2), s(i2, i1)


def nlmeans(img: jnp.ndarray, patch_radius: int, search_radius: int,
            sharpness, norm, center_weight: float = -1.0,
            scattering: float = 0.0, scale: float = 1.0,
            decimate: bool = False, force_xla: bool = False) -> jnp.ndarray:
    """(3, H, W) -> (3, H, W) weighted patch average (not yet blended with
    the input — callers apply luma/chroma blending).

    decimate: skip every other search patch — the reference's
    fast-preview mode for THUMBNAIL/PREVIEW pipes (nlmeans.c:440,
    define_patches' `++decimate & 1` alternation)."""
    H, W = img.shape[-2:]
    offsets_py = []
    dec = 1 if decimate else 0
    for dy in range(-search_radius, search_radius + 1):
        for dx in range(-search_radius, search_radius + 1):
            if dec:
                dec += 1
                if dec & 1:
                    continue
            offsets_py.append(_scatter(scale, scattering, dy, dx))
    m_off = max((max(abs(a), abs(b)) for a, b in offsets_py), default=0)

    if (not force_xla and jax.default_backend() == "tpu"
            and img.shape[0] == 3
            and m_off + patch_radius <= 120 and patch_radius <= 4):
        from ..kernels.nlm_pallas import nlm_pallas

        n = 2 * patch_radius + 1
        if center_weight >= 0.0:
            return nlm_pallas(img, tuple(offsets_py), patch_radius, norm,
                              sharpness, center_weight * n * n,
                              1.0 / (1.0 + center_weight), variant=1)
        return nlm_pallas(img, tuple(offsets_py), patch_radius, norm,
                          sharpness, 0.0, 1.0, variant=0)

    norm = jnp.asarray(norm, img.dtype).reshape(3, 1, 1)
    if center_weight >= 0.0:
        n = 2 * patch_radius + 1
        cp_norm = center_weight * n * n

    off = np.asarray(offsets_py, np.int32)
    m = int(np.abs(off).max()) if len(off) else 0
    # edge-pad once; per-step shifted views are dynamic slices of this
    pad = jnp.pad(img, ((0, 0), (m, m), (m, m)), mode="edge")

    def step(carry, o):
        acc, wsum = carry
        sh = jax.lax.dynamic_slice(
            pad, (0, m + o[0], m + o[1]), (img.shape[0], H, W))
        d2 = jnp.sum(norm * (img - sh) ** 2, axis=0)
        ssd = _patch_sum(d2, patch_radius)
        from .fastmath import dt_fast_mexp2f

        if center_weight < 0.0:
            w = dt_fast_mexp2f(ssd * sharpness)   # gh(), bit-exact
        else:
            dis = (ssd + d2 * cp_norm) / (1.0 + center_weight)
            w = dt_fast_mexp2f(jnp.maximum(0.0, dis * sharpness - 2.0))
        return (acc + sh * w[None], wsum + w), None

    init = (jnp.zeros_like(img), jnp.zeros_like(img[0]))
    (acc, wsum), _ = jax.lax.scan(step, init, jnp.asarray(off))
    return acc / jnp.maximum(wsum, 1e-12)[None]
