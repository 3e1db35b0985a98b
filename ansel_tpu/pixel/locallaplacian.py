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
    from .shifts import sep_filter

    return sep_filter(x, _K5)


def _reduce(x):
    # two single-axis strided slices with a barrier: the fused
    # [::2, ::2] lowers to a 15x-slower 2D strided copy on TPU
    b = _blur5(x)
    b = jax.lax.optimization_barrier(b[..., ::2, :])
    return b[..., :, ::2]


def _expand(x, shape):
    h, w = shape
    x = x[..., : (h + 1) // 2, : (w + 1) // 2]
    lead = x.shape[:-2]
    h2, w2 = x.shape[-2:]
    # zero-interleave via stack+reshape (a [::2, ::2] scatter is 5x slower)
    up = jnp.stack([x, jnp.zeros_like(x)], axis=-1).reshape(*lead, h2, w2 * 2)
    up = jnp.stack([up, jnp.zeros_like(up)], axis=-2).reshape(*lead, h2 * 2,
                                                              w2 * 2)
    up = up[..., :h, :w]
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

    # Gaussian pyramid of the input (shared weights source)
    gpyr = [L]
    for _ in range(n_levels - 1):
        gpyr.append(_reduce(gpyr[-1]))

    step = 1.0 / NUM_GAMMA
    # hat weights per level, precomputed from the input pyramid
    idxs = [jnp.clip((g - 0.5 * step) / step, 0.0, NUM_GAMMA - 1.0)
            for g in gpyr[:-1]]

    def gamma_body(carry, g):
        """One gamma's remap pyramid + its weighted laplacian contribution
        accumulated per level.  lax.scan keeps only ONE gamma pyramid live
        at a time — 6 materialized pyramids OOM'd the 45MP config.  (A
        level-synchronous (6, h, w) batched variant was built and
        measured 80 ms vs this form's 73 ms at 45MP — the batch's larger
        interleave/weight intermediates cost more than the 6x dispatch
        savings; see docs/PERF.md dead-end list.)"""
        accs, k = carry
        r = curve(L, g, sigma, shadows, highlights, clarity)
        pyr = [r]
        for _ in range(n_levels - 1):
            pyr.append(_reduce(pyr[-1]))
        new_accs = []
        for lvl in range(n_levels - 1):
            lap = pyr[lvl] - _expand(pyr[lvl + 1], pyr[lvl].shape)
            wk = jnp.maximum(0.0, 1.0 - jnp.abs(idxs[lvl] - k))
            new_accs.append(accs[lvl] + wk * lap)
        return (tuple(new_accs), k + 1.0), None

    init_accs = tuple(jnp.zeros_like(gpyr[lvl])
                      for lvl in range(n_levels - 1))
    gammas = jnp.asarray([(k + 0.5) / NUM_GAMMA for k in range(NUM_GAMMA)],
                         L.dtype)
    (accs, _), _ = jax.lax.scan(gamma_body,
                                (init_accs, jnp.asarray(0.0, L.dtype)),
                                gammas)

    # collapse: coarsest gaussian + accumulated per-level laplacians
    out = gpyr[-1]
    for lvl in range(n_levels - 2, -1, -1):
        out = _expand(out, gpyr[lvl].shape) + accs[lvl]
    return out
