"""Poisson heal (seamless clone) — the GIMP-heritage healing solver.

Reference: `/root/reference/src/pixel/heal.c` — solve the Laplace
equation for the (destination - source) difference inside the mask with
the unmasked difference as boundary condition, then add the source back
(dt_heal / _heal_laplace_loop :314-380, red-black Gauss-Seidel there).

TPU form: damped Jacobi relaxation under `lax.scan` with a 3-level
coarse-to-fine initialization (downsampled solves seed the finer level),
which converges as fast as the reference's Gauss-Seidel sweeps for the
patch sizes involved and keeps every step a fused 4-tap stencil.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .shifts import PaddedView


def _avg4(u):
    pv = PaddedView(u, 1)
    return 0.25 * (pv.at(-1, 0) + pv.at(1, 0) + pv.at(0, -1) + pv.at(0, 1))


def _jacobi(diff, mask, init, iters: int):
    def body(u, _):
        return jnp.where(mask, _avg4(u), diff), None

    u, _ = jax.lax.scan(body, init, None, length=iters)
    return u


def _down2(x):
    # channel-aware 2x decimation (single-axis slices; see CLAUDE.md on
    # 2D strided slices)
    x = jax.lax.optimization_barrier(x[..., ::2, :])
    return x[..., :, ::2]


def _up2(x, shape):
    h, w = shape
    out = jnp.repeat(jnp.repeat(x, 2, axis=-2), 2, axis=-1)
    return out[..., :h, :w]


def heal(dst: jnp.ndarray, src: jnp.ndarray, mask: jnp.ndarray,
         iters: int = 96) -> jnp.ndarray:
    """dst, src: (C, H, W); mask: (H, W) in [0, 1].  -> healed dst."""
    hard = mask > 0.5
    diff = jnp.where(hard[None], 0.0, dst - src)

    # 3-level coarse-to-fine initialization
    d1, m1 = _down2(diff), _down2(hard)
    d2, m2 = _down2(d1), _down2(m1)
    u2 = _jacobi(d2, m2[None], d2, iters)
    u1 = _jacobi(d1, m1[None], jnp.where(m1[None], _up2(u2, d1.shape[-2:]),
                                         d1), iters)
    u = _jacobi(diff, hard[None], jnp.where(hard[None],
                                            _up2(u1, diff.shape[-2:]), diff),
                iters)
    healed = src + u
    return dst * (1.0 - mask)[None] + healed * mask[None]
