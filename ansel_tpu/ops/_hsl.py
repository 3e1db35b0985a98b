"""Vectorized HSL <-> RGB for display-referred creative ops
(reference src/common/colorspaces_inline_conversions.h hsl helpers)."""

from __future__ import annotations

import jax.numpy as jnp


def rgb_to_hsl(rgb: jnp.ndarray):
    """(3,H,W) -> (h, s, l) each (H,W), h in [0,1)."""
    mx = jnp.max(rgb, axis=0)
    mn = jnp.min(rgb, axis=0)
    l = (mx + mn) * 0.5
    d = mx - mn
    s = jnp.where(
        d <= 1e-9, 0.0,
        jnp.where(l < 0.5, d / jnp.maximum(mx + mn, 1e-9),
                  d / jnp.maximum(2.0 - mx - mn, 1e-9)))
    r, g, b = rgb[0], rgb[1], rgb[2]
    dd = jnp.maximum(d, 1e-9)
    h = jnp.where(mx == r, (g - b) / dd % 6.0,
                  jnp.where(mx == g, (b - r) / dd + 2.0,
                            (r - g) / dd + 4.0))
    h = jnp.where(d <= 1e-9, 0.0, h / 6.0)
    return h, s, l


def hsl_to_rgb(h: jnp.ndarray, s: jnp.ndarray, l: jnp.ndarray) -> jnp.ndarray:
    c = (1.0 - jnp.abs(2.0 * l - 1.0)) * s
    hp = (h % 1.0) * 6.0
    xv = c * (1.0 - jnp.abs(hp % 2.0 - 1.0))
    m = l - c / 2.0
    z = jnp.zeros_like(c)

    # nested wheres, not jnp.select: select lowers to an integer argmax
    # over the condition stack, which has no Pallas TPU lowering (this
    # runs inside the fused pointwise chain via splittoning/colorzones).
    def pick(v0, v1, v2, v3, v4, v5):
        return jnp.where(hp < 1, v0,
               jnp.where(hp < 2, v1,
               jnp.where(hp < 3, v2,
               jnp.where(hp < 4, v3,
               jnp.where(hp < 5, v4, v5)))))

    r = pick(c, xv, z, z, xv, c)
    g = pick(xv, c, c, xv, z, z)
    b = pick(z, z, xv, c, c, xv)
    return jnp.stack([r + m, g + m, b + m])
