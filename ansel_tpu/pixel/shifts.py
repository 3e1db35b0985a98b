"""Shifted-view stencils that fuse.

`jnp.roll` lowers to concat(slice, slice) which XLA materializes — a
whole-image stencil with N taps then holds N full-resolution buffers (the
45MP diffuse OOM).  Padding ONCE and taking static slices instead gives XLA
pure slice+elementwise chains it fuses into a single pass: 1 padded buffer
regardless of tap count.
"""

from __future__ import annotations

from typing import Dict, Iterable, Tuple

import jax.numpy as jnp


class PaddedView:
    """Pad an (..., H, W) array once by `margin` and serve shifted views as
    fusible static slices."""

    def __init__(self, x: jnp.ndarray, margin: int, mode: str = "edge"):
        self.h, self.w = x.shape[-2:]
        self.margin = margin
        pad = [(0, 0)] * (x.ndim - 2) + [(margin, margin), (margin, margin)]
        self.p = jnp.pad(x, pad, mode=mode)

    def at(self, dy: int, dx: int) -> jnp.ndarray:
        m = self.margin
        return self.p[..., m + dy : m + dy + self.h,
                      m + dx : m + dx + self.w]
