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


def sep_filter(x: jnp.ndarray, taps, dilation: int = 1,
               mode: str = "edge") -> jnp.ndarray:
    """Separable odd-length FIR as shifted adds.

    XLA's TPU conv lowering im2col-pads single-channel planes to 128 lanes
    (a 5-tap blur of a 45MP plane allocates 23 GB); expressing the filter as
    slice+multiply-add chains keeps it one fused elementwise pass.
    """
    taps = list(taps)
    r = (len(taps) - 1) // 2
    m = r * dilation
    # vertical pass
    pv = PaddedView(x, m, mode)
    y = None
    for i, t in enumerate(taps):
        contrib = t * pv.at((i - r) * dilation, 0)
        y = contrib if y is None else y + contrib
    # horizontal pass
    ph = PaddedView(y, m, mode)
    out = None
    for i, t in enumerate(taps):
        contrib = t * ph.at(0, (i - r) * dilation)
        out = contrib if out is None else out + contrib
    return out
