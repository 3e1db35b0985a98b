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


# test hook: run the Pallas separable filter in interpret mode on CPU
# (also bypasses the size guard so small test planes exercise the kernel)
_FORCE_PALLAS_INTERPRET = False
# escape hatch: force the XLA shifted-add path even on TPU
_DISABLE_PALLAS = False


def sep_filter(x: jnp.ndarray, taps, dilation: int = 1,
               mode: str = "edge") -> jnp.ndarray:
    """Separable odd-length FIR as shifted adds.

    XLA's TPU conv lowering im2col-pads single-channel planes to 128 lanes
    (a 5-tap blur of a 45MP plane allocates 23 GB); expressing the filter as
    slice+multiply-add chains keeps it one fused elementwise pass.

    On TPU, big planes route to the halo-tile Pallas kernel
    (kernels/sepblur_pallas): both axis passes run VMEM-resident in tap
    order, so the result is float-identical to the XLA chain while the
    HBM traffic drops from ~6 round-trips to read+write.
    """
    taps = list(taps)
    import jax as _jax

    r_ = (len(taps) - 1) // 2
    if (not _DISABLE_PALLAS and mode == "edge"
            and x.ndim in (2, 3) and (x.ndim == 2 or x.shape[0] <= 8)
            and x.dtype == jnp.float32 and r_ * dilation <= 256
            and (_FORCE_PALLAS_INTERPRET
                 or (_jax.default_backend() == "tpu"
                     and x.shape[-2] * x.shape[-1] >= (1 << 20)))):
        from ..kernels.sepblur_pallas import sep_blur_pallas

        return sep_blur_pallas(x, taps, dilation,
                               interpret=_FORCE_PALLAS_INTERPRET)
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
