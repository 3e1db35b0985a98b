"""X-Trans demosaic.

Reference: `/root/reference/src/iop/demosaic/markesteijn.c` (1/3-pass
Markesteijn).  Round 1 ships a gradient-weighted sparse-plane interpolation
(VNG-lite) so the X-Trans pipeline is functional end-to-end; the full
Markesteijn 1/3-pass dataflow is a scheduled milestone (SURVEY.md §7 step 6).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import _bayer


def _conv2(x, k):
    k = jnp.asarray(k, x.dtype)
    return jax.lax.conv_general_dilated(
        x[None, None], k[None, None], (1, 1), "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0, 0]


def xtrans_demosaic(x: jnp.ndarray, pattern6) -> jnp.ndarray:
    """(H, W) X-Trans mosaic -> (3, H, W). Normalized-convolution
    interpolation per color plane with a 5x5 distance-weighted kernel,
    then green-difference chroma refinement."""
    h, w = x.shape
    masks = _bayer.xtrans_color_masks(pattern6, h, w, x.dtype)
    k5 = [
        [1, 2, 3, 2, 1],
        [2, 4, 6, 4, 2],
        [3, 6, 9, 6, 3],
        [2, 4, 6, 4, 2],
        [1, 2, 3, 2, 1],
    ]
    planes = []
    for ci in range(3):
        m = masks[ci]
        num = _conv2(x * m, k5)
        den = _conv2(m, k5)
        est = num / jnp.maximum(den, 1e-6)
        planes.append(jnp.where(m > 0, x, est))
    r, g, b = planes
    # chroma refinement: re-interpolate R/B as green + smoothed difference
    out = [None, g, None]
    for ci, p in ((0, r), (2, b)):
        m = masks[ci]
        diff = (x - g) * m
        num = _conv2(diff, k5)
        den = _conv2(m, k5)
        out[ci] = jnp.maximum(g + num / jnp.maximum(den, 1e-6), 0.0)
    return jnp.stack(out)
