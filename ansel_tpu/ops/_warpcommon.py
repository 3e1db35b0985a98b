"""Shared dispatch for static-coefficient geometric warps.

ashift / clipping / (lens) all resample the image at source coordinates
given by a closed-form map with STATIC coefficients (plan.static), so
the displacement bounds are computable host-side and the Pallas
two-pass warp (kernels/warp_pallas, VPU-speed) applies.  A direct XLA
gather runs at ~12-21 ns/element on the TPU's serial gather unit —
1.4-1.7 s per 24MP module vs ~30 ms for the kernel.

The global translation component (crop origins, lens shifts) is peeled
off as a static integer src_offset (warp_model cuts the halo window
from REAL source data around the offset grid) so the kernel cost only
covers the residual (rotation/keystone/shear) displacement.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# beyond this residual displacement the halo window stops paying off
MAX_RESIDUAL = 480.0


def _host_bounds(coord_np, oh: int, ow: int):
    """Sample the static map on a coarse grid -> integer offsets +
    residual radii (host side, numpy)."""
    ys = np.linspace(0.0, oh - 1.0, 41)
    xs = np.linspace(0.0, ow - 1.0, 81)
    Y, X = np.meshgrid(ys, xs, indexing="ij")
    sy, sx = coord_np(Y, X)
    if not (np.isfinite(sy).all() and np.isfinite(sx).all()):
        return None
    dy = sy - Y
    dx = sx - X
    oy = int(round((dy.min() + dy.max()) / 2.0))
    ox = int(round((dx.min() + dx.max()) / 2.0))
    ry = float((dy.max() - dy.min()) / 2.0 + 6.0)
    rx = float((dx.max() - dx.min()) / 2.0 + 6.0)
    if ry > MAX_RESIDUAL or rx > MAX_RESIDUAL:
        return None
    return oy, ox, ry, rx


def warp_static(x, coord_np, coord_jnp, oh: int, ow: int):
    """Warp (C, H, W) source to an (C, oh, ow) output grid.

    coord_np / coord_jnp: the same (y, x) -> (sy, sx) map in numpy
    (host bound probing) and jnp (traced evaluation).  Returns the
    resampled image; the caller applies its own outside-mask.
    """
    bounds = _host_bounds(coord_np, oh, ow) \
        if jax.default_backend() == "tpu" else None
    if bounds is None:
        # XLA gather fallback (CPU, or pathological displacement)
        from .lens import _sample_bilinear

        ys = jnp.arange(oh, dtype=jnp.float32)[:, None]
        xs = jnp.arange(ow, dtype=jnp.float32)[None, :]
        sy, sx = coord_jnp(ys, xs)
        sy = jnp.broadcast_to(sy, (oh, ow))
        sx = jnp.broadcast_to(sx, (oh, ow))
        return jnp.stack([_sample_bilinear(x[i], sy, sx)
                          for i in range(x.shape[0])])

    from ..kernels.warp_pallas import warp_model

    oy, ox, ry, rx = bounds
    return warp_model(x, coord_jnp, ry, rx, out_shape=(oh, ow),
                      src_offset=(oy, ox))
