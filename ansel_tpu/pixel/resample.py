"""Separable resamplers with the reference's exact kernel set.

Reference: `/root/reference/src/pixel/interpolation.c` — three kernels
(interpolation.c:300-315): bilinear (width 1, :175-193), bicubic
Catmull-Rom a = -0.5 (width 2, :200-234), Mitchell-Netravali B = C = 1/3
(width 2, :253-290; the default, interpolation.h:45).  Upsampling places
taps at k(t - i) around in = out/scale with unit norm
(_compute_upsampling_kernel, :320-342); downsampling evaluates the
kernel in *output* units (arg = i*ratio - out) and renormalizes by the
tap sum (_compute_downsampling_kernel, :354-388) — the anti-aliased
wide-support path.

TPU form: each axis becomes one dense (n_out, n_in) matrix built host
side in numpy and contracted on the MXU — no gathers, no per-pixel
kernel evaluation on device.  The matrices ride the coeffs dict (traced
args), so they are not inlined into the jit graph.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

METHODS = ("bilinear", "bicubic", "mitchell")
DEFAULT = "mitchell"
_WIDTH = {"bilinear": 1, "bicubic": 2, "mitchell": 2}


def kernel_weight(method: str, t: np.ndarray) -> np.ndarray:
    """Tap weight at (vector of) offsets t, reference formulas."""
    a = np.abs(np.asarray(t, np.float64))
    if method == "bilinear":
        return np.maximum(1.0 - a, 0.0)
    if method == "bicubic":
        t2 = a * a
        r01 = ((3.0 * t2 - 5.0 * a) * a + 2.0) * 0.5
        r12 = (a * (5.0 * a - 8.0 - t2) + 4.0) * 0.5
        return np.where(a <= 1.0, r01, np.where(a < 2.0, r12, 0.0))
    if method == "mitchell":
        a2 = a * a
        a3 = a2 * a
        r01 = (7.0 / 6.0) * a3 - 2.0 * a2 + 8.0 / 9.0
        r12 = 2.0 * a2 - (7.0 / 18.0) * a3 - (10.0 / 3.0) * a + 16.0 / 9.0
        return np.where(a <= 1.0, r01, np.where(a < 2.0, r12, 0.0))
    raise ValueError(method)


def resample_matrix(method: str, n_out: int, n_in: int) -> np.ndarray:
    """(n_out, n_in) row-stochastic resampling matrix for one axis.

    Border handling: tap indices clamp to the valid range and
    accumulate (the reference's BORDER_CLAMP + tap trimming)."""
    w = _WIDTH[method]
    scale = n_out / n_in
    M = np.zeros((n_out, n_in), np.float32)
    if n_out == n_in:
        np.fill_diagonal(M, 1.0)
        return M
    if scale >= 1.0:  # upsampling: taps at k(t - i), norm 1
        for o in range(n_out):
            t = o / scale
            f = math.floor(t) - w + 1
            idx = np.arange(f, f + 2 * w)
            wt = kernel_weight(method, t - idx)
            np.add.at(M[o], np.clip(idx, 0, n_in - 1), wt.astype(np.float32))
    else:  # downsampling: kernel in output units, renormalized
        ratio = scale
        for o in range(n_out):
            f = math.ceil((o - w) / ratio)
            t = f * ratio - o
            num = int((w - t) / ratio)
            idx = np.arange(f, f + num)
            wt = kernel_weight(method, t + np.arange(num) * ratio)
            s = wt.sum()
            if s > 0:
                wt = wt / s
            np.add.at(M[o], np.clip(idx, 0, n_in - 1), wt.astype(np.float32))
    return M


def resample_coeffs(method: str, in_h: int, in_w: int, out_h: int,
                    out_w: int) -> dict:
    """Host-side coeff arrays for `apply_resample`."""
    return {"rs_mh": resample_matrix(method, out_h, in_h),
            "rs_mw": resample_matrix(method, out_w, in_w)}


def apply_resample(x: jnp.ndarray, mh: jnp.ndarray,
                   mw: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W) x (out_h, H) x (out_w, W) -> (..., out_h, out_w);
    two MXU contractions."""
    t = jnp.einsum("oh,...hw->...ow", mh, x,
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("pw,...ow->...op", mw, t,
                      precision=jax.lax.Precision.HIGHEST)
