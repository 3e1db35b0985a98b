"""Curve interpolators: cubic spline / Catmull-Rom / monotone Hermite,
sampled host-side into LUTs, evaluated in-graph via fused interpolation.

Reference: `/root/reference/src/common/curve_tools.c` (the three curve
types used by tonecurve/rgbcurve/basecurve/colorzones) + the unbounded
extrapolation convention (dt extrapolates linearly above the last node with
the slope fitted there).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

CUBIC_SPLINE = 0
CATMULL_ROM = 1
MONOTONE_HERMITE = 2

LUT_SIZE = 4096


def _hermite(xs, ys, ms, t):
    """Evaluate piecewise-cubic Hermite with node slopes ms at positions t."""
    idx = np.clip(np.searchsorted(xs, t) - 1, 0, len(xs) - 2)
    h = xs[idx + 1] - xs[idx]
    h = np.where(h <= 0, 1e-9, h)
    u = (t - xs[idx]) / h
    h00 = 2 * u**3 - 3 * u**2 + 1
    h10 = u**3 - 2 * u**2 + u
    h01 = -2 * u**3 + 3 * u**2
    h11 = u**3 - u**2
    return (h00 * ys[idx] + h10 * h * ms[idx]
            + h01 * ys[idx + 1] + h11 * h * ms[idx + 1])


def _slopes_catmull(xs, ys):
    ms = np.zeros_like(ys)
    ms[1:-1] = (ys[2:] - ys[:-2]) / np.maximum(xs[2:] - xs[:-2], 1e-9)
    ms[0] = (ys[1] - ys[0]) / max(xs[1] - xs[0], 1e-9)
    ms[-1] = (ys[-1] - ys[-2]) / max(xs[-1] - xs[-2], 1e-9)
    return ms


def _slopes_monotone(xs, ys):
    """Fritsch-Carlson monotone cubic slopes (MONOTONE_HERMITE)."""
    d = (ys[1:] - ys[:-1]) / np.maximum(xs[1:] - xs[:-1], 1e-9)
    ms = np.zeros_like(ys)
    ms[1:-1] = (d[:-1] + d[1:]) / 2.0
    ms[0], ms[-1] = d[0], d[-1]
    for i in range(len(d)):
        if d[i] == 0.0:
            ms[i] = ms[i + 1] = 0.0
        else:
            a = ms[i] / d[i]
            b = ms[i + 1] / d[i]
            s = a * a + b * b
            if s > 9.0:
                tau = 3.0 / np.sqrt(s)
                ms[i] = tau * a * d[i]
                ms[i + 1] = tau * b * d[i]
    return ms


def _slopes_natural(xs, ys):
    """Natural cubic spline node slopes via the tridiagonal second-derivative
    solve (CUBIC_SPLINE)."""
    n = len(xs)
    if n == 2:
        m = (ys[1] - ys[0]) / max(xs[1] - xs[0], 1e-9)
        return np.array([m, m])
    h = np.maximum(np.diff(xs), 1e-9)
    A = np.zeros((n, n))
    rhs = np.zeros(n)
    A[0, 0] = A[-1, -1] = 1.0
    for i in range(1, n - 1):
        A[i, i - 1] = h[i - 1]
        A[i, i] = 2 * (h[i - 1] + h[i])
        A[i, i + 1] = h[i]
        rhs[i] = 3 * ((ys[i + 1] - ys[i]) / h[i] - (ys[i] - ys[i - 1]) / h[i - 1])
    c = np.linalg.solve(A, rhs)  # second-derivative/2 coefficients
    ms = np.zeros(n)
    for i in range(n - 1):
        ms[i] = (ys[i + 1] - ys[i]) / h[i] - h[i] * (2 * c[i] + c[i + 1]) / 3
    ms[-1] = (ys[-1] - ys[-2]) / h[-1] + h[-1] * (2 * c[-1] + c[-2]) / 3
    return ms


def sample_curve(nodes_x, nodes_y, curve_type: int, lut_max: float = 1.0,
                 size: int = LUT_SIZE) -> np.ndarray:
    """Sample the curve into a LUT over [0, lut_max]; the curve extrapolates
    linearly beyond the outer nodes (dt's unbounded convention)."""
    xs = np.asarray(nodes_x, np.float64)
    ys = np.asarray(nodes_y, np.float64)
    order = np.argsort(xs)
    xs, ys = xs[order], ys[order]
    if curve_type == CATMULL_ROM:
        ms = _slopes_catmull(xs, ys)
    elif curve_type == MONOTONE_HERMITE:
        ms = _slopes_monotone(xs, ys)
    else:
        ms = _slopes_natural(xs, ys)
    t = np.linspace(0.0, lut_max, size)
    out = _hermite(xs, ys, ms, np.clip(t, xs[0], xs[-1]))
    # linear extrapolation outside node range
    lo = t < xs[0]
    hi = t > xs[-1]
    out[lo] = ys[0] + ms[0] * (t[lo] - xs[0])
    out[hi] = ys[-1] + ms[-1] * (t[hi] - xs[-1])
    return out.astype(np.float32)


def apply_lut(x: jnp.ndarray, lut, lut_max: float = 1.0,
              unbounded_slope: float = None) -> jnp.ndarray:
    """In-graph LUT application with linear in-bin interpolation; above
    lut_max extrapolate linearly with the final slope."""
    lut = jnp.asarray(lut)
    n = lut.shape[0]
    pos = jnp.clip(x / lut_max, 0.0, 1.0) * (n - 1)
    i0 = jnp.clip(pos.astype(jnp.int32), 0, n - 2)
    frac = pos - i0.astype(x.dtype)
    v = lut[i0] * (1.0 - frac) + lut[i0 + 1] * frac
    if unbounded_slope is not None:
        v = jnp.where(x > lut_max,
                      lut[-1] + (x - lut_max) * unbounded_slope, v)
    return v
