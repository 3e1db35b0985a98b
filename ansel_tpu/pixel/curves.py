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


def curve_coeffs(nodes_x, nodes_y, curve_type: int):
    """-> (xs, ys, ms) float32 node arrays for in-graph eval_curve."""
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
    return (xs.astype(np.float32), ys.astype(np.float32),
            ms.astype(np.float32))


def eval_curve(x: jnp.ndarray, xs, ys, ms,
               unbounded_slope=None) -> jnp.ndarray:
    """Exact in-graph piecewise-Hermite evaluation, gather-free.

    Per-pixel LUT gathers run at ~18 ns/element on TPU (two of them made
    every curve op a ~100 ms stage at 6 MP); the node count is tiny
    (2-20), so the segments unroll into masked FMA chains the VPU eats in
    one fused pass.  xs must be sorted; since each `where(x >= xs[k])`
    overwrites the previous segment, no upper-bound test is needed.
    Outside the node range: linear extrapolation with the edge slopes
    (dt's unbounded convention); `unbounded_slope` overrides the upper
    one when the caller fitted its own (tonecurve/rgbcurve LUT tail).
    """
    n = len(xs) if isinstance(xs, (list, tuple)) else xs.shape[0]
    out = ys[0] + ms[0] * (x - xs[0])
    for k in range(n - 1):
        h = jnp.maximum(xs[k + 1] - xs[k], 1e-9)
        u = jnp.clip((x - xs[k]) / h, 0.0, 1.0)
        u2 = u * u
        u3 = u2 * u
        val = (ys[k] * (2 * u3 - 3 * u2 + 1)
               + ms[k] * h * (u3 - 2 * u2 + u)
               + ys[k + 1] * (-2 * u3 + 3 * u2)
               + ms[k + 1] * h * (u3 - u2))
        out = jnp.where(x >= xs[k], val, out)
    hi_slope = ms[n - 1] if unbounded_slope is None else unbounded_slope
    return jnp.where(x > xs[n - 1],
                     ys[n - 1] + hi_slope * (x - xs[n - 1]), out)


def eval_linear(x: jnp.ndarray, xs, ys) -> jnp.ndarray:
    """Gather-free in-graph piecewise-LINEAR evaluation over sorted nodes
    (same unrolled masked-select trick as eval_curve)."""
    n = len(xs) if isinstance(xs, (list, tuple)) else xs.shape[0]
    out = jnp.full_like(x, ys[0]) + 0.0 * x
    for k in range(n - 1):
        h = jnp.maximum(xs[k + 1] - xs[k], 1e-9)
        u = jnp.clip((x - xs[k]) / h, 0.0, 1.0)
        val = ys[k] * (1.0 - u) + ys[k + 1] * u
        out = jnp.where(x >= xs[k], val, out)
    return out


def apply_lut(x: jnp.ndarray, lut, lut_max: float = 1.0,
              unbounded_slope: float = None) -> jnp.ndarray:
    """In-graph LUT application with linear in-bin interpolation; above
    lut_max extrapolate linearly with the final slope.  NOTE: two per-pixel
    gathers — prefer eval_curve/eval_linear for full-image application."""
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
