"""Blurs: box (integral-image cumsum), Gaussian (separable conv / iterated
box), used by guided filters, toneequal, lowpass, sharpen.

Reference: `/root/reference/src/pixel/box_filters.c` (multi-pass box blurs),
`src/pixel/gaussian.c` (IIR Gaussian).  The IIR recursion is serial per
scanline — hostile to the VPU — so the TPU version uses either a truncated
separable FIR (exact to float precision for moderate sigma) or 3 iterated
box filters via cumulative sums (O(1) per pixel at any radius, and XLA
lowers cumsum to an efficient parallel scan).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


_CS_BLOCK = 256


def blocked_cumsum(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Inclusive prefix sum via block-triangular matmuls.

    XLA lowers a long-axis cumsum to a log-depth chain of ~log2(n)
    full-plane shifted adds — ~13 HBM round-trips for a 45MP plane.
    Here: per-block prefix = one (B, B) triangular matmul on the MXU,
    plus a tiny cumsum of block totals — two plane passes total.
    """
    axis = axis % x.ndim
    n = x.shape[axis]
    B = _CS_BLOCK
    if n <= 2 * B:
        return jnp.cumsum(x, axis=axis)
    nb = -(-n // B)
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, nb * B - n)
    xp = jnp.pad(x, pad)
    shape = list(xp.shape)
    shape[axis : axis + 1] = [nb, B]
    xb = xp.reshape(shape)
    tri = jnp.asarray(np.triu(np.ones((B, B), np.float32)))
    # prefix[..., i] = sum_{j<=i} x[..., j]  ==  x @ triu
    pre = jnp.moveaxis(
        jnp.tensordot(jnp.moveaxis(xb, axis + 1, -1), tri, axes=1),
        -1, axis + 1)
    tot = jax.lax.index_in_dim(pre, B - 1, axis=axis + 1, keepdims=False)
    offs = jnp.cumsum(tot, axis=axis) - tot      # exclusive block offsets
    out = pre + jnp.expand_dims(offs, axis + 1)
    shape2 = list(xp.shape)
    out = out.reshape(shape2)
    return jax.lax.slice_in_dim(out, 0, n, axis=axis)


def box_blur_1d(x: jnp.ndarray, radius: int, axis: int) -> jnp.ndarray:
    """Mean over a (2r+1) window via padded cumsum — O(1)/pixel any radius."""
    if radius <= 0:
        return x
    n = x.shape[axis]
    pad = [(0, 0)] * x.ndim
    pad[axis] = (radius + 1, radius)
    xp = jnp.pad(x, pad, mode="edge")
    cs = blocked_cumsum(xp, axis=axis)
    hi = jax.lax.slice_in_dim(cs, 2 * radius + 1, 2 * radius + 1 + n, axis=axis)
    lo = jax.lax.slice_in_dim(cs, 0, n, axis=axis)
    return (hi - lo) / (2 * radius + 1)


def box_blur(x: jnp.ndarray, radius: int) -> jnp.ndarray:
    if radius <= 0:
        return x
    if radius <= 7 and x.ndim >= 2:
        # small windows: one fused shifted-add pass beats any prefix sum
        from .shifts import sep_filter

        n = 2 * radius + 1
        return sep_filter(x, [1.0 / n] * n)
    return box_blur_1d(box_blur_1d(x, radius, -2), radius, -1)


def gaussian_blur(x: jnp.ndarray, sigma: float, truncate: float = 4.0) -> jnp.ndarray:
    """Separable FIR Gaussian for small sigma (cheaper and closer to a
    true Gaussian there); the reference's Deriche IIR (gaussian_iir,
    src/pixel/gaussian.c) beyond — tail behavior now matches the
    reference at large sigma."""
    if sigma <= 0:
        return x
    if sigma > 4.0:
        return gaussian_iir(x, sigma)
    r = max(1, int(math.ceil(truncate * sigma)))
    t = np.arange(-r, r + 1, dtype=np.float32)
    k = np.exp(-0.5 * (t / sigma) ** 2)
    k /= k.sum()
    from .shifts import sep_filter

    return sep_filter(x, [float(v) for v in k])


def fast_gaussian(x: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """3 iterated box blurs ~ Gaussian (radius from sigma, standard rule);
    preferable for very large sigma (cost independent of radius)."""
    if sigma <= 0:
        return x
    # ideal box width for 3 passes (W. Kaiser / classic derivation)
    wi = math.sqrt(4.0 * sigma * sigma / 3.0 + 1.0)
    r = max(1, int((wi - 1) / 2))
    y = x
    for _ in range(3):
        y = box_blur(y, r)
    return y


def _deriche_coeffs(sigma: float, order: int = 0):
    """compute_gauss_params (src/pixel/gaussian.c:44-96)."""
    alpha = 1.695 / sigma
    ema = math.exp(-alpha)
    ema2 = math.exp(-2.0 * alpha)
    b1, b2 = -2.0 * ema, ema2
    if order == 1:
        a0 = (1.0 - ema) ** 2
        a1, a2, a3 = 0.0, -a0, 0.0
    elif order == 2:
        k = -(ema2 - 1.0) / (2.0 * alpha * ema)
        kn = -2.0 * (-1.0 + 3.0 * ema - 3.0 * ema * ema + ema ** 3)
        kn /= 3.0 * ema + 1.0 + 3.0 * ema * ema + ema ** 3
        a0 = kn
        a1 = -kn * (1.0 + k * alpha) * ema
        a2 = kn * (1.0 - k * alpha) * ema
        a3 = -kn * ema2
    else:
        k = (1.0 - ema) ** 2 / (1.0 + 2.0 * alpha * ema - ema2)
        a0 = k
        a1 = k * (alpha - 1.0) * ema
        a2 = k * (alpha + 1.0) * ema
        a3 = -k * ema2
    coefp = (a0 + a1) / (1.0 + b1 + b2)
    coefn = (a2 + a3) / (1.0 + b1 + b2)
    return a0, a1, a2, a3, b1, b2, coefp, coefn


def _iir_pass(x, f, y_init0, y_init1, b1, b2, axis, reverse):
    """Second-order recurrence y_n = f_n - b1 y_{n-1} - b2 y_{n-2} in
    log-depth: companion-matrix lax.associative_scan (the same TPU trick
    as highlights' inpaint recurrence)."""
    import jax

    # state s = (y_{n-1}, y_{n-2}); per-element affine map s -> A s + v
    # with constant A = [[-b1, -b2], [1, 0]] and v = (f_n, 0)
    n = x.shape[axis]
    shp = [1, 1]
    A = (jnp.full_like(f, -b1), jnp.full_like(f, -b2),
         jnp.ones_like(f), jnp.zeros_like(f))
    v = (f, jnp.zeros_like(f))

    # fold the initial state into the first element (last, if reversed)
    idx = jnp.arange(n)
    first = (idx == (n - 1 if reverse else 0))
    first = jnp.expand_dims(first, tuple(i for i in range(x.ndim)
                                         if i != axis))
    add0 = -b1 * y_init0 - b2 * y_init1
    add1 = y_init0
    v = (v[0] + jnp.where(first, add0, 0.0), jnp.where(first, add1, 0.0))
    A = tuple(jnp.where(first, jnp.asarray(c, x.dtype), a)
              for a, c in zip(A, (0.0, 0.0, 0.0, 0.0)))

    def comb(l, r):
        (la0, la1, la2, la3), (lv0, lv1) = l
        (ra0, ra1, ra2, ra3), (rv0, rv1) = r
        return ((ra0 * la0 + ra1 * la2, ra0 * la1 + ra1 * la3,
                 ra2 * la0 + ra3 * la2, ra2 * la1 + ra3 * la3),
                (ra0 * lv0 + ra1 * lv1 + rv0,
                 ra2 * lv0 + ra3 * lv1 + rv1))

    (_, _, _, _), (y, _) = jax.lax.associative_scan(
        comb, (A, v), axis=axis, reverse=reverse)
    return y


def gaussian_iir(x: jnp.ndarray, sigma: float, order: int = 0,
                 vmin: float = None, vmax: float = None) -> jnp.ndarray:
    """Deriche recursive Gaussian, exact mirror of dt_gaussian_blur
    (src/pixel/gaussian.c:150-320): forward + backward second-order IIR
    along each axis, with the reference's boundary priming (coefp/coefn
    steady-state).  Works on any (..., H, W) array."""
    if sigma <= 0:
        return x
    a0, a1, a2, a3, b1, b2, coefp, coefn = _deriche_coeffs(sigma, order)
    v = x
    if vmin is not None or vmax is not None:
        v = jnp.clip(v, vmin, vmax)

    for axis in (-2, -1):
        n = v.shape[axis]

        def take(arr, sl):
            idx = [slice(None)] * arr.ndim
            idx[axis] = sl
            return arr[tuple(idx)]

        # forward: f_n = a0 x_n + a1 x_{n-1} (x_{-1} = x_0)
        xprev = jnp.concatenate([take(v, slice(0, 1)),
                                 take(v, slice(0, n - 1))], axis=axis)
        f_fwd = a0 * v + a1 * xprev
        x0 = take(v, slice(0, 1))
        yb = coefp * x0
        y1 = _iir_pass(v, f_fwd, yb, yb, b1, b2,
                       axis % v.ndim, reverse=False)

        # backward: f_n = a2 x_{n+1} + a3 x_{n+2}
        xn1 = jnp.concatenate([take(v, slice(1, n)),
                               take(v, slice(n - 1, n))], axis=axis)
        xn2 = jnp.concatenate([take(xn1, slice(1, n)),
                               take(xn1, slice(n - 1, n))], axis=axis)
        f_bwd = a2 * xn1 + a3 * xn2
        xlast = take(v, slice(n - 1, n))
        yn = coefn * xlast
        y2 = _iir_pass(v, f_bwd, yn, yn, b1, b2,
                       axis % v.ndim, reverse=True)
        v = y1 + y2
    return v
