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
    # prefix[..., i] = sum_{j<=i} x[..., j]  ==  x @ triu.
    # HIGHEST precision is load-bearing: the MXU's default bf16 passes
    # give ~0.4% error on the prefix sums, which integral-image windowed
    # differences amplify into hugely negative variances downstream
    # (guided_filter var = E[x^2]-E[x]^2 -> inf -> NaN); seen as the
    # config-6 colormapping NaN plague on real TPU.
    pre = jnp.moveaxis(
        jnp.tensordot(jnp.moveaxis(xb, axis + 1, -1), tri, axes=1,
                      precision=jax.lax.Precision.HIGHEST),
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


def gaussian_blur_fast(x: jnp.ndarray, sigma: float,
                       max_ds: int = 8) -> jnp.ndarray:
    """Large-sigma Gaussian via block-mean downsample -> IIR Gaussian at
    sigma/ds -> bilinear upsample.  For sigma >> ds the pre-average is
    absorbed into the Gaussian (variance ds^2/12 <= sigma^2/3 % error),
    so the result matches gaussian_blur while the scan work drops by
    ds^2.  The same trade the reference makes structurally with
    fast_guided_filter.h and its downscaled preview pipes."""
    import jax

    if sigma < 16.0:
        return gaussian_blur(x, sigma)
    ds = int(min(max_ds, sigma // 8))
    H, W = x.shape[-2:]
    Hp, Wp = -(-H // ds) * ds, -(-W // ds) * ds
    pad = [(0, 0)] * (x.ndim - 2) + [(0, Hp - H), (0, Wp - W)]
    xp = jnp.pad(x, pad, mode="edge")
    lead = xp.shape[:-2]
    small = xp.reshape(*lead, Hp // ds, ds, Wp // ds, ds).mean((-3, -1))
    # de-convolve the block mean's variance from the target
    sig_ds = math.sqrt(max(sigma * sigma - ds * ds / 12.0, 1e-6)) / ds
    small = gaussian_blur(small, sig_ds)
    # cell-centered bilinear upsample via static phase unroll — the
    # SAME weights jax.image.resize("linear") uses for an integer
    # factor, but as shifted adds instead of its gather lowering
    # (measured ~9 ms/plane at 24MP on a v5e chip for the gather form)
    from .bilateralgrid import upsample_axis

    out = upsample_axis(upsample_axis(small, ds, axis=-2), ds, axis=-1)
    return out[..., :H, :W]


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


# block length for the block-parallel IIR: larger blocks mean fewer
# lax.scan steps (the scan's per-step latency dominated the round-5
# profile: a 3-channel sigma=8 blur spent 44 ms, mostly in 47-step
# scans) at the cost of a bigger triangular-Toeplitz matmul — MXU work
# that is nearly free by comparison.
_IIR_BLOCK = 512


def _iir_pass(x, f, y_init0, y_init1, b1, b2, axis, reverse):
    """Second-order recurrence y_n = f_n - b1 y_{n-1} - b2 y_{n-2},
    block-parallel: within a K-block the zero-state solution is one
    lower-triangular-Toeplitz matmul (impulse response c_j, MXU work),
    block-entry states propagate through a tiny lax.scan over n/K
    2-vectors, and the entry state's contribution is the two
    host-precomputed homogeneous sequences.  Replaces a full-length
    companion-matrix associative_scan whose log-depth 2x2 ladder cost
    ~60s of XLA compile per pass at 24MP."""
    import jax

    K = _IIR_BLOCK
    n = f.shape[axis]
    axis = axis % f.ndim

    # impulse response c_j and homogeneous solutions u_j (y_-1=1),
    # w_j (y_-2=1) of the AR part, host-side
    c = np.zeros(K, np.float64)
    u = np.zeros(K + 2, np.float64)
    w = np.zeros(K + 2, np.float64)
    c[0] = 1.0
    if K > 1:
        c[1] = -b1
    for j in range(2, K):
        c[j] = -b1 * c[j - 1] - b2 * c[j - 2]
    u[0], u[1] = 0.0, 1.0   # u[j+2] = y_j with y_-1=1, y_-2=0
    w[0], w[1] = 1.0, 0.0
    for j in range(2, K + 2):
        u[j] = -b1 * u[j - 1] - b2 * u[j - 2]
        w[j] = -b1 * w[j - 1] - b2 * w[j - 2]
    u, w = u[2:], w[2:]
    T = np.zeros((K, K), np.float32)
    for i in range(K):
        T[i, : i + 1] = c[: i + 1][::-1]
    M = np.float32([[u[K - 1], w[K - 1]], [u[K - 2], w[K - 2]]])
    uj = jnp.asarray(u.astype(np.float32))
    wj = jnp.asarray(w.astype(np.float32))
    Tm = jnp.asarray(T)

    fm = jnp.moveaxis(f, axis, -1)
    if reverse:
        fm = jnp.flip(fm, -1)
    nb = -(-n // K)
    pad = nb * K - n
    if pad:
        fm = jnp.pad(fm, [(0, 0)] * (fm.ndim - 1) + [(0, pad)])
    fb = fm.reshape(fm.shape[:-1] + (nb, K))
    # zero-state within-block outputs: one triangular-Toeplitz matmul
    ylocal = jnp.einsum("ik,...bk->...bi", Tm, fb,
                        preferred_element_type=jnp.float32)
    d = ylocal[..., -2:][..., ::-1]            # (y_{K-1}, y_{K-2})

    i0 = jnp.moveaxis(y_init0, axis, -1)[..., 0]
    i1 = jnp.moveaxis(y_init1, axis, -1)[..., 0]
    s_init = jnp.stack([i0, i1], axis=-1)      # (..., 2)

    def step(s, dm):
        s_next = jnp.einsum("ij,...j->...i", M, s) + dm
        return s_next, s                        # emit ENTRY state

    dmoved = jnp.moveaxis(d, -2, 0)            # (nb, ..., 2)
    _, entries = jax.lax.scan(step, s_init, dmoved)
    entries = jnp.moveaxis(entries, 0, -2)     # (..., nb, 2)

    y = (ylocal + uj * entries[..., 0:1] + wj * entries[..., 1:2])
    y = y.reshape(fm.shape[:-1] + (nb * K,))[..., :n]
    if reverse:
        y = jnp.flip(y, -1)
    return jnp.moveaxis(y, -1, axis)


def _iir_axis_dual(v, f_fwd, f_bwd, yb, yn, b1, b2, axis):
    """Forward + backward recurrences of ONE axis in one blocked pass,
    blocked NATIVELY on that axis: no transposes and no flips (each was
    a full HBM round-trip at 24MP — the r5 component profile measured
    every such pass at ~1.5 ms of pure memory traffic).

    The backward recurrence runs in forward memory order through the
    mirrored Toeplitz (T_rev[i, j] = c[j - i], upper-triangular) and
    mirrored homogeneous sequences (u_rev[k] = u[K-1-k]); its entry
    states propagate through a `reverse=True` scan with the SAME 2x2
    companion M.  The right pad feeds the backward stream its
    steady-state drive f = yn (1 + b1 + b2), so the carry entering the
    real data is exactly the primed (yn, yn)."""
    import jax

    K = _IIR_BLOCK
    axis = axis % f_fwd.ndim
    n = f_fwd.shape[axis]

    c = np.zeros(K, np.float64)
    u = np.zeros(K + 2, np.float64)
    w = np.zeros(K + 2, np.float64)
    c[0] = 1.0
    if K > 1:
        c[1] = -b1
    for j in range(2, K):
        c[j] = -b1 * c[j - 1] - b2 * c[j - 2]
    u[0], u[1] = 0.0, 1.0
    w[0], w[1] = 1.0, 0.0
    for j in range(2, K + 2):
        u[j] = -b1 * u[j - 1] - b2 * u[j - 2]
        w[j] = -b1 * w[j - 1] - b2 * w[j - 2]
    u, w = u[2:], w[2:]
    T = np.zeros((K, K), np.float32)
    for i in range(K):
        T[i, : i + 1] = c[: i + 1][::-1]
    T_rev = T[::-1, ::-1].copy()               # T_rev[i, j] = c[j - i]
    M_ = jnp.asarray(np.float32([[u[K - 1], w[K - 1]],
                                 [u[K - 2], w[K - 2]]]))
    Ts = jnp.asarray(np.stack([T, T_rev]))
    uf = jnp.asarray(u.astype(np.float32))
    wf = jnp.asarray(w.astype(np.float32))
    ub = jnp.asarray(u[::-1].astype(np.float32))
    wb = jnp.asarray(w[::-1].astype(np.float32))

    nb = -(-n // K)
    pad = nb * K - n

    def pad_axis(f, value):
        if not pad:
            return f
        shape = list(f.shape)
        shape[axis] = pad
        tail = (jnp.zeros(shape, f.dtype) if value is None
                else jnp.broadcast_to(value, shape))
        return jnp.concatenate([f, tail], axis=axis)

    # steady-state drive for the backward stream's pad region
    steady = yn * np.float32(1.0 + b1 + b2)
    f_bwd_p = pad_axis(f_bwd, steady)
    f_fwd_p = pad_axis(f_fwd, None)

    def blocks(f):
        shape = list(f.shape)
        shape[axis:axis + 1] = [nb, K]
        return f.reshape(shape)

    fb = jnp.stack([blocks(f_fwd_p), blocks(f_bwd_p)])
    # per-stream block axes: nb at `axis`, K at `axis + 1`; the stacked
    # frame shifts both by one
    ba0, ka0 = axis, axis + 1
    sub_in = list("abcdefg"[: fb.ndim])
    sub_in[ka0 + 1] = "k"
    sub_out = list(sub_in)
    sub_out[ka0 + 1] = "i"
    sub_in[0] = sub_out[0] = "s"
    eq = f"sik,{''.join(sub_in)}->{''.join(sub_out)}"
    ylocal = jnp.einsum(eq, Ts, fb, preferred_element_type=jnp.float32)

    def take_k(arr, idx):
        sl = [slice(None)] * arr.ndim
        sl[ka0] = idx
        return arr[tuple(sl)]

    # forward entries read (y_{K-1}, y_{K-2}) of the previous block;
    # backward entries read (y_0, y_1) of the next block
    d_f = jnp.stack([take_k(ylocal[0], K - 1), take_k(ylocal[0], K - 2)],
                    axis=-1)
    d_b = jnp.stack([take_k(ylocal[1], 0), take_k(ylocal[1], 1)],
                    axis=-1)

    def init(y0):
        i0 = jnp.take(y0, jnp.zeros(1, jnp.int32), axis=axis)
        i0 = jnp.squeeze(i0, axis=axis)
        return jnp.stack([i0, i0], axis=-1)

    def run_scan(d, s0, reverse):
        dm = jnp.moveaxis(d, ba0, 0)  # block axis -> leading
        def step(s, x_):
            return jnp.einsum("ij,...j->...i", M_, s) + x_, s
        # nb is ~8-12: fully unrolled, the scan's ~0.2 ms/step TPU
        # bookkeeping (dynamic-update-slice per iteration) vanishes
        _, entries = jax.lax.scan(step, s0, dm, reverse=reverse,
                                  unroll=True)
        return jnp.moveaxis(entries, 0, ba0)

    e_f = run_scan(d_f, init(yb), False)
    e_b = run_scan(d_b, init(yn), True)

    def kvec(vec, arr):
        shape = [1] * arr.ndim
        shape[ka0] = K
        return vec.reshape(shape)

    ent_f0 = jnp.expand_dims(e_f[..., 0], ka0)
    ent_f1 = jnp.expand_dims(e_f[..., 1], ka0)
    ent_b0 = jnp.expand_dims(e_b[..., 0], ka0)
    ent_b1 = jnp.expand_dims(e_b[..., 1], ka0)
    y = (ylocal[0] + kvec(uf, ylocal[0]) * ent_f0
         + kvec(wf, ylocal[0]) * ent_f1
         + ylocal[1] + kvec(ub, ylocal[1]) * ent_b0
         + kvec(wb, ylocal[1]) * ent_b1)

    shape = list(y.shape)
    shape[ba0:ka0 + 1] = [nb * K]
    y = y.reshape(shape)
    sl = [slice(None)] * y.ndim
    sl[axis] = slice(0, n)
    return y[tuple(sl)]


def gaussian_iir(x: jnp.ndarray, sigma: float, order: int = 0,
                 vmin: float = None, vmax: float = None) -> jnp.ndarray:
    """Deriche recursive Gaussian, exact mirror of dt_gaussian_blur
    (src/pixel/gaussian.c:150-320): forward + backward second-order IIR
    along each axis, with the reference's boundary priming (coefp/coefn
    steady-state).  Works on any (..., H, W) array.

    On TPU, big planes route to the Pallas dual-direction kernel
    (kernels/iir_pallas): ~2x the XLA block form at 24MP, and its pure
    sequential VPU f32 arithmetic is the closer match to the C
    reference (the XLA form's MXU einsum carries bf16x3 rounding that
    the sigma-8 feedback gain amplifies to ~1e-3 absolute — still under
    the display quantum, but the kernel removes it)."""
    if sigma <= 0:
        return x
    import jax as _jax

    if (_jax.default_backend() == "tpu" and x.ndim in (2, 3)
            and x.dtype == jnp.float32
            and x.shape[-2] * x.shape[-1] >= (1 << 20)):
        from ..kernels.iir_pallas import gaussian_iir_pallas

        return gaussian_iir_pallas(x, sigma, order=order,
                                   vmin=vmin, vmax=vmax)
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

        # backward: f_n = a2 x_{n+1} + a3 x_{n+2}
        xn1 = jnp.concatenate([take(v, slice(1, n)),
                               take(v, slice(n - 1, n))], axis=axis)
        xn2 = jnp.concatenate([take(xn1, slice(1, n)),
                               take(xn1, slice(n - 1, n))], axis=axis)
        f_bwd = a2 * xn1 + a3 * xn2
        xlast = take(v, slice(n - 1, n))
        yn = coefn * xlast

        v = _iir_axis_dual(v, f_fwd, f_bwd, yb, yn, b1, b2,
                           axis % v.ndim)
    return v
