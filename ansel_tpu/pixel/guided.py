"""Guided filter + exposure-independent variant.

Reference: `/root/reference/src/pixel/guided_filter.c` (He et al. guided
filter), `src/pixel/fast_guided_filter.h` (subsampled fast path),
`src/pixel/eigf.h` (exposure-independent guided filter used by toneequal).
All box means come from cumsum box filters -> fully fused XLA.
"""

from __future__ import annotations

import jax.numpy as jnp

from .blur import box_blur


def guided_filter(guide: jnp.ndarray, src: jnp.ndarray, radius: int,
                  eps: float) -> jnp.ndarray:
    """Classic guided filter on (H, W) planes."""
    mean_i = box_blur(guide, radius)
    mean_p = box_blur(src, radius)
    corr_ip = box_blur(guide * src, radius)
    corr_ii = box_blur(guide * guide, radius)
    # clamp: integral-image fp32 cancellation can push var slightly
    # negative; with var >= 0 and eps > 0 the quotient can't blow up
    var_i = jnp.maximum(corr_ii - mean_i * mean_i, 0.0)
    cov_ip = corr_ip - mean_i * mean_p
    a = cov_ip / (var_i + eps)
    b = mean_p - a * mean_i
    return box_blur(a, radius) * guide + box_blur(b, radius)


def fast_guided_filter(guide: jnp.ndarray, src: jnp.ndarray, radius: int,
                       eps: float, scaling: int = 4) -> jnp.ndarray:
    """Subsampled guided filter (reference
    `src/pixel/fast_guided_filter.h:280-344`): compute the (a, b) affine
    surface on a `scaling`-times-downsampled image with radius/scaling,
    then bilinear-upsample (a, b) and apply at full resolution.  The
    surface is low-frequency by construction (box means at radius), so
    the subsampling error is negligible while the box-filter work drops
    by scaling^2 (the reference uses scaling = 4 unconditionally; big
    radii here use 8 since the surface is even smoother)."""
    import jax

    if radius < 4 or scaling <= 1:
        return guided_filter(guide, src, radius, eps)
    s = int(scaling)
    H, W = guide.shape[-2:]
    Hp, Wp = -(-H // s) * s, -(-W // s) * s
    pad = ((0, Hp - H), (0, Wp - W))
    g = jnp.pad(guide, pad, mode="edge")
    p = jnp.pad(src, pad, mode="edge")
    # block-mean downsample (2D strided slices are poison on TPU;
    # a reshape block reduction is one relayout)
    gs = g.reshape(Hp // s, s, Wp // s, s).mean((1, 3))
    ps = p.reshape(Hp // s, s, Wp // s, s).mean((1, 3))
    r = max(1, radius // s)
    mean_i = box_blur(gs, r)
    mean_p = box_blur(ps, r)
    corr_ip = box_blur(gs * ps, r)
    corr_ii = box_blur(gs * gs, r)
    var_i = jnp.maximum(corr_ii - mean_i * mean_i, 0.0)
    cov_ip = corr_ip - mean_i * mean_p
    a = box_blur(cov_ip / (var_i + eps), r)
    b = box_blur(mean_p - (cov_ip / (var_i + eps)) * mean_i, r)
    a_full = jax.image.resize(a, (Hp, Wp), "linear")[..., :H, :W]
    b_full = jax.image.resize(b, (Hp, Wp), "linear")[..., :H, :W]
    return a_full * guide + b_full


def eigf(guide: jnp.ndarray, src: jnp.ndarray, radius: int,
         feathering: float) -> jnp.ndarray:
    """Exposure-independent guided filter (reference src/pixel/eigf.h):
    normalizes the local variance by the local mean squared so the amount of
    smoothing no longer depends on absolute exposure — the core of
    toneequal's luminance mask."""
    mean_g = box_blur(guide, radius)
    mean_s = box_blur(src, radius)
    corr_gg = box_blur(guide * guide, radius)
    corr_gs = box_blur(guide * src, radius)
    var_g = jnp.maximum(corr_gg - mean_g * mean_g, 0.0)
    cov_gs = corr_gs - mean_g * mean_s
    # normalize by mean^2: exposure invariance
    norm = jnp.maximum(mean_g * mean_g, 1e-12)
    a = cov_gs / (var_g + feathering * norm)
    b = mean_s - a * mean_g
    return box_blur(a, radius) * guide + box_blur(b, radius)


def _upsample_node(x, s, axis):
    """Node-aligned integer-factor bilinear upsample on one axis:
    out[q*s + p] = (1 - p/s) * x[q] + (p/s) * x[q+1] (edge-clamped) —
    the exact interpolate_bilinear mapping (fast_guided_filter.h:99-151,
    x_in = x_out * in/out with floor+clamp neighbors) when out = s * in,
    as shifted adds instead of its gather lowering."""
    import jax

    axis = axis % x.ndim
    nxt = jnp.concatenate(
        [jax.lax.slice_in_dim(x, 1, x.shape[axis], axis=axis),
         jax.lax.slice_in_dim(x, x.shape[axis] - 1, x.shape[axis],
                              axis=axis)], axis=axis)
    phases = [(1.0 - p / s) * x + (p / s) * nxt for p in range(s)]
    stacked = jnp.stack(phases, axis=axis + 1)
    shape = list(x.shape)
    shape[axis] *= s
    return stacked.reshape(shape)


def _interp_node(x, out_h, out_w):
    """interpolate_bilinear (fast_guided_filter.h:99-151) on the last two
    axes.  Integer-ratio cases (the production scaling = 4 path) avoid
    gathers entirely: x_in = s * x_out has zero fractional part, so the
    downsample is pure decimation (split single-axis slices — a fused 2D
    strided slice is a 15x-slower strided copy on TPU) and the upsample
    is a phase unroll."""
    import jax

    in_h, in_w = x.shape[-2:]
    if (in_h, in_w) == (out_h, out_w):
        return x
    if (in_h >= out_h and in_w >= out_w
            and in_h % out_h == 0 and in_w % out_w == 0):
        sh, sw = in_h // out_h, in_w // out_w
        if sh > 1:
            x = jax.lax.optimization_barrier(x[..., ::sh, :])
        if sw > 1:
            x = x[..., :, ::sw]
        return x
    if (out_h >= in_h and out_w >= in_w
            and out_h % in_h == 0 and out_w % in_w == 0):
        return _upsample_node(_upsample_node(x, out_h // in_h, -2),
                              out_w // in_w, -1)

    def axis_gather(arr, n_out, axis):
        n_in = arr.shape[axis]
        pos = jnp.arange(n_out, dtype=jnp.float32) * (n_in / n_out)
        prev = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_in - 1)
        nxt = jnp.clip(prev + 1, 0, n_in - 1)
        w_next = jnp.clip(nxt.astype(jnp.float32) - pos, 0.0, 1.0)
        shape = [1] * arr.ndim
        shape[axis] = n_out
        w_next = w_next.reshape(shape)
        a = jnp.take(arr, prev, axis=axis)
        b = jnp.take(arr, nxt, axis=axis)
        return w_next * a + (1.0 - w_next) * b

    x = axis_gather(x, out_h, -2)
    return axis_gather(x, out_w, -1)


def fast_surface_blur(image: jnp.ndarray, radius: int, feathering: float,
                      iterations: int = 1,
                      geomean: bool = False) -> jnp.ndarray:
    """fast_surface_blur (fast_guided_filter.h:269-365), no-quantization
    path (mask = image): guided-filter variance analysis + (a, b) box
    mean at a FIXED 4x downsample; intermediate iterations blend at the
    downsampled size, only the final (a, b) surface is upsampled
    (node-aligned bilinear) and blended at full resolution — geomean
    blending (apply_linear_blending_w_geomean) on the last iteration
    when requested."""
    H, W = image.shape[-2:]
    scaling = 4
    ds_radius = 1 if radius < 4 else int(radius // scaling)
    dh, dw = max(H // scaling, 1), max(W // scaling, 1)
    ds = _interp_node(image, dh, dw)
    ab = None
    for _ in range(iterations):
        mean_i = box_blur(ds, ds_radius)
        corr_ii = box_blur(ds * ds, ds_radius)
        var_i = jnp.maximum(corr_ii - mean_i * mean_i, 0.0)
        a = var_i / (var_i + feathering)
        b = mean_i - a * mean_i
        a = box_blur(a, ds_radius)
        b = box_blur(b, ds_radius)
        ab = (a, b)
        ds = a * ds + b
    a_f = _interp_node(ab[0], H, W)
    b_f = _interp_node(ab[1], H, W)
    lin = a_f * image + b_f
    if geomean:
        return jnp.sqrt(jnp.maximum(image * lin, 0.0))
    return lin


def eigf_surface_blur(image: jnp.ndarray, sigma: float, feathering: float,
                      iterations: int = 1,
                      geomean: bool = False) -> jnp.ndarray:
    """fast_eigf_surface_blur (eigf.h:262-336), no-mask path: per
    iteration, bilinear-downsample by scaling = clamp(sigma, 1, 4),
    Deriche-gaussian average/variance analysis at ds_sigma =
    max(sigma/scaling, 1) (eigf_variance_analysis_no_mask), upsample the
    (avg, var) surfaces, and blend per-pixel at full resolution with the
    exposure-normalized gain a = nvar / (nvar + feathering), nvar =
    var / max(avg * pixel, 1e-6), b = avg - a * avg
    (eigf_blending_no_mask) — NO spatial smoothing of a/b (the
    reference removed it to kill bright halos; eigf.h:54-62).  Geomean
    blending on the last iteration only."""
    from .blur import gaussian_iir

    H, W = image.shape[-2:]
    scaling = min(max(float(sigma), 1.0), 4.0)
    ds_sigma = max(float(sigma) / scaling, 1.0)
    dh, dw = max(int(H / scaling), 1), max(int(W / scaling), 1)
    img = image
    for i in range(iterations):
        ds = _interp_node(img, dh, dw)
        pair = jnp.stack([ds, ds * ds])
        blurred = gaussian_iir(pair, ds_sigma)
        avg = blurred[0]
        var = jnp.maximum(blurred[1] - avg * avg, 0.0)
        avg_f = _interp_node(avg, H, W)
        var_f = _interp_node(var, H, W)
        norm = jnp.maximum(avg_f * img, 1e-6)
        nvar = var_f / norm
        a = nvar / (nvar + feathering)
        b = avg_f - a * avg_f
        lin = jnp.maximum(img * a + b, 1.17549435e-38)
        if geomean and i == iterations - 1:
            img = jnp.sqrt(jnp.maximum(img * lin, 1.17549435e-38))
        else:
            img = lin
    return img
