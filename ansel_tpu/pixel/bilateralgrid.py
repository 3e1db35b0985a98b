"""Bilateral grid — TPU-native replacement for the reference's grid/lattice
edge-aware smoothers.

Reference analogs:
  * `/root/reference/src/pixel/bilateral.c` (dt_bilateral_t: dense 3-D
    (x, y, L) grid — splat / 5-tap blur / trilinear slice) used by
    monochrome, shadhi, lowpass, colisa, bilat.
  * `/root/reference/src/iop/bilateral.cc` (5-D permutohedral lattice) —
    approximated here channel-by-channel (each channel guided by itself),
    a documented deviation: the permutohedral version couples the RGB
    range distance, this one stops smoothing per channel independently.

TPU design: scatters (splat) are poison on TPU, so the grid is built by
range-bin decomposition (Durand-Dorsey 2002 = the same linear filter bank
the grid discretizes): for each of D range bins, a triangle (linear-splat)
weight plane is pooled to grid resolution (reshape-mean, no conv), the
(D, gh, gw) grid is blurred with the reference's 5-tap kernel per axis,
and slicing is D bilinear upsamples (separable matmuls on the MXU)
accumulated with the same triangle weights.  Everything is pool / matmul /
elementwise — no gathers, no scatters, fuses cleanly under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# test hook: run the Pallas slice in interpret mode on CPU
_FORCE_PALLAS_INTERPRET = False


def _pool2d(x: jnp.ndarray, sy: int, sx: int) -> jnp.ndarray:
    """Average-pool (..., H, W) by integer strides via reshape (H, W must be
    pre-padded to multiples)."""
    *lead, h, w = x.shape
    x = x.reshape(*lead, h // sy, sy, w // sx, sx)
    return x.mean(axis=(-3, -1))


def _shift_clamped(g: jnp.ndarray, d: int, axis: int) -> jnp.ndarray:
    """g[k+d] along `axis`, edge-clamped (grid-resolution slices: cheap)."""
    n = g.shape[axis]

    def sl(a, b):
        s = [slice(None)] * g.ndim
        s[axis] = slice(a, b)
        return g[tuple(s)]

    if d == 0:
        return g
    if d > 0:
        body, edge = sl(d, n), sl(n - 1, n)
        reps = [1] * g.ndim
        reps[axis] = d
        return jnp.concatenate([body, jnp.tile(edge, reps)], axis=axis)
    body, edge = sl(0, n + d), sl(0, 1)
    reps = [1] * g.ndim
    reps[axis] = -d
    return jnp.concatenate([jnp.tile(edge, reps), body], axis=axis)


def _upsample_matrix(n_out: int, n_in: int, ss: int) -> np.ndarray:
    """(n_out, n_in) cell-centered bilinear matrix (small-grid path)."""
    pos = (np.arange(n_out) + 0.5) / ss - 0.5
    i0 = np.clip(np.floor(pos), 0, n_in - 1).astype(int)
    i1 = np.clip(i0 + 1, 0, n_in - 1)
    f = np.clip(pos - i0, 0.0, 1.0)
    M = np.zeros((n_out, n_in), np.float32)
    M[np.arange(n_out), i0] += 1.0 - f
    M[np.arange(n_out), i1] += f
    return M


def upsample_axis(g: jnp.ndarray, ss: int, axis: int) -> jnp.ndarray:
    """Cell-centered bilinear upsample by integer factor `ss` along `axis`
    (n -> n*ss) with NO per-pixel weights: each of the ss phases has a
    constant (i0-offset, frac), so the result is two shifted-add blends at
    grid resolution interleaved back via stack+reshape.  Replaces the
    dense (n_out, n_in) interp matrix — which at sigma_s ~ 1 degenerated
    to an n_out^2 inline constant (hundreds of MB of MLIR).  For LARGE
    ss the phase unroll is the compile hog instead (ss terms per axis)
    while the grid is small, so a dense (n*ss, n) matmul wins there."""
    if ss == 1:
        return g
    axis = axis % g.ndim
    if ss > 16:
        n_in = g.shape[axis]
        M = jnp.asarray(_upsample_matrix(n_in * ss, n_in, ss))
        moved = jnp.moveaxis(g, axis, -1)
        return jnp.moveaxis(
            jnp.tensordot(moved, M, axes=((-1,), (1,)),
                          precision=jax.lax.Precision.HIGHEST), -1, axis)
    pos = (np.arange(ss) + 0.5) / ss - 0.5
    i0 = np.floor(pos).astype(int)          # -1 or 0
    f = (pos - i0).astype(np.float32)
    gm1 = _shift_clamped(g, -1, axis)
    gp1 = _shift_clamped(g, +1, axis)
    phases = []
    for r in range(ss):
        if i0[r] < 0:
            phases.append((1.0 - f[r]) * gm1 + f[r] * g)
        else:
            phases.append((1.0 - f[r]) * g + f[r] * gp1)
    st = jnp.stack(phases, axis=axis + 1)   # (..., n, ss, ...)
    shape = list(g.shape)
    shape[axis] = g.shape[axis] * ss
    return st.reshape(shape)


def _blur_axis(g: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Reference 5-tap grid blur [1,4,6,4,1]/16 (bilateral.c blur pass)."""
    taps = (1 / 16, 4 / 16, 6 / 16, 4 / 16, 1 / 16)
    n = g.shape[axis]
    pad = [(0, 0)] * g.ndim
    pad[axis] = (2, 2)
    gp = jnp.pad(g, pad, mode="edge")
    out = None
    for i, t in enumerate(taps):
        sl = [slice(None)] * g.ndim
        sl[axis] = slice(i, i + n)
        c = t * gp[tuple(sl)]
        out = c if out is None else out + c
    return out


def grid_filter(guide: jnp.ndarray, values: jnp.ndarray, sigma_s: float,
                sigma_r: float, lo: float, hi: float,
                detail: float = None) -> jnp.ndarray:
    """Edge-aware smooth `values` (C, H, W) guided by `guide` (H, W).

    sigma_s: spatial cell size in pixels; sigma_r: range cell size in guide
    units; [lo, hi]: guide range.  With detail != None, implements the
    reference's dt_bilateral_slice_to_output detail-boost slicing used by
    `bilat` mode 1 (out = in + detail * (in - base)).

    MXU formulation: the image is blocked into ss x ss cells; splat is ONE
    batched contraction einsum('npk,ncp->nkc') of per-pixel triangle
    weights F (2 nonzero bins per pixel) against the cell's values — no
    per-bin full-plane passes (the old range-bin lax.map cost 227 ms at
    24MP/D=32 on a v5e chip; this runs in ~18 ms).  Slicing reuses the
    same cells: out = sum_ij w_ij * (F @ G[:, cell+ij]) over the 4
    bilinear grid corners — 4 small einsums instead of a D-step scan."""
    H, W = guide.shape
    C = values.shape[0]
    ss = max(int(round(sigma_s)), 1)
    D = int(np.clip(round((hi - lo) / max(sigma_r, 1e-6)) + 1, 4, 32))
    step = (hi - lo) / (D - 1)

    # pad to pool-able size
    ph = (-H) % ss
    pw = (-W) % ss
    gp = jnp.pad(jnp.clip(guide, lo, hi), ((0, ph), (0, pw)), mode="edge")
    vp = jnp.pad(values, ((0, 0), (0, ph), (0, pw)), mode="edge")
    Hp, Wp = H + ph, W + pw
    gh, gw = Hp // ss, Wp // ss
    n_cells, p_cell = gh * gw, ss * ss

    def cells(x):
        return x.reshape(gh, ss, gw, ss).transpose(0, 2, 1, 3) \
                .reshape(n_cells, p_cell)

    z = (gp - lo) / step                       # in [0, D-1]
    b0 = jnp.floor(z)
    f = z - b0
    b0c = cells(b0)
    fc = cells(f)
    kk = jnp.arange(D, dtype=jnp.float32)[None, None, :]
    # triangle (linear-splat) weights, 2 nonzero bins per pixel.  Kept in
    # bf16: Fm is the traffic giant ((n_cells, ss^2, D) ≈ 3 GB fp32 at
    # 24MP/ss=15/D=32) and both contractions ride the MXU, so halving its
    # bytes halves the op's HBM time; the ≤2^-9 relative weight error is
    # noise against the grid's own ss/D discretization.
    Fm = (jnp.equal(b0c[..., None], kk) * (1.0 - fc[..., None])
          + jnp.equal(b0c[..., None], kk - 1.0) * fc[..., None]
          ).astype(jnp.bfloat16)                                  # (n,p,D)
    vc = jnp.stack([cells(vp[c]) for c in range(C)], axis=1)      # (n,C,p)
    nums = jnp.einsum("npk,ncp->nkc", Fm, vc.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
    dens = Fm.astype(jnp.float32).sum(axis=1)                     # (n,D)
    nums = nums.reshape(gh, gw, D, C).transpose(2, 3, 0, 1) / p_cell
    dens = dens.reshape(gh, gw, D).transpose(2, 0, 1) / p_cell

    # grid blur: space (2 axes) + range, reference 5-tap / [1,2,1]
    for ax in (-2, -1):
        nums = _blur_axis(nums, ax)
        dens = _blur_axis(dens, ax)
    nums = _blur_axis(nums, 0)
    dens = _blur_axis(dens, 0)
    base_grid = nums / jnp.maximum(dens[:, None], 1e-8)  # (D, C, gh, gw)

    # ---- slice ----
    # TPU: one Pallas kernel (kernels/bgrid_pallas) — the grid slab per
    # tile lives in VMEM, the bin contraction and row interpolation run
    # register-resident (measured: the XLA form below lost an order of
    # magnitude to layout transposes + lax.map serialization).
    if jax.default_backend() == "tpu" or _FORCE_PALLAS_INTERPRET:
        from ..kernels.bgrid_pallas import slice_grid

        out = slice_grid(base_grid, z, ss,
                         interpret=_FORCE_PALLAS_INTERPRET)[:, :H, :W]
        if detail is not None:
            return values[:, :H, :W] + detail * (values[:, :H, :W] - out)
        return out

    # ---- XLA slice fallback (CPU): separable factorization (exactly
    # the same math as a per-(oy,ox)-shift einsum against Fm, but that
    # form reads the Fm-sized tensor up to NINE times — measured
    # HBM-bound at ~540 GB/s, 25 ms/channel at 24MP).  Both the spatial
    # bilinear and the range triangle are linear, so: upsample the grid
    # to pixel rows (cell-centered bilinear, upsample_axis — identical
    # weights), then per row-block upsample columns and contract the bin
    # axis with TWO take_along_axis taps ((1-f)·G[b0] + f·G[b0+1]) — the
    # triangle has exactly two nonzero bins per pixel.  Row blocks
    # under lax.map keep the (D, C, blk, W) buffer bounded instead of
    # materializing the (D, C, H, W) 3 GB upsample.
    Gy = upsample_axis(base_grid, ss, axis=2)          # (D, C, Hp, gw)
    blk = 256
    nb = -(-Hp // blk)
    pad_rows = nb * blk - Hp
    Gy = jnp.pad(Gy, ((0, 0), (0, 0), (0, pad_rows), (0, 0)),
                 mode="edge")
    zb = jnp.pad(z, ((0, pad_rows), (0, 0)), mode="edge")
    Gy_b = Gy.reshape(D, C, nb, blk, gw).transpose(2, 0, 1, 3, 4)
    z_b = zb.reshape(nb, blk, Wp)

    def one_block(args):
        gyb, zblk = args                   # (D, C, blk, gw), (blk, Wp)
        B = upsample_axis(gyb, ss, axis=3)             # (D, C, blk, Wp)
        b0b = jnp.clip(jnp.floor(zblk), 0, D - 1)
        fb = zblk - b0b                                # (blk, Wp)
        # bin contraction as an unrolled masked-select sum — gathers
        # (take_along_axis) along the bin axis measured 14x SLOWER on
        # TPU than this D-step select chain
        w0 = 1.0 - fb
        acc = jnp.zeros((C,) + zblk.shape, jnp.float32)
        for k in range(D):
            sel0 = (b0b == k).astype(jnp.float32) * w0
            sel1 = (b0b == k - 1).astype(jnp.float32) * fb
            acc = acc + (sel0 + sel1)[None] * B[k]
        return acc                                     # (C, blk, Wp)

    out = jax.lax.map(one_block, (Gy_b, z_b))          # (nb, C, blk, Wp)
    out = out.transpose(1, 0, 2, 3).reshape(C, nb * blk, Wp)[:, :H, :W]
    if detail is not None:
        return values[:, :H, :W] + detail * (values[:, :H, :W] - out)
    return out


def bilateral_self(x: jnp.ndarray, sigma_s: float, sigma_r: float,
                   lo: float = 0.0, hi: float = 1.0) -> jnp.ndarray:
    """Per-channel self-guided bilateral of (C, H, W) — the channelwise
    approximation of iop/bilateral.cc's 5-D permutohedral filter."""
    return jnp.stack([
        grid_filter(x[c], x[c:c + 1], sigma_s, sigma_r, lo, hi)[0]
        for c in range(x.shape[0])])
