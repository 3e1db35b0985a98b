"""Generic bilinear image warp as a Pallas TPU kernel.

Reference behavior: the reference's warping modules (lens.cc interpolation
via lf_modifier ApplySubpixelGeometryDistortion + dt_interpolation,
`src/common/interpolation.c:312` bilinear path) resample src(y,x) at
per-pixel source coordinates.  A direct XLA gather runs at ~12-21
ns/element on TPU (serial gather unit); this kernel reaches VPU speed by
decomposing the warp into two axis-aligned resampling passes built from
`tpu.dynamic_gather` (within-vreg gathers: 8 sublanes / 128 lanes) over
statically-sliced candidate windows.

Two-pass exactness (the Catmull-Smith "bottleneck problem"): the vertical
pass samples A[r, c'] = img[syx[r, c'], c'], the horizontal pass
out[r, c] = A[r, sx[r, c]].  For out == img[sy(r,c), sx(r,c)] the caller
must supply syx[r, c'] = sy(r, hx(r, c')) where hx is the row-wise inverse
of sx (sx(r, hx(r, c')) = c').  `warp_model()` computes hx by fixed-point
iteration (converges for |d sx/dx - 1| < 1: every optical warp here);
`syx = sy` directly is a fine approximation when |d sy/dx| is small.

Bounds: |syx - r| < pad_y - 1 and |sx - c| < pad_x - 1 must hold (caller
clamps); pad_y/pad_x are static (multiple of 8 / 128), and the kernel cost
is linear in pad_y/8 + pad_x/128 — keep the bounds tight.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 64
TILE_W = 512


def _round_up(v, m):
    return -(-int(v) // m) * m


def _vgather8(src8, idx, acc0, acc1):
    """Accumulate rows idx and idx+1 of an 8-row source into acc0/acc1."""
    m0 = (idx >= 0) & (idx < 8)
    g0 = jnp.take_along_axis(src8, jnp.clip(idx, 0, 7), axis=0)
    acc0 = jnp.where(m0, g0, acc0)
    i1 = idx + 1
    m1 = (i1 >= 0) & (i1 < 8)
    g1 = jnp.take_along_axis(src8, jnp.clip(i1, 0, 7), axis=0)
    acc1 = jnp.where(m1, g1, acc1)
    return acc0, acc1


def _kernel(img_ref, syx_ref, sx_ref, out_ref, win, syx_win, sem,
            *, pad_y, pad_x, cc, wh, ww):
    ch = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    cidx = 0 if cc == 1 else ch
    cp1 = pltpu.make_async_copy(
        img_ref.at[ch, pl.ds(i * TILE_H, wh), pl.ds(j * TILE_W, ww)],
        win, sem)
    cp1.start()
    cp2 = pltpu.make_async_copy(
        syx_ref.at[cidx, pl.ds(i * TILE_H, TILE_H),
                   pl.ds(j * TILE_W, ww)],
        syx_win, sem)
    cp1.wait()
    cp2.start()
    cp2.wait()

    # ---- vertical pass: A[r, c'] = img[syx[r, c'], c'] (bilinear) ----
    vi = syx_win[:] + (pad_y - i * TILE_H)
    vi = jnp.clip(vi, 0.0, wh - 1.001)
    vfl = jnp.floor(vi)
    fy = vi - vfl
    vfl = vfl.astype(jnp.int32)
    n_k = 2 * pad_y // 8 + 1
    a_parts = []
    for g in range(TILE_H // 8):
        vfl_g = vfl[8 * g:8 * g + 8]
        acc0 = jnp.zeros((8, ww), win.dtype)
        acc1 = acc0
        for k in range(n_k):
            src8 = win[8 * (g + k):8 * (g + k) + 8, :]
            acc0, acc1 = _vgather8(src8, vfl_g - 8 * (g + k), acc0, acc1)
        fy_g = fy[8 * g:8 * g + 8]
        a_parts.append(acc0 * (1.0 - fy_g) + acc1 * fy_g)
    a = jnp.concatenate(a_parts, axis=0)

    # ---- horizontal pass: out[r, c] = A[r, sx[r, c]] (bilinear) ----
    hi = sx_ref[0] + (pad_x - j * TILE_W)
    hi = jnp.clip(hi, 0.0, ww - 1.001)
    hfl = jnp.floor(hi)
    fx = hi - hfl
    hfl = hfl.astype(jnp.int32)
    n_m = 2 * pad_x // 128 + 1
    o_parts = []
    for gc in range(TILE_W // 128):
        hfl_gc = hfl[:, 128 * gc:128 * gc + 128]
        acc0 = jnp.zeros((TILE_H, 128), win.dtype)
        acc1 = acc0
        for m in range(n_m):
            src = a[:, 128 * (gc + m):128 * (gc + m) + 128]
            idx = hfl_gc - 128 * (gc + m)
            m0 = (idx >= 0) & (idx < 128)
            g0 = jnp.take_along_axis(src, jnp.clip(idx, 0, 127), axis=1)
            acc0 = jnp.where(m0, g0, acc0)
            i1 = idx + 1
            m1 = (i1 >= 0) & (i1 < 128)
            g1 = jnp.take_along_axis(src, jnp.clip(i1, 0, 127), axis=1)
            acc1 = jnp.where(m1, g1, acc1)
        fx_gc = fx[:, 128 * gc:128 * gc + 128]
        o_parts.append(acc0 * (1.0 - fx_gc) + acc1 * fx_gc)
    out_ref[0] = jnp.concatenate(o_parts, axis=1)


@functools.partial(jax.jit,
                   static_argnames=("pad_y", "pad_x", "interpret",
                                    "src_prepadded"))
def warp_bilinear(img, syx, sx, pad_y: int, pad_x: int,
                  interpret: bool = False, src_prepadded: bool = False):
    """Two-pass bilinear warp.

    img: (C, H, W) float32 — or, with src_prepadded=True,
         (C, H + 2*pad_y, W + 2*pad_x) whose halo carries REAL source
         data (cross-grid warps: the output grid is a window of a
         larger source, see ops/_warpcommon).
    syx: (Cc, H, W + 2*pad_x) source ROW per (output row, source column),
         bottleneck-corrected (see module docstring); Cc in {1, C}.
    sx:  (Cc, H, W) source COLUMN per output pixel.
    pad_y/pad_x: static displacement bounds, multiples of 8 / 128.
    """
    cc, h, w = sx.shape
    c = img.shape[0]
    nh, nw = -(-h // TILE_H), -(-w // TILE_W)
    hp, wp = nh * TILE_H, nw * TILE_W
    wh, ww = TILE_H + 2 * pad_y, TILE_W + 2 * pad_x

    if src_prepadded:
        imgp = jnp.pad(img, ((0, 0), (0, hp - h), (0, wp - w)),
                       mode="edge")
    else:
        imgp = jnp.pad(img, ((0, 0), (pad_y, pad_y + hp - h),
                             (pad_x, pad_x + wp - w)), mode="edge")
    syxp = jnp.pad(syx, ((0, 0), (0, hp - h), (0, wp - w)), mode="edge")
    sxp = jnp.pad(sx, ((0, 0), (0, hp - h), (0, wp - w)), mode="edge")

    kern = functools.partial(_kernel, pad_y=pad_y, pad_x=pad_x, cc=cc,
                             wh=wh, ww=ww)
    out = pl.pallas_call(
        kern,
        grid=(c, nh, nw),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((1, TILE_H, TILE_W),
                               lambda ch, i, j: (0 if cc == 1 else ch,
                                                 i, j))],
        out_specs=pl.BlockSpec((1, TILE_H, TILE_W),
                               lambda ch, i, j: (ch, i, j)),
        out_shape=jax.ShapeDtypeStruct((c, hp, wp), img.dtype),
        scratch_shapes=[
            pltpu.VMEM((wh, ww), img.dtype),
            pltpu.VMEM((TILE_H, ww), img.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(imgp, syxp, sxp)
    return out[:, :h, :w]


def _upsample_node(F, cs: int, axis: int, n_out: int):
    """Node-centered bilinear upsample along `axis`: coarse node j sits
    at full-res position j*cs; -> first n_out samples.  Phase-unrolled
    stack+reshape (no gathers)."""
    axis = axis % F.ndim
    n = F.shape[axis]
    F0 = jax.lax.slice_in_dim(F, 0, n - 1, axis=axis)
    F1 = jax.lax.slice_in_dim(F, 1, n, axis=axis)
    phases = [F0 * (1.0 - r / cs) + F1 * (r / cs) for r in range(cs)]
    st = jnp.stack(phases, axis=axis + 1)
    shape = list(F.shape)
    shape[axis] = (n - 1) * cs
    out = st.reshape(shape)
    return jax.lax.slice_in_dim(out, 0, n_out, axis=axis)


def warp_model(img, coord_fn, max_dy: float, max_dx: float,
               per_channel=None, fp_iters: int = 6,
               interpret: bool = False, out_shape=None,
               src_offset=(0, 0), coarse: int = 1):
    """Warp `img` (C, H, W) by a coordinate model.

    coord_fn(y, x[, ch]) -> (sy, sx): traced elementwise mapping from
    output to source coordinates (absolute pixels).  `per_channel=True`
    evaluates one coord plane per channel (TCA-style warps).
    max_dy/max_dx: conservative bounds on |sy - (y + oy)| etc. where
    (oy, ox) = src_offset, the static translation between the output
    grid (out_shape, default img's) and the source; the halo window
    around the offset grid is cut from REAL source data.
    coarse > 1: evaluate the coord model (and its fixed-point inverse)
    on a stride-`coarse` grid and bilinearly upsample the coordinate
    fields — sound for smooth warps (every optical/brush warp here) and
    removes the per-pixel model cost when coord_fn is expensive
    (liquify's K-stamp scan).
    """
    c, hs, ws = img.shape
    oy, ox = src_offset
    h, w = out_shape or (hs, ws)
    pad_y = max(8, _round_up(max_dy + 2, 8))
    pad_x = max(128, _round_up(max_dx + 2, 128))
    # source window rows [oy - pad_y, oy + h + pad_y) with real data,
    # edge-replicated only beyond the physical source
    y0, y1 = oy - pad_y, oy + h + pad_y
    x0, x1 = ox - pad_x, ox + w + pad_x
    src = jnp.pad(img, ((0, 0),
                        (max(0, -y0), max(0, y1 - hs)),
                        (max(0, -x0), max(0, x1 - ws))), mode="edge")
    src = src[:, y0 + max(0, -y0) : y0 + max(0, -y0) + (h + 2 * pad_y),
              x0 + max(0, -x0) : x0 + max(0, -x0) + (w + 2 * pad_x)]
    chans = range(c) if per_channel else (None,)

    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]
    xe = jnp.arange(-pad_x, w + pad_x, dtype=jnp.float32)[None, :]
    cs = max(int(coarse), 1)
    if cs > 1:
        nyc = -(-h // cs) + 1
        nxc = -(-w // cs) + 1
        nxec = -(-(w + 2 * pad_x) // cs) + 1
        yy_c = (jnp.arange(nyc, dtype=jnp.float32) * cs)[:, None]
        xx_c = (jnp.arange(nxc, dtype=jnp.float32) * cs)[None, :]
        xe_c = (jnp.arange(nxec, dtype=jnp.float32) * cs - pad_x)[None, :]
    else:
        yy_c, xx_c, xe_c = yy, xx, xe

    syx_all, sx_all = [], []
    for ch in chans:
        fn = (lambda y, x, _c=ch: coord_fn(y, x, _c)) if ch is not None \
            else coord_fn
        _, sx = fn(yy_c, xx_c)
        sx = jnp.broadcast_to(sx, (yy_c.shape[0], xx_c.shape[1])) - ox
        # row-wise inverse of sx on the extended grid (fixed point);
        # hx stays in OUTPUT coords, coord_fn speaks absolute source
        hx = jnp.broadcast_to(xe_c, (yy_c.shape[0], xe_c.shape[1]))
        for _ in range(fp_iters):
            _, sx_at = fn(yy_c, hx)
            hx = hx + (xe_c - (sx_at - ox))
        syx, _ = fn(yy_c, hx)
        syx = jnp.broadcast_to(syx, (yy_c.shape[0], hx.shape[1])) - oy
        if cs > 1:
            sx = _upsample_node(_upsample_node(sx, cs, 0, h), cs, 1, w)
            syx = _upsample_node(_upsample_node(syx, cs, 0, h),
                                 cs, 1, w + 2 * pad_x)
        syx_all.append(jnp.clip(syx, yy - (pad_y - 1.0),
                                yy + (pad_y - 1.0)))
        sx_all.append(jnp.clip(sx, xx - (pad_x - 1.0),
                               xx + (pad_x - 1.0)))
    syx = jnp.stack(syx_all)
    sx = jnp.stack(sx_all)
    return warp_bilinear(src, syx, sx, pad_y, pad_x, interpret=interpret,
                         src_prepadded=True)


def warp_gather_ref(img, sy, sx):
    """Direct-gather reference warp (XLA; CPU tests / fallback).
    img (C,H,W); sy/sx (Cc,H,W) absolute source coords."""
    c, h, w = img.shape
    outs = []
    for ch in range(c):
        cidx = min(ch, sy.shape[0] - 1)
        ys, xs = sy[cidx], sx[cidx]
        y0 = jnp.clip(jnp.floor(ys), 0, h - 2).astype(jnp.int32)
        x0 = jnp.clip(jnp.floor(xs), 0, w - 2).astype(jnp.int32)
        fy = jnp.clip(ys - y0, 0.0, 1.0)
        fx = jnp.clip(xs - x0, 0.0, 1.0)
        p = img[ch]
        v = (p[y0, x0] * (1 - fy) * (1 - fx)
             + p[y0, x0 + 1] * (1 - fy) * fx
             + p[y0 + 1, x0] * fy * (1 - fx)
             + p[y0 + 1, x0 + 1] * fy * fx)
        outs.append(v)
    return jnp.stack(outs)
