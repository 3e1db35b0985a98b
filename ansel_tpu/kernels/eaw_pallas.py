"""Edge-aware à-trous decomposes as Pallas TPU kernels.

Behavioral reference `/root/reference/src/pixel/eaw.c`:
  * variant "dn" — eaw_dn_decompose + dn_weight (:181-195), the
    denoiseprofile wavelet path: 25-tap B3 blur, weight shared across
    channels, w = fast_mexp2f(max(0, |Δrgb|² · inv_sigma2 · 0.02 − 9))
    — the reference's reduced-precision bit-trick, matched bit-exactly
    (pixel/fastmath.py).
  * variant "atrous" — eaw_decompose (the atrous equalizer): same taps,
    photometric weights via dt_fast_expf — L weight from channel 0 and
    ONE shared chroma weight from the summed a/b squares (eaw.c:29-42).

The XLA graph reads the full image 25x per scale (one HBM pass per
tap); here each grid step DMAs one haloed tile into VMEM and runs all
25 weighted taps on the resident tile — one HBM read + one write per
scale.

Shift strategy (the perf-critical part, all measured on a v5e chip):
the first formulation rolled the WHOLE padded buffer per tap and did
all weight math on it, paying up to 7.5x wasted compute at scale 6
(border 128 vs tile 64); a pure static-slice rewrite (tap offsets are
static multiples of d) computed on the center only but lost it back to
Mosaic's unaligned-slice relayouts at small d (sublane offset d < 8,
lane offset d < 128).  The hybrid here: per tap ROW group, ONE sublane
roll of the full buffer then an ALIGNED row crop (the sublane border
bh is a multiple of 8); per tap, ONE lane roll of that row-cropped
strip then an ALIGNED column crop (the lane border bw is a multiple of
128).  Rolls are cheap rotates, every slice is aligned, and the 17-op
weight math runs on (tile_h, tile_w) elements only.

The kernel also emits the detail planes (x - coarse) from the same
resident tile, saving the separate XLA subtraction pass; the
sum-of-squares reduction stays in XLA (reading detail once is ~0.4 ms
at 24 MP — not worth a scalar-output block).

Halo = 2 · 2^scale: sublane border max(8, 2d), lane border max(128, 2d);
scales up to 6 (d = 64) keep the buffer at (3, 320, 768) ≈ 3 MB VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..pixel.fastmath import dt_fast_expf, fast_mexp2f

B3 = (1.0 / 16.0, 4.0 / 16.0, 6.0 / 16.0, 4.0 / 16.0, 1.0 / 16.0)

TILE_H = 64
TILE_W = 512
MAX_SCALE = 6          # 2 * 2^6 = 128 halo


def _borders(d: int):
    return max(8, 2 * d), max(128, 2 * d)


def _kernel(consts_ref, hbm_ref, c0_ref, c1_ref, c2_ref, d0_ref, d1_ref,
            d2_ref, tile, sem, *, d, variant, bh, bw, emit_detail):
    i = pl.program_id(0)
    j = pl.program_id(1)
    buf_h, buf_w = TILE_H + 2 * bh, TILE_W + 2 * bw
    copy = pltpu.make_async_copy(
        hbm_ref.at[:, pl.ds(i * TILE_H, buf_h), pl.ds(j * TILE_W, buf_w)],
        tile, sem,
    )
    copy.start()
    copy.wait()
    cst = consts_ref[0]

    rows = slice(bh, bh + TILE_H)       # aligned: bh multiple of 8
    cols = slice(bw, bw + TILE_W)       # aligned: bw multiple of 128
    x0 = tile[0, rows, cols]
    x1 = tile[1, rows, cols]
    x2 = tile[2, rows, cols]

    num0 = jnp.zeros_like(x0)
    num1 = jnp.zeros_like(x0)
    num2 = jnp.zeros_like(x0)
    if variant == 0:
        den = jnp.zeros_like(x0)
    else:
        den0 = jnp.zeros_like(x0)
        den1 = jnp.zeros_like(x0)
        den2 = jnp.zeros_like(x0)
    for iy in range(5):
        dy = (iy - 2) * d
        # one sublane roll per row group, then the aligned row crop:
        # r_c[y, :] = buf_c[bh + y + dy, :] (garbage wraps into halo)
        if dy:
            r0 = pltpu.roll(tile[0], -dy % buf_h, 0)[rows, :]
            r1 = pltpu.roll(tile[1], -dy % buf_h, 0)[rows, :]
            r2 = pltpu.roll(tile[2], -dy % buf_h, 0)[rows, :]
        else:
            r0, r1, r2 = tile[0][rows, :], tile[1][rows, :], \
                tile[2][rows, :]
        for ix in range(5):
            dx = (ix - 2) * d
            if dx:
                s0 = pltpu.roll(r0, -dx % buf_w, 1)[:, cols]
                s1 = pltpu.roll(r1, -dx % buf_w, 1)[:, cols]
                s2 = pltpu.roll(r2, -dx % buf_w, 1)[:, cols]
            else:
                s0, s1, s2 = r0[:, cols], r1[:, cols], r2[:, cols]
            k = float(B3[iy] * B3[ix])
            if variant == 0:
                dist2 = (s0 - x0) ** 2 + (s1 - x1) ** 2 + (s2 - x2) ** 2
                # dn_weight (eaw.c:181-195): fast_mexp2f, bit-exact
                wp = fast_mexp2f(
                    jnp.maximum(0.0, dist2 * cst * 0.02 - 9.0))
                w = k * wp
                num0 = num0 + w * s0
                num1 = num1 + w * s1
                num2 = num2 + w * s2
                den = den + w
            else:
                # eaw_decompose weight (eaw.c:29-42): dt_fast_expf, L
                # weight from channel 0, ONE shared chroma weight from
                # the summed a/b squares
                w0 = k * dt_fast_expf(-((s0 - x0) ** 2) * cst)
                wc = k * dt_fast_expf(
                    -((s1 - x1) ** 2 + (s2 - x2) ** 2) * cst)
                num0 = num0 + w0 * s0
                num1 = num1 + wc * s1
                num2 = num2 + wc * s2
                den0 = den0 + w0
                den1 = den1 + wc
                den2 = den2 + wc
    if variant == 0:
        inv = 1.0 / jnp.maximum(den, 1e-12)
        c0, c1, c2 = num0 * inv, num1 * inv, num2 * inv
    else:
        c0 = num0 / jnp.maximum(den0, 1e-9)
        c1 = num1 / jnp.maximum(den1, 1e-9)
        c2 = num2 / jnp.maximum(den2, 1e-9)
    c0_ref[:] = c0
    c1_ref[:] = c1
    c2_ref[:] = c2
    if emit_detail:
        d0_ref[:] = x0 - c0
        d1_ref[:] = x1 - c1
        d2_ref[:] = x2 - c2


def cdiv(a, b):
    return -(-a // b)


def _coarse_pallas(x: jnp.ndarray, scale: int, const, variant: int,
                   emit_detail: bool, interpret: bool = False):
    assert scale <= MAX_SCALE, scale
    _, h, w = x.shape
    d = 1 << scale
    bh, bw = _borders(d)
    nh, nw = cdiv(h, TILE_H), cdiv(w, TILE_W)
    pad_b = nh * TILE_H + 2 * bh - (h + bh)
    pad_r = nw * TILE_W + 2 * bw - (w + bw)
    xp = jnp.pad(x, ((0, 0), (bh, pad_b), (bw, pad_r)), mode="edge")
    consts = jnp.asarray(const, jnp.float32).reshape(1)

    n_out = 6 if emit_detail else 3
    out_shape = [jax.ShapeDtypeStruct((nh * TILE_H, nw * TILE_W),
                                      x.dtype)] * n_out
    out_spec = pl.BlockSpec((TILE_H, TILE_W), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    kern = functools.partial(_kernel, d=d, variant=variant, bh=bh, bw=bw,
                             emit_detail=emit_detail)
    if not emit_detail:
        # pallas kernels take a fixed ref signature; pad with dummies
        def kern2(consts_ref, hbm_ref, c0, c1, c2, tile, sem):
            return _kernel(consts_ref, hbm_ref, c0, c1, c2, None, None,
                           None, tile, sem, d=d, variant=variant, bh=bh,
                           bw=bw, emit_detail=False)

        kern = kern2
    outs = pl.pallas_call(
        kern,
        grid=(nh, nw),
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[out_spec] * n_out,
        scratch_shapes=[
            pltpu.VMEM((3, TILE_H + 2 * bh, TILE_W + 2 * bw), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(consts, xp)
    crop = [o[:h, :w] for o in outs]
    if emit_detail:
        return jnp.stack(crop[:3]), jnp.stack(crop[3:])
    return jnp.stack(crop)


def eaw_dn_coarse_pallas(x: jnp.ndarray, scale: int, inv_sigma2,
                         interpret: bool = False):
    """(3, H, W) -> (coarse, detail), one fused pass."""
    return _coarse_pallas(x, scale, inv_sigma2, 0, True, interpret)


def eaw_atrous_coarse_pallas(x: jnp.ndarray, scale: int, sharpen,
                             interpret: bool = False):
    """atrous-equalizer (coarse, detail) with per-channel photometric
    weights."""
    return _coarse_pallas(x, scale, sharpen, 1, True, interpret)
