"""Edge-aware à-trous decomposes as Pallas TPU kernels.

Behavioral reference `/root/reference/src/pixel/eaw.c`:
  * variant "dn" — eaw_dn_decompose + dn_weight (:181-195), the
    denoiseprofile wavelet path: 25-tap B3 blur, weight shared across
    channels, w = 2^-(max(0, |Δrgb|² · inv_sigma2 · 0.02 − 9)).
  * variant "atrous" — eaw_decompose (the atrous equalizer): same taps,
    per-channel photometric weights w_c = exp(−Δc² · sharpen).

The XLA graph reads the full image 25x per scale (one HBM pass per
tap); here each grid step DMAs one haloed tile into VMEM and runs all
25 weighted taps on the resident tile — one HBM read + one write per
scale.  Halo = 2 · 2^scale, so borders grow with scale: sublane border
max(8, 2d), lane border max(128, 2d); scales up to 6 (d = 64) keep the
buffer at (3, 320, 768) ≈ 3 MB VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B3 = (1.0 / 16.0, 4.0 / 16.0, 6.0 / 16.0, 4.0 / 16.0, 1.0 / 16.0)

TILE_H = 64
TILE_W = 512
MAX_SCALE = 6          # 2 * 2^6 = 128 halo


def _borders(d: int):
    return max(8, 2 * d), max(128, 2 * d)


def _sh(a, dy, dx):
    if dy:
        a = pltpu.roll(a, -dy % a.shape[0], 0)
    if dx:
        a = pltpu.roll(a, -dx % a.shape[1], 1)
    return a


def _kernel(consts_ref, hbm_ref, c0_ref, c1_ref, c2_ref, tile, sem, *, d,
            variant, bh, bw):
    i = pl.program_id(0)
    j = pl.program_id(1)
    buf_h, buf_w = TILE_H + 2 * bh, TILE_W + 2 * bw
    copy = pltpu.make_async_copy(
        hbm_ref.at[:, pl.ds(i * TILE_H, buf_h), pl.ds(j * TILE_W, buf_w)],
        tile, sem,
    )
    copy.start()
    copy.wait()
    x0, x1, x2 = tile[0], tile[1], tile[2]
    cst = consts_ref[0]

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
        for ix in range(5):
            dy, dx = (iy - 2) * d, (ix - 2) * d
            s0 = _sh(x0, dy, dx)
            s1 = _sh(x1, dy, dx)
            s2 = _sh(x2, dy, dx)
            k = float(B3[iy] * B3[ix])
            if variant == 0:
                dist2 = (s0 - x0) ** 2 + (s1 - x1) ** 2 + (s2 - x2) ** 2
                # dn_weight (eaw.c:181-195)
                wp = jnp.exp2(-jnp.maximum(0.0, dist2 * cst * 0.02 - 9.0))
                w = k * wp
                num0 = num0 + w * s0
                num1 = num1 + w * s1
                num2 = num2 + w * s2
                den = den + w
            else:
                # eaw_decompose per-channel weights
                w0 = k * jnp.exp(-((s0 - x0) ** 2) * cst)
                w1 = k * jnp.exp(-((s1 - x1) ** 2) * cst)
                w2 = k * jnp.exp(-((s2 - x2) ** 2) * cst)
                num0 = num0 + w0 * s0
                num1 = num1 + w1 * s1
                num2 = num2 + w2 * s2
                den0 = den0 + w0
                den1 = den1 + w1
                den2 = den2 + w2
    sl = (slice(bh, bh + TILE_H), slice(bw, bw + TILE_W))
    if variant == 0:
        den = jnp.maximum(den, 1e-12)
        c0_ref[:] = (num0 / den)[sl]
        c1_ref[:] = (num1 / den)[sl]
        c2_ref[:] = (num2 / den)[sl]
    else:
        c0_ref[:] = (num0 / jnp.maximum(den0, 1e-9))[sl]
        c1_ref[:] = (num1 / jnp.maximum(den1, 1e-9))[sl]
        c2_ref[:] = (num2 / jnp.maximum(den2, 1e-9))[sl]


def cdiv(a, b):
    return -(-a // b)


def _coarse_pallas(x: jnp.ndarray, scale: int, const, variant: int,
                   interpret: bool = False) -> jnp.ndarray:
    assert scale <= MAX_SCALE, scale
    _, h, w = x.shape
    d = 1 << scale
    bh, bw = _borders(d)
    nh, nw = cdiv(h, TILE_H), cdiv(w, TILE_W)
    pad_b = nh * TILE_H + 2 * bh - (h + bh)
    pad_r = nw * TILE_W + 2 * bw - (w + bw)
    xp = jnp.pad(x, ((0, 0), (bh, pad_b), (bw, pad_r)), mode="edge")
    consts = jnp.asarray(const, jnp.float32).reshape(1)

    out_shape = [jax.ShapeDtypeStruct((nh * TILE_H, nw * TILE_W),
                                      x.dtype)] * 3
    out_spec = pl.BlockSpec((TILE_H, TILE_W), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    kern = functools.partial(_kernel, d=d, variant=variant, bh=bh, bw=bw)
    c0, c1, c2 = pl.pallas_call(
        kern,
        grid=(nh, nw),
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[out_spec] * 3,
        scratch_shapes=[
            pltpu.VMEM((3, TILE_H + 2 * bh, TILE_W + 2 * bw), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(consts, xp)
    return jnp.stack([c0[:h, :w], c1[:h, :w], c2[:h, :w]])


def eaw_dn_coarse_pallas(x: jnp.ndarray, scale: int, inv_sigma2,
                         interpret: bool = False) -> jnp.ndarray:
    """(3, H, W) -> coarse (3, H, W); detail/sum_sq are cheap XLA
    follow-ups."""
    return _coarse_pallas(x, scale, inv_sigma2, 0, interpret)


def eaw_atrous_coarse_pallas(x: jnp.ndarray, scale: int, sharpen,
                             interpret: bool = False) -> jnp.ndarray:
    """atrous-equalizer coarse with per-channel photometric weights."""
    return _coarse_pallas(x, scale, sharpen, 1, interpret)
