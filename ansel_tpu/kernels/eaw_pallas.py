"""Edge-aware à-trous denoise decompose as a Pallas TPU kernel.

Same math as pixel/wavelets.eaw_dn_decompose (behavioral reference
`/root/reference/src/pixel/eaw.c`: eaw_dn_decompose + dn_weight
:181-195) restructured for the TPU memory hierarchy: the XLA graph
reads the full image 25x per scale (one HBM pass per tap); here each
grid step DMAs one haloed tile into VMEM and runs all 25 weighted taps
on the resident tile — one HBM read + one write per scale.

Halo = 2 * 2^scale (max 32 at scale 4); buffers stay lane/sublane
aligned: (3, 64+2*32, 512+2*128) = (3, 128, 768).
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
BORDER_H = 32          # >= 2 * 2^scale for scale <= 4
BORDER_W = 128         # lane-aligned halo
BUF_H = TILE_H + 2 * BORDER_H
BUF_W = TILE_W + 2 * BORDER_W
MAX_SCALE = 4          # 2 * 2^4 = 32 == BORDER_H


def _sh(a, dy, dx):
    if dy:
        a = pltpu.roll(a, -dy % a.shape[0], 0)
    if dx:
        a = pltpu.roll(a, -dx % a.shape[1], 1)
    return a


def _kernel(consts_ref, hbm_ref, c0_ref, c1_ref, c2_ref, tile, sem, *, d):
    i = pl.program_id(0)
    j = pl.program_id(1)
    copy = pltpu.make_async_copy(
        hbm_ref.at[:, pl.ds(i * TILE_H, BUF_H), pl.ds(j * TILE_W, BUF_W)],
        tile, sem,
    )
    copy.start()
    copy.wait()
    x0, x1, x2 = tile[0], tile[1], tile[2]
    inv = consts_ref[0]

    num0 = jnp.zeros_like(x0)
    num1 = jnp.zeros_like(x0)
    num2 = jnp.zeros_like(x0)
    den = jnp.zeros_like(x0)
    for iy in range(5):
        for ix in range(5):
            dy, dx = (iy - 2) * d, (ix - 2) * d
            s0 = _sh(x0, dy, dx)
            s1 = _sh(x1, dy, dx)
            s2 = _sh(x2, dy, dx)
            dist2 = (s0 - x0) ** 2 + (s1 - x1) ** 2 + (s2 - x2) ** 2
            # dn_weight (eaw.c:181-195)
            wp = jnp.exp2(-jnp.maximum(0.0, dist2 * inv * 0.02 - 9.0))
            w = float(B3[iy] * B3[ix]) * wp
            num0 = num0 + w * s0
            num1 = num1 + w * s1
            num2 = num2 + w * s2
            den = den + w
    den = jnp.maximum(den, 1e-12)
    sl = (slice(BORDER_H, BORDER_H + TILE_H),
          slice(BORDER_W, BORDER_W + TILE_W))
    c0_ref[:] = (num0 / den)[sl]
    c1_ref[:] = (num1 / den)[sl]
    c2_ref[:] = (num2 / den)[sl]


def cdiv(a, b):
    return -(-a // b)


def eaw_dn_coarse_pallas(x: jnp.ndarray, scale: int, inv_sigma2,
                         interpret: bool = False) -> jnp.ndarray:
    """(3, H, W) -> coarse (3, H, W); detail/sum_sq are cheap XLA follow-ups."""
    assert scale <= MAX_SCALE, scale
    _, h, w = x.shape
    d = 1 << scale
    nh, nw = cdiv(h, TILE_H), cdiv(w, TILE_W)
    pad_b = nh * TILE_H + 2 * BORDER_H - (h + BORDER_H)
    pad_r = nw * TILE_W + 2 * BORDER_W - (w + BORDER_W)
    xp = jnp.pad(x, ((0, 0), (BORDER_H, pad_b), (BORDER_W, pad_r)),
                 mode="edge")
    consts = jnp.asarray(inv_sigma2, jnp.float32).reshape(1)

    out_shape = [jax.ShapeDtypeStruct((nh * TILE_H, nw * TILE_W),
                                      x.dtype)] * 3
    out_spec = pl.BlockSpec((TILE_H, TILE_W), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    kern = functools.partial(_kernel, d=d)
    c0, c1, c2 = pl.pallas_call(
        kern,
        grid=(nh, nw),
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[out_spec] * 3,
        scratch_shapes=[
            pltpu.VMEM((3, BUF_H, BUF_W), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(consts, xp)
    return jnp.stack([c0[:h, :w], c1[:h, :w], c2[:h, :w]])
