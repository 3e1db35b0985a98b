"""Dual-direction Deriche IIR (vertical axis) as a Pallas kernel.

Behavioral reference: `src/pixel/gaussian.c:150-320` (dt_gaussian_blur)
— the forward + backward second-order recurrences with coefp/coefn
boundary priming, bit-identical math to `pixel/blur.gaussian_iir`.

Why a kernel: the XLA block-parallel formulation costs ~41 ms per
3-channel σ=8 blur at 24MP — ~8 un-fusable memory passes of ~1.5 ms
each (docs/PERF.md round-5 component decomposition).  Here the whole
axis runs VMEM-resident: one read of the strip, one write.

Mosaic discipline (CLAUDE.md): every dynamic row start is `b * 8`
(provably 8-aligned); the sequential recursion runs over STATIC
single-row slices of an 8-row register tile, with (1, LW) carries
between blocks.  The horizontal axis reuses this kernel around an XLA
transpose pair — still 3 passes instead of ~8.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RB = 8            # row block (sublane alignment quantum)


def _lane_width(hp):
    """Strip lane width: Mosaic double-buffers the grid blocks, so
    ~4 strip buffers (in + out, x2 pipelining) must fit the 16MB
    scoped-VMEM budget."""
    for lw in (512, 256, 128):
        if 4 * hp * lw * 4 <= 14 * (1 << 20):
            return lw
    return 128


def _kernel(x_ref, o_ref, *, nb, coef):
    a0, a1, a2, a3, b1, b2, coefp, coefn = (float(c) for c in coef)

    x0 = x_ref[0, 0:1, :]
    # ---- forward: y_i = a0 x_i + a1 x_{i-1} - b1 y_{i-1} - b2 y_{i-2}
    yb = coefp * x0

    def fwd(b, carry):
        xprev, y1, y2 = carry
        tile = x_ref[0, pl.ds(b * RB, RB), :]
        rows = []
        for r in range(RB):
            xr = tile[r:r + 1, :]
            f = a0 * xr + a1 * xprev
            y = f - b1 * y1 - b2 * y2
            rows.append(y)
            xprev, y2, y1 = xr, y1, y
        o_ref[0, pl.ds(b * RB, RB), :] = jnp.concatenate(rows, axis=0)
        return (xprev, y1, y2)

    jax.lax.fori_loop(0, nb, fwd, (x0, yb, yb), unroll=False)

    # ---- backward: z_i = a2 x_{i+1} + a3 x_{i+2} - b1 z_{i+1} - b2 z_{i+2}
    xlast = x_ref[0, pl.ds((nb - 1) * RB, RB), :][RB - 1:RB, :]
    yn = coefn * xlast

    def bwd(bi, carry):
        b = nb - 1 - bi
        xn1, xn2, z1, z2 = carry
        tile = x_ref[0, pl.ds(b * RB, RB), :]
        yf = o_ref[0, pl.ds(b * RB, RB), :]
        rows = [None] * RB
        for r in range(RB - 1, -1, -1):
            f = a2 * xn1 + a3 * xn2
            z = f - b1 * z1 - b2 * z2
            rows[r] = yf[r:r + 1, :] + z
            xn2, xn1 = xn1, tile[r:r + 1, :]
            z2, z1 = z1, z
        o_ref[0, pl.ds(b * RB, RB), :] = jnp.concatenate(rows, axis=0)
        return (xn1, xn2, z1, z2)

    jax.lax.fori_loop(0, nb, bwd, (xlast, xlast, yn, yn), unroll=False)


def _iir_vertical(x, sigma, order, interpret=False):
    """(C, H, W) -> vertical-axis Deriche pass on every plane."""
    from ..pixel.blur import _deriche_coeffs

    coef = _deriche_coeffs(sigma, order)
    C, H, W = x.shape
    Hp = -(-H // RB) * RB
    LW = _lane_width(Hp)
    Wp = -(-W // LW) * LW
    xp = jnp.pad(x, ((0, 0), (0, Hp - H), (0, Wp - W)), mode="edge")
    nb = Hp // RB

    kern = functools.partial(_kernel, nb=nb, coef=coef)

    out = pl.pallas_call(
        kern,
        grid=(C, Wp // LW),
        in_specs=[pl.BlockSpec((1, Hp, LW), lambda c, j: (c, 0, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, Hp, LW), lambda c, j: (c, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, Hp, Wp), x.dtype),
        interpret=interpret,
    )(xp)
    return out[:, :H, :W]


def gaussian_iir_pallas(x, sigma, order=0, vmin=None, vmax=None,
                        interpret=False):
    """Drop-in for pixel/blur.gaussian_iir on TPU: vertical kernel pass,
    then the horizontal axis through a transpose pair around the same
    kernel.  (..., H, W) with <= 8 leading channels."""
    if sigma <= 0:
        return x
    lead = x.shape[:-2]
    v = x.reshape((-1,) + x.shape[-2:])
    if vmin is not None or vmax is not None:
        v = jnp.clip(v, vmin, vmax)
    v = _iir_vertical(v, sigma, order, interpret=interpret)
    v = jnp.swapaxes(v, -1, -2)
    v = _iir_vertical(v, sigma, order, interpret=interpret)
    v = jnp.swapaxes(v, -1, -2)
    return v.reshape(lead + v.shape[-2:])
