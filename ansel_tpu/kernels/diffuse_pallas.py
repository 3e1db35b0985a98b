"""Anisotropic diffusion (diffuse-or-sharpen) iteration as a Pallas kernel.

Same math as ops/diffuse.py (behavioral reference
`/root/reference/src/iop/diffuse.c`: wavelet decompose + per-scale
anisotropic PDE step), restructured for the TPU memory hierarchy: the XLA
graph runs ~25 HBM passes per (iteration, scale); here each grid step DMAs
one haloed tile and runs the whole iteration — decompose chain + coarse-to-
fine PDE — VMEM-resident.  One kernel launch per iteration.

Halo: decompose shrinks validity by sum(2*2^s) = 2(2^S - 1) and the PDE
shifts add sum(2^s) = 2^S - 1; S=4 scales -> 45 px, padded to 48 rows /
64 lanes.

Boundary semantics: the plain path edge-replicates at every blur stage;
this kernel edge-pads the image once, so results differ inside the outer
halo-width ring (interior is bit-exact, verified to 1e-7).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B3 = (1.0 / 16.0, 4.0 / 16.0, 6.0 / 16.0, 4.0 / 16.0, 1.0 / 16.0)

# tile geometry per scale count: halo = 2(2^S - 1) decompose + (2^S - 1)
# PDE shifts; S=5 needs 93 px of halo, paid for with a smaller tile
_GEOM = {  # scales -> (TILE_H, TILE_W, BORDER_H, BORDER_W)
    1: (64, 512, 8, 64), 2: (64, 512, 16, 64), 3: (64, 512, 24, 64),
    4: (64, 512, 48, 64),
}
# S=5 needs 93px of halo; the DMA amplification there (~14x with the
# VMEM-feasible 32x256 tile) erases the fusion win — measured 771ms vs
# 705ms plain at 45MP — so 5+ scales stay on the whole-image XLA path.
MAX_SCALES = 4


def _sh(a, dy, dx):
    if dy:
        a = pltpu.roll(a, -dy % a.shape[0], 0)
    if dx:
        a = pltpu.roll(a, -dx % a.shape[1], 1)
    return a


def _sep_blur_tile(p, scale: int):
    """B3 à-trous on one resident plane (garbage stays in the halo)."""
    d = 1 << scale
    row = sum(float(B3[k]) * _sh(p, (k - 2) * d, 0) for k in range(5))
    return sum(float(B3[k]) * _sh(row, 0, (k - 2) * d) for k in range(5))


def _shifts9_tile(planes, mult: int):
    """9 dilated-neighbourhood views of a 3-channel tuple, per channel."""
    return [[_sh(p, ii * mult, jj * mult) for p in planes]
            for ii in (-1, 0, 1) for jj in (-1, 0, 1)]


def _kernel(consts_ref, hbm_ref, o0, o1, o2, tile, sem, *, scales, modes,
            geom):
    from ..ops.diffuse import _direction, _kernel9

    TILE_H, TILE_W, BORDER_H, BORDER_W = geom
    BUF_H = TILE_H + 2 * BORDER_H
    BUF_W = TILE_W + 2 * BORDER_W
    i = pl.program_id(0)
    j = pl.program_id(1)
    copy = pltpu.make_async_copy(
        hbm_ref.at[:, pl.ds(i * TILE_H, BUF_H), pl.ds(j * TILE_W, BUF_W)],
        tile, sem)
    copy.start()
    copy.wait()

    def c_scalar(idx):
        return consts_ref[idx]

    # consts layout: [variance_threshold, aniso(4), norm_reg(S),
    #                 strength(S), ABCD(S*4)]
    vt = consts_ref[0]
    aniso = [consts_ref[1 + k] for k in range(4)]
    off = 5
    norm_reg = [consts_ref[off + s] for s in range(scales)]
    strength = [consts_ref[off + scales + s] for s in range(scales)]
    abcd_off = off + 2 * scales

    chans = [tile[k] for k in range(3)]
    # decompose
    HF = []
    cur = chans
    for s in range(scales):
        low = [_sep_blur_tile(p, s) for p in cur]
        HF.append([c - l for c, l in zip(cur, low)])
        cur = low

    flt_min = 1e-8
    # coarse-to-fine PDE (ops/diffuse._pde_step, vectorized per channel)
    buf = cur
    for s in range(scales - 1, -1, -1):
        mult = 1 << s
        nHF = _shifts9_tile(HF[s], mult)    # [9][3]
        nLF = _shifts9_tile(buf, mult)
        energy = None
        for t9 in range(9):
            for ch in range(3):
                l = jnp.maximum(nLF[t9][ch] - flt_min, 0.0) + flt_min
                e = (nHF[t9][ch] / l) ** 2
                energy = e if energy is None else energy + e
        energy = jnp.maximum(vt + energy * norm_reg[s] - flt_min,
                             0.0) + flt_min

        new_buf = []
        for ch in range(3):
            gx_lf = (nLF[7][ch] - nLF[1][ch]) * 0.5
            gy_lf = (nLF[5][ch] - nLF[3][ch]) * 0.5
            gx_hf = (nHF[7][ch] - nHF[1][ch]) * 0.5
            gy_hf = (nHF[5][ch] - nHF[3][ch]) * 0.5
            c_sq_g, s_sq_g, cs_g, mag_g = _direction(gx_lf, gy_lf)
            c_sq_l, s_sq_l, cs_l, mag_l = _direction(gx_hf, gy_hf)
            c2 = [jnp.exp(-mag_g * aniso[0]), jnp.exp(-mag_l * aniso[1]),
                  jnp.exp(-mag_g * aniso[2]), jnp.exp(-mag_l * aniso[3])]
            kerns = [
                _kernel9(c2[0], cs_g, c_sq_g, s_sq_g, modes[0]),
                _kernel9(c2[1], cs_l, c_sq_l, s_sq_l, modes[1]),
                _kernel9(c2[2], cs_g, c_sq_g, s_sq_g, modes[2]),
                _kernel9(c2[3], cs_l, c_sq_l, s_sq_l, modes[3]),
            ]
            update = None
            for k, src in enumerate((nLF, nLF, nHF, nHF)):
                abcd_k = consts_ref[abcd_off + 4 * s + k]
                deriv = None
                for t9 in range(9):
                    term = kerns[k][t9] * src[t9][ch]
                    deriv = term if deriv is None else deriv + term
                contrib = abcd_k * deriv
                update = contrib if update is None else update + contrib
            acc = HF[s][ch] * strength[s] + update / energy
            new_buf.append(jnp.maximum(acc + buf[ch], 0.0))
        buf = new_buf

    sl = (slice(BORDER_H, BORDER_H + TILE_H),
          slice(BORDER_W, BORDER_W + TILE_W))
    o0[:] = buf[0][sl]
    o1[:] = buf[1][sl]
    o2[:] = buf[2][sl]


def cdiv(a, b):
    return -(-a // b)


def diffuse_iteration_pallas(x: jnp.ndarray, c, scales: int, modes,
                             interpret: bool = False) -> jnp.ndarray:
    """One diffuse iteration on (3, H, W); requires scales <= MAX_SCALES."""
    assert scales <= MAX_SCALES, scales
    TILE_H, TILE_W, BORDER_H, BORDER_W = geom = _GEOM[max(scales, 1)]
    BUF_H = TILE_H + 2 * BORDER_H
    BUF_W = TILE_W + 2 * BORDER_W
    _, h, w = x.shape
    nh, nw = cdiv(h, TILE_H), cdiv(w, TILE_W)
    pad_b = nh * TILE_H + 2 * BORDER_H - (h + BORDER_H)
    pad_r = nw * TILE_W + 2 * BORDER_W - (w + BORDER_W)
    xp = jnp.pad(x, ((0, 0), (BORDER_H, pad_b), (BORDER_W, pad_r)),
                 mode="edge")
    consts = jnp.concatenate([
        jnp.asarray(c["variance_threshold"], jnp.float32).reshape(1),
        jnp.asarray(c["aniso"], jnp.float32).reshape(4),
        jnp.asarray(c["norm_reg"], jnp.float32).reshape(-1)[:scales],
        jnp.asarray(c["strength"], jnp.float32).reshape(-1)[:scales],
        jnp.asarray(c["ABCD"], jnp.float32).reshape(-1)[:scales * 4],
    ])
    out_shape = [jax.ShapeDtypeStruct((nh * TILE_H, nw * TILE_W),
                                      x.dtype)] * 3
    out_spec = pl.BlockSpec((TILE_H, TILE_W), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    kern = functools.partial(_kernel, scales=scales, modes=tuple(modes),
                             geom=geom)
    a, b, cc = pl.pallas_call(
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
    return jnp.stack([a[:h, :w], b[:h, :w], cc[:h, :w]])
