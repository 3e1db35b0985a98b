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
# PDE shifts; S=5 needs 93 px of halo, paid for with a raised scoped-VMEM
# ceiling (CompilerParams below) and a 128x512 tile that keeps the DMA
# amplification at 3.75x (the old 16MB-limit 32x256 attempt was 14x)
_GEOM = {  # scales -> (TILE_H, TILE_W, BORDER_H, BORDER_W)
    # round-5 sweep at 45MP/scales=4: 64 rows = 197ms, 128 = 161,
    # 256 = 158, 128x1024 = 176 — the 48-row halo wants tall tiles
    # (row amplification 2.5x -> 1.4x); smaller scales keep the cheap
    # short tiles (halo <= 24 rows costs little).
    1: (64, 512, 8, 64), 2: (64, 512, 16, 64), 3: (128, 512, 24, 64),
    4: (256, 512, 48, 64), 5: (128, 512, 96, 128),
}
MAX_SCALES = 5


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


def _box9(p, d):
    """Separable 3x3 dilated box sum: 4 rolls instead of 8."""
    rowp = _sh(p, 0, -d) + p + _sh(p, 0, d)
    return _sh(rowp, -d, 0) + rowp + _sh(rowp, d, 0)


def _conv_pieces(p, d, modes_pair, need_dir):
    """Stencil pieces of one source plane for the 3x3 dilated anisotropic
    convolution (taps decomposed into diagonal D / vertical V /
    horizontal H / center, all separable-shared):
      deriv = 0.5*a12*D + a22*V + a11*H - 2*(a11+a22)*c
    and the separable isotropic laplacian when a kernel pair is
    isotropic.  `need_dir` adds the gradient components."""
    ISO = 0
    out = {"c": p}
    all_iso = all(m == ISO for m in modes_pair)
    if all_iso and not need_dir:
        l, r = _sh(p, 0, -d), _sh(p, 0, d)
        rowp = 0.5 * (l + r) + p
        out["iso"] = (0.5 * (_sh(rowp, -d, 0) + _sh(rowp, d, 0))
                      + rowp - 4.0 * p)
        return out
    l, r = _sh(p, 0, -d), _sh(p, 0, d)
    u, dn = _sh(p, -d, 0), _sh(p, d, 0)
    rd = l - r
    out["V"] = u + dn
    out["H"] = l + r
    out["D"] = _sh(rd, -d, 0) - _sh(rd, d, 0)
    if need_dir:
        out["gx"] = (dn - u) * 0.5
        out["gy"] = (r - l) * 0.5
    if any(m == ISO for m in modes_pair):
        out["iso"] = (0.25 * (_sh(out["H"], -d, 0) + _sh(out["H"], d, 0))
                      + 0.5 * (out["V"] + out["H"]) - 3.0 * p)
    return out


def _aniso_abc(c2, cs, c_sq, s_sq, mode):
    """a11/a22/a12 of the anisotropic kernel (diffuse.c:648-732)."""
    if mode == 1:  # ISO_ISOPHOTE
        return (c_sq + c2 * s_sq, c2 * c_sq + s_sq, (c2 - 1.0) * cs)
    return (c2 * c_sq + s_sq, c_sq + c2 * s_sq, (1.0 - c2) * cs)


def _kernel(consts_ref, hbm_ref, o0, o1, o2, tile, sems, *, scales, modes,
            geom, nw, nt):
    from ..ops.diffuse import _direction

    TILE_H, TILE_W, BORDER_H, BORDER_W = geom
    BUF_H = TILE_H + 2 * BORDER_H
    BUF_W = TILE_W + 2 * BORDER_W
    t = pl.program_id(0)

    # cross-step double buffering (the sepblur row-strip pattern): the
    # DMA for tile t+1 is in flight while tile t computes — the serial
    # start/wait form left ~370 DMA stalls on the 45MP critical path
    def dma(slot, tt):
        return pltpu.make_async_copy(
            hbm_ref.at[:, pl.ds((tt // nw) * TILE_H, BUF_H),
                       pl.ds((tt % nw) * TILE_W, BUF_W)],
            tile.at[slot], sems.at[slot])

    @pl.when(t == 0)
    def _():
        dma(0, 0).start()

    @pl.when(t + 1 < nt)
    def _():
        dma((t + 1) % 2, t + 1).start()

    dma(t % 2, t).wait()
    cur_ref = tile.at[t % 2]

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

    chans = [cur_ref[k] for k in range(3)]
    # decompose
    HF = []
    cur = chans
    for s in range(scales):
        low = [_sep_blur_tile(p, s) for p in cur]
        HF.append([c - l for c, l in zip(cur, low)])
        cur = low

    flt_min = 1e-8
    ISO = 0
    # k0: g-direction kernel on LF; k1: l-direction on LF;
    # k2: g-direction on HF; k3: l-direction on HF (diffuse.c:1068-1075)
    need_g = modes[0] != ISO or modes[2] != ISO
    need_l = modes[1] != ISO or modes[3] != ISO

    # coarse-to-fine PDE (ops/diffuse._pde_step, vectorized per channel)
    buf = cur
    for s in range(scales - 1, -1, -1):
        d = 1 << s
        new_buf = []
        for ch in range(3):
            # energy is PER CHANNEL (diffuse.c:818-836 simd pixel math):
            # q = (HF/LF)^2 computed ONCE, then box-summed separably
            # (elementwise commutes with shifts; no per-tap divides)
            q = (HF[s][ch] * (1.0 / (jnp.maximum(buf[ch] - flt_min, 0.0)
                                     + flt_min))) ** 2
            energy = jnp.maximum(vt + _box9(q, d) * norm_reg[s] - flt_min,
                                 0.0) + flt_min
            inv_energy = 1.0 / energy
            pl_lf = _conv_pieces(buf[ch], d, (modes[0], modes[1]), need_g)
            pl_hf = _conv_pieces(HF[s][ch], d, (modes[2], modes[3]),
                                 need_l)
            if need_g:
                c_sq_g, s_sq_g, cs_g, mag_g = _direction(pl_lf["gx"],
                                                         pl_lf["gy"])
            if need_l:
                c_sq_l, s_sq_l, cs_l, mag_l = _direction(pl_hf["gx"],
                                                         pl_hf["gy"])
            update = None
            for k, src in enumerate((pl_lf, pl_lf, pl_hf, pl_hf)):
                abcd_k = consts_ref[abcd_off + 4 * s + k]
                if modes[k] == ISO:
                    deriv = src["iso"]
                else:
                    if k % 2 == 0:
                        c2 = jnp.exp(-mag_g * aniso[k])
                        a11, a22, a12 = _aniso_abc(c2, cs_g, c_sq_g,
                                                   s_sq_g, modes[k])
                    else:
                        c2 = jnp.exp(-mag_l * aniso[k])
                        a11, a22, a12 = _aniso_abc(c2, cs_l, c_sq_l,
                                                   s_sq_l, modes[k])
                    deriv = (0.5 * a12 * src["D"] + a22 * src["V"]
                             + a11 * src["H"]
                             - 2.0 * (a11 + a22) * src["c"])
                contrib = abcd_k * deriv
                update = contrib if update is None else update + contrib
            acc = HF[s][ch] * strength[s] + update * inv_energy
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
    out_spec = pl.BlockSpec((TILE_H, TILE_W),
                            lambda t: (t // nw, t % nw),
                            memory_space=pltpu.VMEM)
    kern = functools.partial(_kernel, scales=scales, modes=tuple(modes),
                             geom=geom, nw=nw, nt=nh * nw)
    a, b, cc = pl.pallas_call(
        kern,
        grid=(nh * nw,),
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[out_spec] * 3,
        scratch_shapes=[
            pltpu.VMEM((2, 3, BUF_H, BUF_W), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(consts, xp)
    return jnp.stack([a[:h, :w], b[:h, :w], cc[:h, :w]])
