"""RCD demosaic as a Pallas TPU kernel.

Same algorithm as kernels/rcd.py (behavioral reference
`/root/reference/src/iop/demosaic/rcd.c`), restructured for the TPU memory
hierarchy: the mosaic stays in HBM; each grid step DMAs one haloed tile into
VMEM, runs all four RCD steps as VPU elementwise ops on the resident tile,
and writes three (TILE_H, TILE_W) output blocks.  This collapses the
whole-image XLA graph (~70 rolled full-image views -> ~32 GB of HBM traffic
and minutes of compile) into one fused kernel with ~0.2 GB of traffic.

Tiling: TILE 72x488 valid + BORDER 12 halo = 96x512 VMEM buffers (sublane/
lane aligned).  The reference's RCD_BORDER is 9 (rcd.c:75); 12 keeps us
aligned and adds safety for the chained-stencil validity rings.  Circular
rolls inside the tile wrap garbage only into the discarded halo ring.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.types import CFAPattern

EPS = 1e-5
EPSSQ = 1e-10
# Output blocks must be (8k, 128k); halos must be even (CFA phase) and >= 9
# (RCD_BORDER).  Rows: 12px halo.  Cols: 64px halo so the buffer stays
# lane-aligned (384 + 2*64 = 512) — extra halo is wasted DMA (~33%) but
# keeps every VMEM buffer on the native tiling.
BORDER_H = 12
BORDER_W = 64
TILE_H = 72          # 72 + 24 = 96 sublanes
TILE_W = 384         # 384 + 128 = 512 lanes
BUF_H = TILE_H + 2 * BORDER_H
BUF_W = TILE_W + 2 * BORDER_W


def _sh(a, dy, dx):
    """Shifted view via circular roll; wrap garbage stays in the halo."""
    if dy:
        a = pltpu.roll(a, -dy % a.shape[0], 0)
    if dx:
        a = pltpu.roll(a, -dx % a.shape[1], 1)
    return a


def _parity_masks(cfa: CFAPattern):
    """Static (BUF_H, BUF_W) one-hot R/G/B masks for the tile buffer.
    All tiles share the same CFA phase (TILE_H/TILE_W even, pad even)."""
    rp = jax.lax.broadcasted_iota(jnp.int32, (BUF_H, BUF_W), 0) % 2
    cp = jax.lax.broadcasted_iota(jnp.int32, (BUF_H, BUF_W), 1) % 2
    pos = rp * 2 + cp
    masks = []
    for color in range(3):
        m = jnp.zeros((BUF_H, BUF_W), jnp.bool_)
        for y in range(2):
            for x in range(2):
                if cfa.color_at(y, x) == color:
                    m = m | (pos == (y * 2 + x))
        masks.append(m)
    return masks


def _rcd_tile(c, cfa: CFAPattern):
    """All four RCD steps on one resident (BUF_H, BUF_W) tile -> r, g, b."""
    is_r, is_g, is_b = _parity_masks(cfa)

    # Step 1: V/H discrimination
    hpf_v = (_sh(c, -3, 0) - _sh(c, -1, 0) - _sh(c, 1, 0) + _sh(c, 3, 0)
             - 3.0 * (_sh(c, -2, 0) + _sh(c, 2, 0)) + 6.0 * c) ** 2
    hpf_h = (_sh(c, 0, -3) - _sh(c, 0, -1) - _sh(c, 0, 1) + _sh(c, 0, 3)
             - 3.0 * (_sh(c, 0, -2) + _sh(c, 0, 2)) + 6.0 * c) ** 2
    v_stat = jnp.maximum(EPSSQ, _sh(hpf_v, -1, 0) + hpf_v + _sh(hpf_v, 1, 0))
    h_stat = jnp.maximum(EPSSQ, _sh(hpf_h, 0, -1) + hpf_h + _sh(hpf_h, 0, 1))
    vh_dir = v_stat / (v_stat + h_stat)

    def refine(d):
        nbh = 0.25 * (_sh(d, -1, -1) + _sh(d, -1, 1)
                      + _sh(d, 1, -1) + _sh(d, 1, 1))
        return jnp.where(jnp.abs(0.5 - d) < jnp.abs(0.5 - nbh), nbh, d)

    vh_disc = refine(vh_dir)

    # Step 2: ratio-correcting binomial low-pass
    lpf = (c + 0.5 * (_sh(c, -1, 0) + _sh(c, 1, 0) + _sh(c, 0, -1)
                      + _sh(c, 0, 1))
           + 0.25 * (_sh(c, -1, -1) + _sh(c, -1, 1) + _sh(c, 1, -1)
                     + _sh(c, 1, 1)))

    # Step 3: green at non-green sites
    cn1, cs1 = _sh(c, -1, 0), _sh(c, 1, 0)
    cw1, ce1 = _sh(c, 0, -1), _sh(c, 0, 1)
    ns = jnp.abs(cn1 - cs1)
    we = jnp.abs(cw1 - ce1)
    n_g = EPS + ns + jnp.abs(c - _sh(c, -2, 0)) + jnp.abs(cn1 - _sh(c, -3, 0)) \
        + jnp.abs(_sh(c, -2, 0) - _sh(c, -4, 0))
    s_g = EPS + ns + jnp.abs(c - _sh(c, 2, 0)) + jnp.abs(cs1 - _sh(c, 3, 0)) \
        + jnp.abs(_sh(c, 2, 0) - _sh(c, 4, 0))
    w_g = EPS + we + jnp.abs(c - _sh(c, 0, -2)) + jnp.abs(cw1 - _sh(c, 0, -3)) \
        + jnp.abs(_sh(c, 0, -2) - _sh(c, 0, -4))
    e_g = EPS + we + jnp.abs(c - _sh(c, 0, 2)) + jnp.abs(ce1 - _sh(c, 0, 3)) \
        + jnp.abs(_sh(c, 0, 2) - _sh(c, 0, 4))
    two = lpf + lpf
    n_e = cn1 * two / (EPS + lpf + _sh(lpf, -2, 0))
    s_e = cs1 * two / (EPS + lpf + _sh(lpf, 2, 0))
    w_e = cw1 * two / (EPS + lpf + _sh(lpf, 0, -2))
    e_e = ce1 * two / (EPS + lpf + _sh(lpf, 0, 2))
    v_est = (s_g * n_e + n_g * s_e) / (n_g + s_g)
    h_est = (w_g * e_e + e_g * w_e) / (e_g + w_g)
    g = jnp.where(is_g, c, vh_disc * h_est + (1.0 - vh_disc) * v_est)

    # Step 4.0/4.1: P/Q diagonal discrimination
    hpf_p = (_sh(c, -3, -3) - _sh(c, -1, -1) - _sh(c, 1, 1) + _sh(c, 3, 3)
             - 3.0 * (_sh(c, -2, -2) + _sh(c, 2, 2)) + 6.0 * c) ** 2
    hpf_q = (_sh(c, -3, 3) - _sh(c, -1, 1) - _sh(c, 1, -1) + _sh(c, 3, -3)
             - 3.0 * (_sh(c, -2, 2) + _sh(c, 2, -2)) + 6.0 * c) ** 2
    p_stat = jnp.maximum(EPSSQ, _sh(hpf_p, -1, -1) + hpf_p + _sh(hpf_p, 1, 1))
    q_stat = jnp.maximum(EPSSQ, _sh(hpf_q, -1, 1) + hpf_q + _sh(hpf_q, 1, -1))
    pq_disc = refine(p_stat / (p_stat + q_stat))

    # Step 4.2: opposite chroma at non-green sites
    def dg(dy, dx):
        return _sh(c, dy, dx) - _sh(g, dy, dx)

    nw = EPS + jnp.abs(_sh(c, -1, -1) - _sh(c, 1, 1)) \
        + jnp.abs(_sh(c, -1, -1) - _sh(c, -3, -3)) + jnp.abs(g - _sh(g, -2, -2))
    ne = EPS + jnp.abs(_sh(c, -1, 1) - _sh(c, 1, -1)) \
        + jnp.abs(_sh(c, -1, 1) - _sh(c, -3, 3)) + jnp.abs(g - _sh(g, -2, 2))
    sw = EPS + jnp.abs(_sh(c, -1, 1) - _sh(c, 1, -1)) \
        + jnp.abs(_sh(c, 1, -1) - _sh(c, 3, -3)) + jnp.abs(g - _sh(g, 2, -2))
    se = EPS + jnp.abs(_sh(c, -1, -1) - _sh(c, 1, 1)) \
        + jnp.abs(_sh(c, 1, 1) - _sh(c, 3, 3)) + jnp.abs(g - _sh(g, 2, 2))
    p_est = (nw * dg(1, 1) + se * dg(-1, -1)) / (nw + se)
    q_est = (ne * dg(1, -1) + sw * dg(-1, 1)) / (ne + sw)
    opp = g + (pq_disc * q_est + (1.0 - pq_disc) * p_est)
    r_nb = jnp.where(is_r, c, jnp.where(is_b, opp, 0.0))
    b_nb = jnp.where(is_b, c, jnp.where(is_r, opp, 0.0))

    # Step 4.3: chroma at green sites
    n1 = EPS + jnp.abs(g - _sh(g, -2, 0))
    s1 = EPS + jnp.abs(g - _sh(g, 2, 0))
    w1 = EPS + jnp.abs(g - _sh(g, 0, -2))
    e1 = EPS + jnp.abs(g - _sh(g, 0, 2))
    gn1, gs1 = _sh(g, -1, 0), _sh(g, 1, 0)
    gw1, ge1 = _sh(g, 0, -1), _sh(g, 0, 1)

    def at_green(p):
        sn = jnp.abs(_sh(p, -1, 0) - _sh(p, 1, 0))
        ew = jnp.abs(_sh(p, 0, -1) - _sh(p, 0, 1))
        ng = n1 + sn + jnp.abs(_sh(p, -1, 0) - _sh(p, -3, 0))
        sg = s1 + sn + jnp.abs(_sh(p, 1, 0) - _sh(p, 3, 0))
        wg = w1 + ew + jnp.abs(_sh(p, 0, -1) - _sh(p, 0, -3))
        eg = e1 + ew + jnp.abs(_sh(p, 0, 1) - _sh(p, 0, 3))
        v_e = (ng * (_sh(p, 1, 0) - gs1) + sg * (_sh(p, -1, 0) - gn1)) / (ng + sg)
        h_e = (eg * (_sh(p, 0, -1) - gw1) + wg * (_sh(p, 0, 1) - ge1)) / (eg + wg)
        return g + (vh_disc * h_e + (1.0 - vh_disc) * v_e)

    r = jnp.where(is_g, at_green(r_nb), r_nb)
    b = jnp.where(is_g, at_green(b_nb), b_nb)
    return r, g, b


def _kernel(hbm_ref, r_ref, g_ref, b_ref, tile, sem, *, cfa):
    i = pl.program_id(0)
    j = pl.program_id(1)
    copy = pltpu.make_async_copy(
        hbm_ref.at[pl.ds(i * TILE_H, BUF_H), pl.ds(j * TILE_W, BUF_W)],
        tile, sem,
    )
    copy.start()
    copy.wait()
    r, g, b = _rcd_tile(tile[:], cfa)
    sl = (slice(BORDER_H, BORDER_H + TILE_H),
          slice(BORDER_W, BORDER_W + TILE_W))
    r_ref[:] = r[sl]
    g_ref[:] = g[sl]
    b_ref[:] = b[sl]


def cdiv(a, b):
    return -(-a // b)


@functools.partial(jax.jit, static_argnames=("cfa", "interpret"))
def rcd_demosaic_pallas(x: jnp.ndarray, cfa: CFAPattern, scaler=1.0,
                        interpret: bool = False) -> jnp.ndarray:
    """(H, W) mosaic -> (3, H, W) camera RGB via the tiled Pallas kernel."""
    h, w = x.shape
    scaler = jnp.asarray(scaler, x.dtype)
    c = jnp.maximum(x, 0.0) / jnp.maximum(scaler, 1e-9)

    nh, nw = cdiv(h, TILE_H), cdiv(w, TILE_W)
    # pad: halo on top/left (even -> CFA phase preserved), and enough on
    # bottom/right for full tiles + halo
    pad_b = nh * TILE_H + 2 * BORDER_H - (h + BORDER_H)
    pad_r = nw * TILE_W + 2 * BORDER_W - (w + BORDER_W)
    cp = jnp.pad(c, ((BORDER_H, pad_b), (BORDER_W, pad_r)), mode="edge")

    grid = (nh, nw)
    out_shape = [jax.ShapeDtypeStruct((nh * TILE_H, nw * TILE_W), x.dtype)] * 3
    out_spec = pl.BlockSpec((TILE_H, TILE_W), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    kern = functools.partial(_kernel, cfa=cfa)
    r, g, b = pl.pallas_call(
        kern,
        grid=grid,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[out_spec] * 3,
        scratch_shapes=[
            pltpu.VMEM((BUF_H, BUF_W), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(cp)
    out = jnp.stack([r[:h, :w], g[:h, :w], b[:h, :w]])
    return jnp.maximum(out, 0.0) * scaler
