"""X-Trans Markesteijn demosaic (1-pass and 3-pass) as a Pallas TPU kernel.

Behavioral reference: `/root/reference/src/iop/demosaic/markesteijn.c`
(hex tables :75-105, multipass green recalc :273-302, solitary-green R/B
:305-355, R@B/B@R :357-373, 2x2-green fill :376-399, YPbPr derivatives +
homogeneity voting :412-520).  The reference's 126x126 CPU cache tiles
become (TILE_H, TILE_W) VMEM-resident halo tiles: one DMA per tile, every
step a VPU elementwise op on the resident buffer, circular rolls wrapping
garbage only into the discarded halo (same pattern as kernels/rcd_pallas).

Class-dependent hex offsets: geometry repeats on a (3, 3) lattice, so each
hex read is a 9-way class-masked select over rolled views of the resident
tile — pure VPU selects, no gathers.  ndir = 4 (1-pass) or 8 (3-pass with
two green-refinement sweeps, exactly the reference's multipass loop).

Fixed vs kernels/markesteijn.py (whole-image): the 2x2-green fill populates
all four direction buffers from hex pairs (0,1)/(2,3)/(4,5)/(6,7)
(markesteijn.c:385-399) instead of copying h/v into the diagonals.
Remaining documented deviation: green min/max is computed per pixel from
its own hex ring (the reference shares one ring per red/blue pair).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .markesteijn import build_hex_tables

BORDER_H = 24      # >= 17 (3-pass padding), multiple of 8
BORDER_W = 64      # lane alignment
TILE_H = 48        # multiple of 24 (6-phase + 8-sublane)
TILE_W = 384       # multiple of 384 (6-phase + 128-lane)
BUF_H = TILE_H + 2 * BORDER_H
BUF_W = TILE_W + 2 * BORDER_W


def _sh(a, dy, dx):
    if dy:
        a = pltpu.roll(a, -dy % a.shape[0], 0)
    if dx:
        a = pltpu.roll(a, -dx % a.shape[1], 1)
    return a


class _TileGeo:
    """Static geometry for the (BUF_H, BUF_W) buffer whose top-left maps to
    image coords (-BORDER_H, -BORDER_W) modulo the 6x6 pattern."""

    def __init__(self, pattern6):
        self.pattern6 = pattern6
        self.allhex, self.sgrow, self.sgcol = build_hex_tables(pattern6)
        # in-buffer phases (TILE sizes are multiples of 6 -> same for all
        # tiles)
        self.ph_r = (-BORDER_H) % 6
        self.ph_c = (-BORDER_W) % 6

    def masks(self, dtype=jnp.bool_):
        """-> dict with class masks (row%3, col%3), color masks, sg masks."""
        by = jax.lax.broadcasted_iota(jnp.int32, (BUF_H, BUF_W), 0)
        bx = jax.lax.broadcasted_iota(jnp.int32, (BUF_H, BUF_W), 1)
        r6 = (by + self.ph_r) % 6
        c6 = (bx + self.ph_c) % 6
        color = jnp.zeros((BUF_H, BUF_W), jnp.int32)
        for y in range(6):
            for x in range(6):
                col = self.pattern6[y * 6 + x]
                color = jnp.where((r6 == y) & (c6 == x), col, color)
        r3 = r6 % 3
        c3 = c6 % 3
        cls = {(a, b): (r3 == a) & (c3 == b)
               for a in range(3) for b in range(3)}
        rowsg = ((by + self.ph_r) - self.sgrow) % 3 == 0
        colsg = ((bx + self.ph_c) - self.sgcol) % 3 == 0
        is_g = color == 1
        return dict(cls=cls, is_g=is_g, is_r=color == 0,
                    is_b=color == 2, row_sg=rowsg,
                    sg=rowsg & colsg & is_g,
                    g22=(~rowsg) & (~colsg) & is_g)

    def hex_read(self, m, a, k, mult=1, neg=False):
        out = a
        first = True
        for ccls, hexes in self.allhex.items():
            dy, dx = hexes[k]
            dy, dx = dy * mult, dx * mult
            if neg:
                dy, dx = -dy, -dx
            v = _sh(a, dy, dx)
            out = v if first else jnp.where(m["cls"][ccls], v, out)
            first = False
        return out

    def hex_pair_mask(self, m, k):
        # the pair-sum-nonzero predicate is static per class, so the mask
        # is a pure OR of class masks (a bool-valued select would force an
        # i8->i1 trunc Mosaic can't lower)
        mask = None
        for ccls, hexes in self.allhex.items():
            s = (hexes[k][0] + hexes[k + 1][0]) * 4096 \
                + (hexes[k][1] + hexes[k + 1][1])
            if s != 0:
                v = m["cls"][ccls]
                mask = v if mask is None else (mask | v)
        if mask is None:
            mask = jnp.zeros((BUF_H, BUF_W), jnp.bool_)
        return mask


def _green_dirs(geo, m, x, gmin, gmax):
    """Directional green interpolation (markesteijn.c:115-137 semantics)."""
    g_h0 = geo.hex_read(m, x, 0)
    g_h1 = geo.hex_read(m, x, 1)
    g_h0x2 = geo.hex_read(m, x, 0, mult=2)
    g_h1x2 = geo.hex_read(m, x, 1, mult=2)
    color0 = 0.6796875 * (g_h1 + g_h0) - 0.1796875 * (g_h1x2 + g_h0x2)
    g_h2 = geo.hex_read(m, x, 2)
    g_h3 = geo.hex_read(m, x, 3)
    f_mh2 = geo.hex_read(m, x, 2, neg=True)
    color1 = 0.87109375 * g_h3 + 0.13 * g_h2 + 0.359375 * (x - f_mh2)
    colors = [color0, color1]
    for c in range(2):
        g_h4c = geo.hex_read(m, x, 4 + c)
        g_mh4c2 = geo.hex_read(m, x, 4 + c, mult=2, neg=True)
        f_p3 = geo.hex_read(m, x, 4 + c, mult=3)
        f_m3 = geo.hex_read(m, x, 4 + c, mult=3, neg=True)
        colors.append(0.640625 * g_h4c + 0.359375 * g_mh4c2
                      + 0.12890625 * (2 * x - f_p3 - f_m3))
    flip = m["row_sg"]
    G = []
    for d in range(4):
        cand = jnp.where(flip, colors[d ^ 1], colors[d])
        G.append(jnp.where(m["is_g"], x, jnp.clip(cand, gmin, gmax)))
    return G


def _sg_rb(geo, m, x, G, R, B, right_red):
    """Solitary-green R/B (markesteijn.c:305-355) for 4 buffers."""
    ests, diffs = {}, {}
    for d in range(6):
        axis_h = (d % 2 == 0)
        gd = G[(0, 1, 2, 2, 3, 3)[d]]
        est_near = est_far = None
        diff = 0.0
        for cdist, dist in ((0, 1), (1, 2)):
            dy, dx = (0, dist) if axis_h else (dist, 0)
            gp, gm = _sh(gd, dy, dx), _sh(gd, -dy, -dx)
            fp, fm = _sh(x, dy, dx), _sh(x, -dy, -dx)
            gterm = 2 * gd - gp - gm
            est = gterm + fp + fm
            if cdist == 0:
                est_near = est
            else:
                est_far = est
            if d > 1:
                diff = diff + (gp - gm - fp + fm) ** 2 + gterm**2
        # (mosaic can't lower where(bool, py_bool, py_bool) — use mask ops)
        base_is_red = right_red if axis_h else ~right_red
        ests[d] = (jnp.where(base_is_red, est_near, est_far),
                   jnp.where(base_is_red, est_far, est_near))
        diffs[d] = diff

    sg = m["sg"]

    def put(bufi, r_est, b_est):
        R[bufi] = jnp.where(sg, r_est / 2.0, R[bufi])
        B[bufi] = jnp.where(sg, b_est / 2.0, B[bufi])

    put(0, *ests[0])
    put(1, *ests[1])
    pick23 = diffs[2] < diffs[3]
    put(2, jnp.where(pick23, ests[2][0], ests[3][0]),
        jnp.where(pick23, ests[2][1], ests[3][1]))
    pick45 = diffs[4] < diffs[5]
    put(3, jnp.where(pick45, ests[4][0], ests[5][0]),
        jnp.where(pick45, ests[4][1], ests[5][1]))
    return R, B


def _rb_opposite(geo, m, G, R, B):
    """R@B and B@R (markesteijn.c:357-373)."""
    row_sg = m["row_sg"]
    is_rb = (~m["is_g"])
    for d in range(4):
        gd = G[d]

        def interp(plane, dy, dx):
            pp, pm = _sh(plane, dy, dx), _sh(plane, -dy, -dx)
            gp, gm = _sh(gd, dy, dx), _sh(gd, -dy, -dx)
            return (pp + pm + 2.0 * gd - gp - gm) / 2.0

        grad_c = jnp.where(
            row_sg,
            jnp.abs(gd - _sh(gd, 0, 1)) + jnp.abs(gd - _sh(gd, 0, -1)),
            jnp.abs(gd - _sh(gd, 1, 0)) + jnp.abs(gd - _sh(gd, -1, 0)))
        grad_h = jnp.where(
            row_sg,
            jnp.abs(gd - _sh(gd, 3, 0)) + jnp.abs(gd - _sh(gd, -3, 0)),
            jnp.abs(gd - _sh(gd, 0, 3)) + jnp.abs(gd - _sh(gd, 0, -3)))
        d_even = (d % 2 == 0)
        parity_ok = row_sg if d_even else ~row_sg
        use_c = None if d > 1 else parity_ok | (grad_c < 2.0 * grad_h)
        for plane_list, own in ((R, m["is_r"]), (B, m["is_b"])):
            plane = plane_list[d]
            v_c = jnp.where(row_sg, interp(plane, 0, 1),
                            interp(plane, 1, 0))
            if use_c is None:
                val = v_c
            else:
                v_h = jnp.where(row_sg, interp(plane, 3, 0),
                                interp(plane, 0, 3))
                val = jnp.where(use_c, v_c, v_h)
            site = is_rb & (~own) & (~m["sg"])
            plane_list[d] = jnp.where(site, val, plane)
    return R, B


def _g22_fill(geo, m, G, R, B, ndir):
    """2x2-green R/B fill (markesteijn.c:376-399): buffer d uses hex pair
    (2d, 2d+1)."""
    g22 = m["g22"]
    for bufi in range(min(4, ndir)):
        k = 2 * bufi
        gd = G[bufi]
        pair = geo.hex_pair_mask(m, k)
        g_h0 = geo.hex_read(m, gd, k)
        g_h1 = geo.hex_read(m, gd, k + 1)
        for plane_list in (R, B):
            p = plane_list[bufi]
            p_h0 = geo.hex_read(m, p, k)
            p_h1 = geo.hex_read(m, p, k + 1)
            v_pair = ((3.0 * gd - 2.0 * g_h0 - g_h1)
                      + 2.0 * p_h0 + p_h1) / 3.0
            v_line = ((2.0 * gd - g_h0 - g_h1) + p_h0 + p_h1) / 2.0
            plane_list[bufi] = jnp.where(g22, jnp.where(pair, v_pair,
                                                        v_line), p)
    return R, B


def _green_recalc(geo, m, x, G, R, B, gmin, gmax):
    """Multipass green refinement (markesteijn.c:283-302): for non-green
    pixels, d = 3..5 each update one direction buffer using the previous
    pass's interpolated own-color plane."""
    # own-color plane of each buffer at this site
    flip = m["row_sg"]  # !((row-sgrow)%3) true on sg rows
    newG = list(G)
    for d in range(3, 6):
        # buffer index (d-2) ^ flip
        bi_noflip = d - 2
        bi_flip = (d - 2) ^ 1
        for bi, mask_rows in ((bi_noflip, ~flip), (bi_flip, flip)):
            own = jnp.where(m["is_r"], R[bi], B[bi])  # f-channel plane
            g_h = geo.hex_read(m, newG[bi], d)
            g_m2h = geo.hex_read(m, newG[bi], d, mult=2, neg=True)
            f_h = geo.hex_read(m, own, d)
            f_m2h = geo.hex_read(m, own, d, mult=2, neg=True)
            val = (g_m2h + 2.0 * g_h - f_m2h - 2.0 * f_h + 3.0 * x) / 3.0
            val = jnp.clip(val, gmin, gmax)
            upd = mask_rows & (~m["is_g"])
            newG[bi] = jnp.where(upd, val, newG[bi])
    return newG


def _vote(m, x, G, R, B, ndir):
    """YPbPr derivatives + homogeneity voting (markesteijn.c:412-520)."""
    DIRS = [(0, 1), (1, 0), (1, 1), (1, -1)]
    drv = []
    for d in range(ndir):
        y = 0.2627 * R[d] + 0.6780 * G[d] + 0.0593 * B[d]
        u = (B[d] - y) * 0.56433
        v = (R[d] - y) * 0.67815
        dy, dx = DIRS[d % 4]
        dd = 0.0
        for ch in (y, u, v):
            dd = dd + (2 * ch - _sh(ch, dy, dx) - _sh(ch, -dy, -dx)) ** 2
        drv.append(dd)

    tr = functools.reduce(jnp.minimum, drv) * 8.0
    homos = []
    for d in range(ndir):
        cnt = 0.0
        for vv in (-1, 0, 1):
            for hh in (-1, 0, 1):
                cnt = cnt + (_sh(drv[d], vv, hh) <= tr).astype(x.dtype)
        acc = 0.0
        for vv in range(-2, 3):
            for hh in range(-2, 3):
                acc = acc + _sh(cnt, vv, hh)
        homos.append(acc)

    maxval = functools.reduce(jnp.maximum, homos)
    thresh = maxval - maxval / 8.0
    num_r = num_g = num_b = 0.0
    den = 0.0
    for d in range(ndir):
        sel = (homos[d] >= thresh).astype(x.dtype)
        num_r = num_r + sel * R[d]
        num_g = num_g + sel * G[d]
        num_b = num_b + sel * B[d]
        den = den + sel
    den = jnp.maximum(den, 1.0)
    return num_r / den, num_g / den, num_b / den


def _mark_tile(x, pattern6, passes):
    geo = _TileGeo(pattern6)
    m = geo.masks()
    by = jax.lax.broadcasted_iota(jnp.int32, (BUF_H, BUF_W), 0)
    bx = jax.lax.broadcasted_iota(jnp.int32, (BUF_H, BUF_W), 1)
    # right-neighbour color (for sg chroma ordering)
    r6 = (by + geo.ph_r) % 6
    c6r = (bx + geo.ph_c + 1) % 6
    right_red = jnp.zeros((BUF_H, BUF_W), jnp.bool_)
    for y in range(6):
        for xx_ in range(6):
            if pattern6[y * 6 + xx_] == 0:
                right_red = right_red | ((r6 == y) & (c6r == xx_))

    gvals = [geo.hex_read(m, x, k) for k in range(6)]
    gmin = functools.reduce(jnp.minimum, gvals)
    gmax = functools.reduce(jnp.maximum, gvals)

    def one_set(G):
        R = [jnp.where(m["is_r"], x, 0.0) for _ in range(4)]
        B = [jnp.where(m["is_b"], x, 0.0) for _ in range(4)]
        R, B = _sg_rb(geo, m, x, G, R, B, right_red)
        R, B = _rb_opposite(geo, m, G, R, B)
        R, B = _g22_fill(geo, m, G, R, B, 4)
        return R, B

    G = _green_dirs(geo, m, x, gmin, gmax)
    R, B = one_set(G)
    if passes == 1:
        return _vote(m, x, G, R, B, 4)

    # 3-pass: refine a second buffer set twice (markesteijn.c:273-302)
    G2 = list(G)
    R2, B2 = list(R), list(B)
    for _ in range(2):
        G2 = _green_recalc(geo, m, x, G2, R2, B2, gmin, gmax)
        R2, B2 = one_set(G2)
    return _vote(m, x, G + G2, R + R2, B + B2, 8)


def _kernel(hbm_ref, r_ref, g_ref, b_ref, tile, sem, *, pattern6, passes):
    i = pl.program_id(0)
    j = pl.program_id(1)
    copy = pltpu.make_async_copy(
        hbm_ref.at[pl.ds(i * TILE_H, BUF_H), pl.ds(j * TILE_W, BUF_W)],
        tile, sem)
    copy.start()
    copy.wait()
    r, g, b = _mark_tile(tile[:], pattern6, passes)
    sl = (slice(BORDER_H, BORDER_H + TILE_H),
          slice(BORDER_W, BORDER_W + TILE_W))
    r_ref[:] = r[sl]
    g_ref[:] = g[sl]
    b_ref[:] = b[sl]


def _cdiv(a, b):
    return -(-a // b)


@functools.partial(jax.jit,
                   static_argnames=("pattern6", "passes", "interpret"))
def xtrans_markesteijn_pallas(x: jnp.ndarray, pattern6, passes: int = 1,
                              interpret: bool = False) -> jnp.ndarray:
    """(H, W) X-Trans mosaic -> (3, H, W), Markesteijn via Pallas tiles."""
    h, w = x.shape
    nh, nw = _cdiv(h, TILE_H), _cdiv(w, TILE_W)
    pad_b = nh * TILE_H + 2 * BORDER_H - (h + BORDER_H)
    pad_r = nw * TILE_W + 2 * BORDER_W - (w + BORDER_W)
    # edge pad: halo values near the image border carry the wrong CFA
    # phase; that garbage stays within BORDER px of the frame edge (the
    # reference runs its own simplified border interpolation there too)
    cp = jnp.pad(x, ((BORDER_H, pad_b), (BORDER_W, pad_r)), mode="edge")

    out_shape = [jax.ShapeDtypeStruct((nh * TILE_H, nw * TILE_W), x.dtype)] * 3
    out_spec = pl.BlockSpec((TILE_H, TILE_W), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    kern = functools.partial(_kernel, pattern6=tuple(pattern6),
                             passes=passes)
    # 3-pass holds ~8x (G,R,B) direction buffers live for the final vote;
    # raise the scoped VMEM ceiling (v5e has 128MB physical VMEM)
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    r, g, b = pl.pallas_call(
        kern,
        grid=(nh, nw),
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[out_spec] * 3,
        scratch_shapes=[
            pltpu.VMEM((BUF_H, BUF_W), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=params,
        interpret=interpret,
    )(cp)
    return jnp.maximum(jnp.stack([r[:h, :w], g[:h, :w], b[:h, :w]]), 0.0)
