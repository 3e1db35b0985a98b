"""X-Trans demosaic: Markesteijn 1-pass + VNG-lite fallback.

Behavioral reference: `/root/reference/src/iop/demosaic/markesteijn.c`
(dcraw-derived; hex table construction markesteijn.c:75-105, green min/max
:57-110, directional green interpolation :115-137, solitary-green R/B
:175-230, R@B/B@R :232-250, 2x2-green fill :252-275, YPbPr derivatives +
homogeneity voting :280-400).

TPU form: the reference's 126x126 CPU tiles exist for cache locality and
are dropped; every step is whole-image shifted-view math.  Hex-geometry
neighbour offsets depend only on (row%3, col%3), so each hex read becomes a
9-way class-masked select over shifted views — still branch-free VPU code.

Known deviations (documented):
  * green min/max computed per pixel from its own hex ring (the reference
    shares one ring per red/blue pair)
  * at 2x2-green blocks the diagonal direction buffers reuse the
    horizontal/vertical chroma fill
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

ORTH = [1, 0, 0, 1, -1, 0, 0, -1, 1, 0, 0, 1]
PATT = [
    [0, 1, 0, -1, 2, 0, -1, 0, 1, 1, 1, -1, 0, 0, 0, 0],
    [0, 1, 0, -2, 1, 0, -2, 0, 1, 1, -2, -2, 1, -1, -1, 1],
]


def _color_at(pattern6, r, c):
    return pattern6[(r % 6) * 6 + (c % 6)]


def build_hex_tables(pattern6):
    """allhex[(r%3, c%3)][k] = (dy, dx); plus (sgrow, sgcol)
    (markesteijn.c:75-105)."""
    allhex = {}
    sgrow = sgcol = 0
    for row in range(3):
        for col in range(3):
            hexes = [(0, 0)] * 8
            ng = 0
            for d in range(0, 10, 2):
                g = 1 if _color_at(pattern6, row, col) == 1 else 0
                if _color_at(pattern6, row + ORTH[d],
                             col + ORTH[d + 2]) == 1:
                    ng = 0
                else:
                    ng += 1
                if ng == 4:
                    sgrow, sgcol = row, col
                if ng == g + 1:
                    for c in range(8):
                        v = ORTH[d] * PATT[g][c * 2] \
                            + ORTH[d + 1] * PATT[g][c * 2 + 1]
                        h = ORTH[d + 2] * PATT[g][c * 2] \
                            + ORTH[d + 3] * PATT[g][c * 2 + 1]
                        hexes[c ^ (g * 2 & d)] = (v, h)
            allhex[(row, col)] = hexes
    return allhex, sgrow, sgcol


def _sh(a, dy, dx):
    """Fusible shifted view (pad-once + slice; see pixel/shifts.py).
    Identical pads of the same array are merged by XLA CSE, so repeated
    calls on one base array still cost a single padded buffer."""
    if dy == 0 and dx == 0:
        return a
    from ..pixel.shifts import PaddedView

    return PaddedView(a, 6).at(dy, dx)


class _Geometry:
    """Static per-pattern geometry: class masks and hex-select helpers."""

    def __init__(self, pattern6, h, w):
        self.pattern6 = pattern6
        self.h, self.w = h, w
        self.allhex, self.sgrow, self.sgcol = build_hex_tables(pattern6)
        rr = np.arange(h) % 3
        cc = np.arange(w) % 3
        self.class_masks = {}
        for r3 in range(3):
            for c3 in range(3):
                m = (rr[:, None] == r3) & (cc[None, :] == c3)
                self.class_masks[(r3, c3)] = jnp.asarray(m)
        # color planes of the mosaic
        color = np.zeros((h, w), np.int8)
        for y in range(6):
            for x in range(6):
                color[y::6, x::6] = _color_at(pattern6, y, x)
        self.is_g = jnp.asarray(color == 1)
        self.is_r = jnp.asarray(color == 0)
        self.color = color
        # row classes relative to the solitary green
        rowc = (np.arange(h) - self.sgrow) % 3
        colc = (np.arange(w) - self.sgcol) % 3
        self.row_is_sg = jnp.asarray((rowc == 0)[:, None]
                                     & np.ones(w, bool)[None, :])
        self.sg_mask = jnp.asarray(((rowc == 0)[:, None])
                                   & ((colc == 0)[None, :])) & self.is_g
        self.green22 = jnp.asarray(((rowc != 0)[:, None])
                                   & ((colc != 0)[None, :])) & self.is_g
        # right-neighbour color at each pixel (for sg chroma order)
        self.right_is_red = jnp.asarray(
            np.roll(color, -1, axis=1) == 0)

    def hex_read(self, a, k, mult=1, neg=False):
        """value of `a` at offset mult*hex[k] (class-dependent)."""
        out = jnp.zeros_like(a)
        for cls, hexes in self.allhex.items():
            dy, dx = hexes[k]
            dy, dx = dy * mult, dx * mult
            if neg:
                dy, dx = -dy, -dx
            out = jnp.where(self.class_masks[cls], _sh(a, dy, dx), out)
        return out

    def hex_is_pair(self, k):
        """mask: hex[k] + hex[k+1] != 0 (encoded-offset sum as in the
        reference's TS-flattened ints)."""
        m = jnp.zeros((self.h, self.w), bool)
        for cls, hexes in self.allhex.items():
            s = (hexes[k][0] + hexes[k + 1][0]) * 4096 \
                + (hexes[k][1] + hexes[k + 1][1])
            if s != 0:
                m = m | self.class_masks[cls]
        return m


@functools.lru_cache(maxsize=8)
def _geometry(pattern6, h, w):
    return _Geometry(pattern6, h, w)


def xtrans_markesteijn(x: jnp.ndarray, pattern6) -> jnp.ndarray:
    """(H, W) X-Trans mosaic -> (3, H, W), Markesteijn 1-pass."""
    h, w = x.shape
    geo = _geometry(tuple(pattern6), h, w)
    is_g = geo.is_g
    fplane = x  # own-color value at every site

    # --- green min/max around non-green pixels (hex ring 0..5) -------------
    gvals = [geo.hex_read(x, k) for k in range(6)]
    gmin = functools.reduce(jnp.minimum, gvals)
    gmax = functools.reduce(jnp.maximum, gvals)

    # --- directional green interpolation (markesteijn.c:115-137) ------------
    g_h0 = geo.hex_read(x, 0)
    g_h1 = geo.hex_read(x, 1)
    g_h0x2 = geo.hex_read(x, 0, mult=2)
    g_h1x2 = geo.hex_read(x, 1, mult=2)
    color0 = 0.6796875 * (g_h1 + g_h0) - 0.1796875 * (g_h1x2 + g_h0x2)
    g_h2 = geo.hex_read(x, 2)
    g_h3 = geo.hex_read(x, 3)
    f_mh2 = geo.hex_read(fplane, 2, neg=True)
    color1 = 0.87109375 * g_h3 + 0.13 * g_h2 + 0.359375 * (x - f_mh2)
    colors = [color0, color1]
    for c in range(2):
        g_h4c = geo.hex_read(x, 4 + c)
        g_mh4c2 = geo.hex_read(x, 4 + c, mult=2, neg=True)
        f_p3 = geo.hex_read(fplane, 4 + c, mult=3)
        f_m3 = geo.hex_read(fplane, 4 + c, mult=3, neg=True)
        colors.append(0.640625 * g_h4c + 0.359375 * g_mh4c2
                      + 0.12890625 * (2 * x - f_p3 - f_m3))
    # destination permutation: flip 0<->1, 2<->3 on solitary-green rows
    flip = geo.row_is_sg
    G = []
    for d in range(4):
        cand = jnp.where(flip, colors[d ^ 1], colors[d])
        G.append(jnp.where(is_g, x, jnp.clip(cand, gmin, gmax)))

    # --- chroma planes per direction, baseline = cfa at own sites ----------
    R = [jnp.where(geo.is_r, x, 0.0) for _ in range(4)]
    B = [jnp.where(~geo.is_r & ~is_g, x, 0.0) for _ in range(4)]

    # --- solitary green R/B (markesteijn.c:175-230) --------------------------
    right_red = geo.right_is_red
    ests = {}   # (d, channel0_is_red) -> estimate*2
    diffs = {}
    for d in range(6):
        axis_h = (d % 2 == 0)  # d even: horizontal, odd: vertical
        gd = G[(0, 1, 2, 2, 3, 3)[d]]
        est_near = jnp.zeros_like(x)
        est_far = jnp.zeros_like(x)
        diff = jnp.zeros_like(x)
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
        # near neighbours carry h0 (color of the right neighbour when
        # horizontal-first); base color toggles per d
        base_is_red = jnp.where(right_red, d % 2 == 0, d % 2 == 1)
        r_est = jnp.where(base_is_red, est_near, est_far)
        b_est = jnp.where(base_is_red, est_far, est_near)
        ests[d] = (r_est, b_est)
        diffs[d] = diff

    sg = geo.sg_mask

    def put_sg(bufi, r_est, b_est):
        R[bufi] = jnp.where(sg, r_est / 2.0, R[bufi])
        B[bufi] = jnp.where(sg, b_est / 2.0, B[bufi])

    put_sg(0, *ests[0])
    put_sg(1, *ests[1])
    pick23 = diffs[2] < diffs[3]
    put_sg(2, jnp.where(pick23, ests[2][0], ests[3][0]),
           jnp.where(pick23, ests[2][1], ests[3][1]))
    pick45 = diffs[4] < diffs[5]
    put_sg(3, jnp.where(pick45, ests[4][0], ests[5][0]),
           jnp.where(pick45, ests[4][1], ests[5][1]))

    # --- R for B and B for R (markesteijn.c:232-250) -------------------------
    # axis "c": horizontal on solitary-green rows, vertical otherwise;
    # axis "h": 3 steps along the other axis
    row_sg = geo.row_is_sg
    is_rb = ~is_g & ~sg
    for d in range(4):
        gd, Rd, Bd = G[d], R[d], B[d]

        def interp(plane, dy, dx):
            pp, pm = _sh(plane, dy, dx), _sh(plane, -dy, -dx)
            gp, gm = _sh(gd, dy, dx), _sh(gd, -dy, -dx)
            return (pp + pm + 2.0 * gd - gp - gm) / 2.0

        for tgt, plane, own in ((0, R[d], geo.is_r),
                                (2, B[d], ~geo.is_r & ~is_g)):
            # fill the OPPOSITE color at this site
            site = is_rb & ~own
            # candidate along c (axis1) and along h (3x other axis)
            v_c_h = interp(plane, 0, 1)     # horizontal step 1
            v_c_v = interp(plane, 1, 0)     # vertical step 1
            v_h_h = interp(plane, 0, 3)
            v_h_v = interp(plane, 3, 0)
            c_horiz = row_sg  # axis c horizontal on sg rows
            v_c = jnp.where(c_horiz, v_c_h, v_c_v)
            v_h = jnp.where(c_horiz, v_h_v, v_h_h)
            grad_c = jnp.where(
                c_horiz,
                jnp.abs(gd - _sh(gd, 0, 1)) + jnp.abs(gd - _sh(gd, 0, -1)),
                jnp.abs(gd - _sh(gd, 1, 0)) + jnp.abs(gd - _sh(gd, -1, 0)))
            grad_h = jnp.where(
                c_horiz,
                jnp.abs(gd - _sh(gd, 3, 0)) + jnp.abs(gd - _sh(gd, -3, 0)),
                jnp.abs(gd - _sh(gd, 0, 3)) + jnp.abs(gd - _sh(gd, 0, -3)))
            d_odd = d % 2 == 1
            use_c = ((d > 1)
                     | jnp.where(c_horiz, jnp.asarray(not d_odd),
                                 jnp.asarray(d_odd))
                     | (grad_c < 2.0 * grad_h))
            val = jnp.where(use_c, v_c, v_h)
            if tgt == 0:
                R[d] = jnp.where(site, val, R[d])
            else:
                B[d] = jnp.where(site, val, B[d])

    # --- fill R/B at 2x2 green blocks (markesteijn.c:252-275) ---------------
    g22 = geo.green22
    for bufi, k in ((0, 0), (1, 2)):
        gd = G[bufi]
        pair = geo.hex_is_pair(k)
        for plane_list in (R, B):
            p = plane_list[bufi]
            p_h0 = geo.hex_read(p, k)
            p_h1 = geo.hex_read(p, k + 1)
            g_h0 = geo.hex_read(gd, k)
            g_h1 = geo.hex_read(gd, k + 1)
            v_pair = ((3.0 * gd - 2.0 * g_h0 - g_h1)
                      + 2.0 * p_h0 + p_h1) / 3.0
            v_line = ((2.0 * gd - g_h0 - g_h1) + p_h0 + p_h1) / 2.0
            val = jnp.where(pair, v_pair, v_line)
            plane_list[bufi] = jnp.where(g22, val, p)
    # diagonal buffers reuse the h/v fills at green blocks (deviation)
    for bufi in (2, 3):
        R[bufi] = jnp.where(g22, R[bufi - 2], R[bufi])
        B[bufi] = jnp.where(g22, B[bufi - 2], B[bufi])

    # --- homogeneity voting (markesteijn.c:280-400) --------------------------
    DIRS = [(0, 1), (1, 0), (1, 1), (1, -1)]
    drv = []
    for d in range(4):
        y = 0.2627 * R[d] + 0.6780 * G[d] + 0.0593 * B[d]
        u = (B[d] - y) * 0.56433
        v = (R[d] - y) * 0.67815
        dy, dx = DIRS[d]
        dd = jnp.zeros_like(x)
        for ch in (y, u, v):
            dd = dd + (2 * ch - _sh(ch, dy, dx) - _sh(ch, -dy, -dx)) ** 2
        drv.append(dd)

    tr = functools.reduce(jnp.minimum, drv) * 8.0
    homos = []
    for d in range(4):
        cnt = jnp.zeros_like(x)
        for vv in (-1, 0, 1):
            for hh in (-1, 0, 1):
                cnt = cnt + (_sh(drv[d], vv, hh) <= tr).astype(x.dtype)
        # 5x5 box sum of the counts
        s = cnt
        acc = jnp.zeros_like(x)
        for vv in range(-2, 3):
            for hh in range(-2, 3):
                acc = acc + _sh(s, vv, hh)
        homos.append(acc)

    maxval = functools.reduce(jnp.maximum, homos)
    thresh = maxval - maxval / 8.0
    num = jnp.zeros((3, h, w), x.dtype)
    den = jnp.zeros_like(x)
    for d in range(4):
        sel = (homos[d] >= thresh).astype(x.dtype)
        num = num + sel[None] * jnp.stack([R[d], G[d], B[d]])
        den = den + sel
    out = num / jnp.maximum(den, 1.0)[None]
    return jnp.maximum(out, 0.0)


def xtrans_demosaic(x: jnp.ndarray, pattern6) -> jnp.ndarray:
    """Default X-Trans entry: Markesteijn 1-pass."""
    return xtrans_markesteijn(x, tuple(pattern6))


def xtrans_vng_lite(x: jnp.ndarray, pattern6) -> jnp.ndarray:
    """Normalized-convolution fallback (fast preview-quality path)."""
    from ..ops import _bayer

    h, w = x.shape
    masks = _bayer.xtrans_color_masks(pattern6, h, w, x.dtype)
    k5 = [[1, 2, 3, 2, 1], [2, 4, 6, 4, 2], [3, 6, 9, 6, 3],
          [2, 4, 6, 4, 2], [1, 2, 3, 2, 1]]

    def conv(p):
        # k5 = outer([1,2,3,2,1], [1,2,3,2,1]) — separable shifted adds
        # (single-channel TPU convs im2col-pad to 128 lanes)
        from ..pixel.shifts import sep_filter

        return sep_filter(p, [1.0, 2.0, 3.0, 2.0, 1.0])

    g = jnp.where(masks[1] > 0, x,
                  conv(x * masks[1]) / jnp.maximum(conv(masks[1]), 1e-6))
    out = [None, g, None]
    for ci in (0, 2):
        m = masks[ci]
        diff = (x - g) * m
        out[ci] = jnp.maximum(
            g + conv(diff) / jnp.maximum(conv(m), 1e-6), 0.0)
    return jnp.stack(out)
