"""VNG4 Bayer demosaic (variable number of gradients, 4-color).

Behavioral reference: `/root/reference/src/iop/demosaic/vng.c`
(dcraw-heritage `terms`/`chood` tables :38-56 — algorithm constants;
per-class code precompute :90-129; gradient accumulation / threshold /
masked neighbor average :131-185; G1/G2 mix :195-199) and the bilinear
pre-pass `lin_interpolate` (`demosaic/basic.c:22-120`).

TPU form: the per-class interpreter bytecode becomes host-built static
term lists; at runtime each class contributes masked shifted-view
|difference| sums into 8 gradient planes, then the 8-direction masked
average runs as pure VPU selects.  The greens stay split as 4 "colors"
(G1 on the blue row, G2 on the red row) exactly like the reference's
filters4 trick, and are averaged at the end.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ..core.types import CFAPattern
from ..pixel.shifts import PaddedView

# dcraw-heritage VNG term table: (y1, x1, y2, x2, weight, gradient bits)
_TERMS = [
    (-2, -2, 0, -1, 1, 0x01), (-2, -2, 0, 0, 2, 0x01),
    (-2, -1, -1, 0, 1, 0x01), (-2, -1, 0, -1, 1, 0x02),
    (-2, -1, 0, 0, 1, 0x03), (-2, -1, 0, 1, 2, 0x01),
    (-2, 0, 0, -1, 1, 0x06), (-2, 0, 0, 0, 2, 0x02),
    (-2, 0, 0, 1, 1, 0x03), (-2, 1, -1, 0, 1, 0x04),
    (-2, 1, 0, -1, 2, 0x04), (-2, 1, 0, 0, 1, 0x06),
    (-2, 1, 0, 1, 1, 0x02), (-2, 2, 0, 0, 2, 0x04),
    (-2, 2, 0, 1, 1, 0x04), (-1, -2, -1, 0, 1, 0x80),
    (-1, -2, 0, -1, 1, 0x01), (-1, -2, 1, -1, 1, 0x01),
    (-1, -2, 1, 0, 2, 0x01), (-1, -1, -1, 1, 1, 0x88),
    (-1, -1, 1, -2, 1, 0x40), (-1, -1, 1, -1, 1, 0x22),
    (-1, -1, 1, 0, 1, 0x33), (-1, -1, 1, 1, 2, 0x11),
    (-1, 0, -1, 2, 1, 0x08), (-1, 0, 0, -1, 1, 0x44),
    (-1, 0, 0, 1, 1, 0x11), (-1, 0, 1, -2, 2, 0x40),
    (-1, 0, 1, -1, 1, 0x66), (-1, 0, 1, 0, 2, 0x22),
    (-1, 0, 1, 1, 1, 0x33), (-1, 0, 1, 2, 2, 0x10),
    (-1, 1, 1, -1, 2, 0x44), (-1, 1, 1, 0, 1, 0x66),
    (-1, 1, 1, 1, 1, 0x22), (-1, 1, 1, 2, 1, 0x10),
    (-1, 2, 0, 1, 1, 0x04), (-1, 2, 1, 0, 2, 0x04),
    (-1, 2, 1, 1, 1, 0x04), (0, -2, 0, 0, 2, 0x80),
    (0, -1, 0, 1, 2, 0x88), (0, -1, 1, -2, 1, 0x40),
    (0, -1, 1, 0, 1, 0x11), (0, -1, 2, -2, 1, 0x40),
    (0, -1, 2, -1, 1, 0x20), (0, -1, 2, 0, 1, 0x30),
    (0, -1, 2, 1, 2, 0x10), (0, 0, 0, 2, 2, 0x08),
    (0, 0, 2, -2, 2, 0x40), (0, 0, 2, -1, 1, 0x60),
    (0, 0, 2, 0, 2, 0x20), (0, 0, 2, 1, 1, 0x30),
    (0, 0, 2, 2, 2, 0x10), (0, 1, 1, 0, 1, 0x44),
    (0, 1, 1, 2, 1, 0x10), (0, 1, 2, -1, 2, 0x40),
    (0, 1, 2, 0, 1, 0x60), (0, 1, 2, 1, 1, 0x20),
    (0, 1, 2, 2, 1, 0x10), (1, -2, 1, 0, 1, 0x80),
    (1, -1, 1, 1, 1, 0x88), (1, 0, 1, 2, 1, 0x08),
    (1, 0, 2, -1, 1, 0x40), (1, 0, 2, 1, 1, 0x10),
]
_CHOOD = [(-1, -1), (-1, 0), (-1, 1), (0, 1),
          (1, 1), (1, 0), (1, -1), (0, -1)]

_FILTERS = {CFAPattern.RGGB: 0x94949494, CFAPattern.BGGR: 0x16161616,
            CFAPattern.GRBG: 0x61616161, CFAPattern.GBRG: 0x49494949}


def _fc(filters, row, col):
    return (filters >> ((((row << 1) & 14) + (col & 1)) << 1)) & 3


def _filters4(filters):
    # greens split into colors 1/3 (vng.c:66-73)
    if (filters & 3) == 1:
        return filters | 0x03030303
    return filters | 0x0C0C0C0C


@functools.lru_cache(maxsize=None)
def _class_tables(cfa: CFAPattern):
    """-> list of (row%2, col%2, terms, chood_entries, center_color) with
    terms = [(color, (y1,x1), (y2,x2), weight, (g,...)), ...]."""
    f4 = _filters4(_FILTERS[cfa])
    classes = []
    for row in range(2):
        for col in range(2):
            terms = []
            for (y1, x1, y2, x2, wt, grads) in _TERMS:
                color = _fc(f4, row + y1, col + x1)
                if _fc(f4, row + y2, col + x2) != color:
                    continue
                diag = 2 if (_fc(f4, row, col + 1) == color
                             and _fc(f4, row + 1, col) == color) else 1
                if abs(y1 - y2) == diag and abs(x1 - x2) == diag:
                    continue
                gs = tuple(g for g in range(8) if grads & (1 << g))
                terms.append((color, (y1, x1), (y2, x2), wt, gs))
            center = _fc(f4, row, col)
            chood = []
            for (y, x) in _CHOOD:
                pair = (_fc(f4, row + y, col + x) != center
                        and _fc(f4, row + 2 * y, col + 2 * x) == center)
                chood.append(((y, x), pair))
            classes.append((row, col, tuple(terms), tuple(chood), center))
    return classes


def lin_interpolate4(x: jnp.ndarray, cfa: CFAPattern):
    """Bilinear 4-color fill (basic.c:22-120): each missing color is the
    mean of its same-color neighbours in the 3x3 window."""
    h, w = x.shape
    f4 = _filters4(_FILTERS[cfa])
    import jax

    rp = jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0) % 2
    cp = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1) % 2
    pos = jnp.broadcast_to(rp * 2 + cp, (h, w))
    p = PaddedView(x, 1)
    planes = []
    for c in range(4):
        vals4 = []
        for row in range(2):
            for col in range(2):
                if _fc(f4, row, col) == c:
                    vals4.append(None)  # own site: copy
                    continue
                offs = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
                        if _fc(f4, row + dy, col + dx) == c
                        and (dy, dx) != (0, 0)]
                vals4.append(offs)
        plane = jnp.zeros((h, w), x.dtype)
        for idx, offs in enumerate(vals4):
            m = pos == idx
            if offs is None:
                plane = jnp.where(m, x, plane)
            else:
                # adjacency weights 1 << ((dy==0)+(dx==0)) (basic.c:86)
                ws = [float(1 << ((dy == 0) + (dx == 0)))
                      for dy, dx in offs]
                v = sum(wt * p.at(dy, dx)
                        for wt, (dy, dx) in zip(ws, offs)) / sum(ws)
                plane = jnp.where(m, v, plane)
        planes.append(plane)
    return planes, pos


def vng4_demosaic(x: jnp.ndarray, cfa: CFAPattern) -> jnp.ndarray:
    """(H, W) Bayer mosaic -> (3, H, W) via VNG4."""
    h, w = x.shape
    P, pos = lin_interpolate4(x, cfa)
    pP = [PaddedView(pl, 2) for pl in P]
    classes = _class_tables(cfa)

    gvals = [jnp.zeros((h, w), x.dtype) for _ in range(8)]
    sums = [jnp.zeros((h, w), x.dtype) for _ in range(4)]
    num = jnp.zeros((h, w), x.dtype)
    center_col = jnp.zeros((h, w), jnp.int32)
    for (row, col, terms, chood, center) in classes:
        m = pos == (row * 2 + col)
        gv = [None] * 8
        diff_cache = {}
        for (color, o1, o2, wt, gs) in terms:
            key = (color, o1, o2)
            if key not in diff_cache:
                diff_cache[key] = jnp.abs(pP[color].at(*o1)
                                          - pP[color].at(*o2))
            d = diff_cache[key] * float(wt)
            for g in gs:
                gv[g] = d if gv[g] is None else gv[g] + d
        for g in range(8):
            v = gv[g] if gv[g] is not None else jnp.zeros((h, w), x.dtype)
            gvals[g] = jnp.where(m, v, gvals[g])

        # masked neighbour average for this class (vng.c:160-180)
        gmin = functools.reduce(jnp.minimum, [g_ for g_ in
                                              (gv[k] if gv[k] is not None
                                               else jnp.zeros((h, w),
                                                              x.dtype)
                                               for k in range(8))])
        gmax = functools.reduce(jnp.maximum, [gv[k] if gv[k] is not None
                                              else jnp.zeros((h, w),
                                                             x.dtype)
                                              for k in range(8)])
        thold = gmin + gmax * 0.5
        csum = [jnp.zeros((h, w), x.dtype) for _ in range(4)]
        cnum = jnp.zeros((h, w), x.dtype)
        for g, ((dy, dx), pair) in enumerate(chood):
            gvg = gv[g] if gv[g] is not None else jnp.zeros((h, w),
                                                           x.dtype)
            ok = (gvg <= thold).astype(x.dtype)
            cnum = cnum + ok
            for c in range(4):
                if c == center and pair:
                    contrib = 0.5 * (P[c] + pP[c].at(2 * dy, 2 * dx))
                else:
                    contrib = pP[c].at(dy, dx)
                csum[c] = csum[c] + ok * contrib
        for c in range(4):
            sums[c] = jnp.where(m, csum[c], sums[c])
        num = jnp.where(m, cnum, num)
        center_col = jnp.where(m, center, center_col)

    gmax_all = functools.reduce(jnp.maximum, gvals)
    safe_num = jnp.maximum(num, 1.0)
    pixc = jnp.zeros((h, w), x.dtype)
    sumc = jnp.zeros((h, w), x.dtype)
    for c in range(4):
        mc = center_col == c
        pixc = jnp.where(mc, P[c], pixc)
        sumc = jnp.where(mc, sums[c], sumc)
    out4 = []
    for c in range(4):
        tot = pixc + (sums[c] - sumc) / safe_num
        tot = jnp.where(center_col == c, pixc, tot)
        tot = jnp.where(gmax_all == 0.0, P[c], tot)
        out4.append(tot)
    # mix the two greens (vng.c:195-199); no clamp — the reference's
    # vng_interpolate returns signed values
    return jnp.stack([out4[0], 0.5 * (out4[1] + out4[3]), out4[2]])


# ----------------------------------------------------------- X-Trans VNG

@functools.lru_cache(maxsize=None)
def _xtrans_class_tables(xtrans: tuple):
    """36 (row%6, col%6) classes for the 6x6 X-Trans pattern — the same
    vng.c:90-129 precompute with fcol() reading the pattern (prow=pcol=6,
    colors=3, vng.c:61-63)."""
    pat = [list(xtrans[r * 6:(r + 1) * 6]) for r in range(6)]

    def fc(row, col):
        return pat[row % 6][col % 6]

    classes = []
    for row in range(6):
        for col in range(6):
            terms = []
            for (y1, x1, y2, x2, wt, grads) in _TERMS:
                color = fc(row + y1, col + x1)
                if fc(row + y2, col + x2) != color:
                    continue
                diag = 2 if (fc(row, col + 1) == color
                             and fc(row + 1, col) == color) else 1
                if abs(y1 - y2) == diag and abs(x1 - x2) == diag:
                    continue
                gs = tuple(g for g in range(8) if grads & (1 << g))
                terms.append((color, (y1, x1), (y2, x2), wt, gs))
            center = fc(row, col)
            chood = []
            for (y, x) in _CHOOD:
                pair = (fc(row + y, col + x) != center
                        and fc(row + 2 * y, col + 2 * x) == center)
                chood.append(((y, x), pair))
            classes.append((row, col, tuple(terms), tuple(chood), center))
    return classes


def xtrans_lin_interpolate(x: jnp.ndarray, xtrans: tuple):
    """Bilinear 3-color fill over the 6x6 pattern (basic.c:22-120
    generalized): each missing color = mean of its same-color 3x3
    neighbours (the X-Trans layout guarantees every 3x3 window holds
    all three colors)."""
    import jax

    h, w = x.shape
    pat = [list(xtrans[r * 6:(r + 1) * 6]) for r in range(6)]

    def fc(row, col):
        return pat[row % 6][col % 6]

    rp = jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0) % 6
    cp = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1) % 6
    pos = jnp.broadcast_to(rp * 6 + cp, (h, w))
    p = PaddedView(x, 1)
    planes = []
    for c in range(3):
        plane = jnp.zeros((h, w), x.dtype)
        for row in range(6):
            for col in range(6):
                m = pos == (row * 6 + col)
                if fc(row, col) == c:
                    plane = jnp.where(m, x, plane)
                    continue
                offs = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
                        if (dy, dx) != (0, 0)
                        and fc(row + dy, col + dx) == c]
                # adjacency weights 1 << ((dy==0)+(dx==0)) (basic.c:86)
                ws = [float(1 << ((dy == 0) + (dx == 0)))
                      for dy, dx in offs]
                v = sum(wt * p.at(dy, dx)
                        for wt, (dy, dx) in zip(ws, offs)) / sum(ws)
                plane = jnp.where(m, v, plane)
        planes.append(plane)
    return planes, pos


def xtrans_vng_demosaic(x: jnp.ndarray, xtrans: tuple) -> jnp.ndarray:
    """(H, W) X-Trans mosaic -> (3, H, W) via 3-color VNG
    (vng_interpolate with filters == 9: prow/pcol = 6, colors = 3,
    no green mixing — vng.c:34-199).  Used standalone (method
    XTRANS|0) and as the low-frequency half of X-Trans dual."""
    h, w = x.shape
    P, pos = xtrans_lin_interpolate(x, xtrans)
    pP = [PaddedView(pl, 2) for pl in P]
    classes = _xtrans_class_tables(tuple(xtrans))

    gvals = [jnp.zeros((h, w), x.dtype) for _ in range(8)]
    sums = [jnp.zeros((h, w), x.dtype) for _ in range(3)]
    num = jnp.zeros((h, w), x.dtype)
    center_col = jnp.zeros((h, w), jnp.int32)
    diff_cache = {}   # shared across all 36 classes (same offsets recur)
    for (row, col, terms, chood, center) in classes:
        m = pos == (row * 6 + col)
        gv = [None] * 8
        for (color, o1, o2, wt, gs) in terms:
            key = (color, o1, o2)
            if key not in diff_cache:
                diff_cache[key] = jnp.abs(pP[color].at(*o1)
                                          - pP[color].at(*o2))
            d = diff_cache[key] * float(wt)
            for g in gs:
                gv[g] = d if gv[g] is None else gv[g] + d
        z = jnp.zeros((h, w), x.dtype)
        gv = [v if v is not None else z for v in gv]
        for g in range(8):
            gvals[g] = jnp.where(m, gv[g], gvals[g])

        gmin = functools.reduce(jnp.minimum, gv)
        gmax = functools.reduce(jnp.maximum, gv)
        thold = gmin + gmax * 0.5
        csum = [jnp.zeros((h, w), x.dtype) for _ in range(3)]
        cnum = jnp.zeros((h, w), x.dtype)
        for g, ((dy, dx), pair) in enumerate(chood):
            ok = (gv[g] <= thold).astype(x.dtype)
            cnum = cnum + ok
            for c in range(3):
                if c == center and pair:
                    contrib = 0.5 * (P[c] + pP[c].at(2 * dy, 2 * dx))
                else:
                    contrib = pP[c].at(dy, dx)
                csum[c] = csum[c] + ok * contrib
        for c in range(3):
            sums[c] = jnp.where(m, csum[c], sums[c])
        num = jnp.where(m, cnum, num)
        center_col = jnp.where(m, center, center_col)

    gmax_all = functools.reduce(jnp.maximum, gvals)
    safe_num = jnp.maximum(num, 1.0)
    pixc = jnp.zeros((h, w), x.dtype)
    sumc = jnp.zeros((h, w), x.dtype)
    for c in range(3):
        mc = center_col == c
        pixc = jnp.where(mc, P[c], pixc)
        sumc = jnp.where(mc, sums[c], sumc)
    out = []
    for c in range(3):
        tot = pixc + (sums[c] - sumc) / safe_num
        tot = jnp.where(center_col == c, pixc, tot)
        tot = jnp.where(gmax_all == 0.0, P[c], tot)
        out.append(tot)
    # no clamp — the reference's vng_interpolate returns signed values
    return jnp.stack(out)
