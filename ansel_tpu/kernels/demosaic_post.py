"""Demosaic pre/post passes: green equilibration + color smoothing.

Reference: `/root/reference/src/iop/demosaic/basic.c` —
green_equilibration_lavg (:248-295, local 2x2-green imbalance fix),
green_equilibration_favg (:296-330, global green-phase ratio),
color_smoothing (:192-246, N passes of 9-point median on R-G / B-G).

TPU form: whole-image shifted views (pixel/shifts.PaddedView); the 9-point
median is the reference's 19-comparator sorting network as elementwise
min/max — branch-free VPU code.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.types import CFAPattern
from ..pixel.shifts import PaddedView

GREEN_EQ_NO = 0
GREEN_EQ_LOCAL = 1
GREEN_EQ_FULL = 2
GREEN_EQ_BOTH = 3


def _green_phase_masks(cfa: CFAPattern, h, w):
    """(g1_mask, g2_mask): the two green sites of the 2x2 cell; g1 = the
    green the reference anchors at (oj, oi)."""
    yy, xx = np.mgrid[0:h, 0:w]
    g = np.zeros((h, w), bool)
    for y in range(2):
        for x in range(2):
            if cfa.color_at(y, x) == 1:
                g |= ((yy % 2) == y) & ((xx % 2) == x)
    # first green in reading order = g1
    first = None
    for y in range(2):
        for x in range(2):
            if cfa.color_at(y, x) == 1:
                first = (y, x)
                break
        if first:
            break
    g1 = ((yy % 2) == first[0]) & ((xx % 2) == first[1])
    return jnp.asarray(g1), jnp.asarray(g & ~np.asarray(g1))


def _lavg_phase(cfa: CFAPattern):
    """The green phase the reference anchors at (basic.c:253-257: first
    green site at/after (2, 2) probing (oj, oi) -> (oj+1, oi) ->
    (oj+1, oi+1) -> (oj, oi+1))."""
    for oj, oi in ((2, 2), (3, 2), (3, 3), (2, 3)):
        if cfa.color_at(oj % 2, oi % 2) == 1:
            return oj % 2, oi % 2
    return 0, 0


def green_eq_lavg(x, cfa: CFAPattern, thr: float):
    """Local average equilibration (basic.c:248-295): corrects ONE green
    phase toward its diagonal (other-phase) neighbours."""
    h, w = x.shape
    py, px = _lavg_phase(cfa)
    yy, xx = np.mgrid[0:h, 0:w]
    is_g = jnp.asarray(((yy % 2) == py) & ((xx % 2) == px))
    pv = PaddedView(x, 2)
    o1 = [pv.at(-1, -1), pv.at(-1, 1), pv.at(1, -1), pv.at(1, 1)]
    o2 = [pv.at(-2, 0), pv.at(2, 0), pv.at(0, -2), pv.at(0, 2)]
    m1 = sum(o1) / 4.0
    m2 = sum(o2) / 4.0
    c1 = (jnp.abs(o1[0] - o1[1]) + jnp.abs(o1[0] - o1[2])
          + jnp.abs(o1[0] - o1[3]) + jnp.abs(o1[1] - o1[2])
          + jnp.abs(o1[2] - o1[3]) + jnp.abs(o1[1] - o1[3])) / 6.0
    c2 = (jnp.abs(o2[0] - o2[1]) + jnp.abs(o2[0] - o2[2])
          + jnp.abs(o2[0] - o2[3]) + jnp.abs(o2[1] - o2[2])
          + jnp.abs(o2[2] - o2[3]) + jnp.abs(o2[1] - o2[3])) / 6.0
    ok = ((m2 > 0.0) & (m1 > 0.0) & (m1 / jnp.maximum(m2, 1e-12) < 2.0)
          & (x < 0.95) & (c1 < thr) & (c2 < thr) & is_g)
    return jnp.where(ok, x * m1 / jnp.maximum(m2, 1e-12), x)


def green_eq_favg(x, cfa: CFAPattern):
    """Global green-phase ratio equilibration (basic.c:296-330)."""
    h, w = x.shape
    g1, g2 = _green_phase_masks(cfa, h, w)
    sum1 = jnp.sum(jnp.where(g1, x, 0.0))
    sum2 = jnp.sum(jnp.where(g2, x, 0.0))
    ratio = jnp.where((sum1 > 0) & (sum2 > 0), sum2 / jnp.maximum(sum1, 1e-12),
                      1.0)
    return jnp.where(g1, x * ratio, x)


def apply_green_eq(x, cfa: CFAPattern, mode: int, thr: float):
    if mode in (GREEN_EQ_FULL, GREEN_EQ_BOTH):
        x = green_eq_favg(x, cfa)
    if mode in (GREEN_EQ_LOCAL, GREEN_EQ_BOTH):
        x = green_eq_lavg(x, cfa, thr)
    return x


def _median9(vals):
    """Optimal 9-element median sorting network (basic.c:219-240)."""
    v = list(vals)

    def sw(a, b):
        lo = jnp.minimum(v[a], v[b])
        hi = jnp.maximum(v[a], v[b])
        v[a], v[b] = lo, hi

    for a, b in ((1, 2), (4, 5), (7, 8), (0, 1), (3, 4), (6, 7), (1, 2),
                 (4, 5), (7, 8), (0, 3), (5, 8), (4, 7), (3, 6), (1, 4),
                 (2, 5), (4, 7), (4, 2), (6, 4), (4, 2)):
        sw(a, b)
    return v[4]


def color_smoothing(rgb, passes: int):
    """(3, H, W): N passes of 9-point median on (R-G) and (B-G)
    (basic.c:192-246); borders keep their values."""
    r, g, b = rgb[0], rgb[1], rgb[2]
    for _ in range(passes):
        for idx in (0, 2):
            plane = r if idx == 0 else b
            diff = plane - g
            pv = PaddedView(diff, 1)
            med = _median9([pv.at(dy, dx) for dy in (-1, 0, 1)
                            for dx in (-1, 0, 1)])
            new = jnp.maximum(med + g, 0.0)
            if idx == 0:
                r = new
            else:
                b = new
    return jnp.stack([r, g, b])
