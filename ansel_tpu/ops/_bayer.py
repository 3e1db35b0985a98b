"""Bayer/X-Trans helpers shared by mosaic-stage ops.

The reference addresses CFA sites through the FC()/FCxtrans() macros and a
position index ``((row + phase_y) & 1) << 1 | ((col + phase_x) & 1)``
(`/root/reference/src/iop/rawprepare.c:385-390`).  On TPU we never gather:
parity maps are built from fused broadcasted iotas and the 4-way select
compiles to three `where`s on the VPU with zero extra HBM traffic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.types import CFAPattern


def parity_maps(h: int, w: int, phase_y: int = 0, phase_x: int = 0):
    """-> (row_parity, col_parity) int32 arrays of shape (h,1) and (1,w)."""
    rp = (jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0) + phase_y) % 2
    cp = (jax.lax.broadcasted_iota(jnp.int32, (1, w), 1) + phase_x) % 2
    return rp, cp


def position_select(vals4, h: int, w: int, phase_y: int = 0, phase_x: int = 0,
                    dtype=jnp.float32):
    """Per-pixel value from a 4-vector indexed by 2x2 CFA *position*
    (reference BL() indexing).  vals4 may be traced; returns (h, w)."""
    rp, cp = parity_maps(h, w, phase_y, phase_x)
    v = [jnp.asarray(x, dtype) for x in vals4]
    top = jnp.where(cp == 0, v[0], v[1])       # row parity 0
    bot = jnp.where(cp == 0, v[2], v[3])       # row parity 1
    return jnp.where(rp == 0, top, bot)


def color_select(vals_rgbg, cfa: CFAPattern, h: int, w: int,
                 dtype=jnp.float32):
    """Per-pixel value from (R, G, B, G2) indexed by CFA *color* at each
    site; the second green row uses G2 (reference temperature.c FC path)."""
    # map 2x2 position -> value, statically resolved from the pattern
    vals = []
    seen_green = False
    for y in range(2):
        for x in range(2):
            c = cfa.color_at(y, x)
            if c == 1:
                vals.append(vals_rgbg[3] if seen_green else vals_rgbg[1])
                seen_green = True
            else:
                vals.append(vals_rgbg[c])
    return position_select(vals, h, w, 0, 0, dtype)


def color_masks(cfa: CFAPattern, h: int, w: int, dtype=jnp.float32):
    """(3, h, w) one-hot masks: which sites carry R / G / B."""
    rp, cp = parity_maps(h, w)
    pos = rp * 2 + cp  # (h, w) in {0,1,2,3}
    masks = []
    for color in range(3):
        sel = jnp.zeros((h, w), dtype=jnp.bool_)
        for y in range(2):
            for x in range(2):
                if cfa.color_at(y, x) == color:
                    sel = sel | (pos == (y * 2 + x))
        masks.append(sel.astype(dtype))
    return jnp.stack(masks)


def xtrans_color_select(vals_rgb, pattern6, h: int, w: int, dtype=jnp.float32):
    """Per-pixel value for a 6x6 X-Trans pattern (tuple of 36 color ids)."""
    rp = jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0) % 6
    cp = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1) % 6
    idx = rp * 6 + cp  # (h, w) in 0..35
    out = jnp.zeros((h, w), dtype)
    # 36-way select folded to 3 via per-color masks
    for color in range(3):
        mask = jnp.zeros((h, w), dtype=jnp.bool_)
        for k, c in enumerate(pattern6):
            if c == color:
                mask = mask | (idx == k)
        out = jnp.where(mask, jnp.asarray(vals_rgb[color], dtype), out)
    return out


def xtrans_color_masks(pattern6, h: int, w: int, dtype=jnp.float32):
    rp = jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0) % 6
    cp = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1) % 6
    idx = rp * 6 + cp
    masks = []
    for color in range(3):
        mask = jnp.zeros((h, w), dtype=jnp.bool_)
        for k, c in enumerate(pattern6):
            if c == color:
                mask = mask | (idx == k)
        masks.append(mask.astype(dtype))
    return jnp.stack(masks)
