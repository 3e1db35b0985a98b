"""Bilateral-grid SLICE as a Pallas TPU kernel.

Reference behavior: `dt_bilateral_slice` (/root/reference/src/pixel/
bilateral.c) — per-pixel trilinear read of the blurred (x, y, L) grid.
The XLA formulation (pixel/bilateralgrid.py) materializes the spatially
upsampled (D, C, blk, W) tensor per row block and contracts the range
axis with a D-step select chain; measured on a v5e chip that pipeline
runs at ~60 ms/channel at 24 MP — an order of magnitude over its op
count, lost to layout transposes and lax.map serialization.

Pallas design: the grid is SMALL (D, C, gh, gw ≈ 13 MB), so each output
tile's slab of it fits VMEM trivially.  The host pre-upsamples only the
COLUMN axis at grid-row resolution (Gxy = (D, C, gh, Wp), a cheap
phase-unrolled XLA pass over ~gh rows), then each (th, tw) tile:

  * DMAs the (D, C, GHH, tw) grid slab it needs (GHH = th/ss + 3 rows,
    dynamic row start clamped host-style in-kernel — the halo-tile
    pattern of eaw/rcd_pallas),
  * computes the row hat weights from iota (cell-centered bilinear,
    clamped like pixel/bilateralgrid.upsample_axis),
  * unrolls the D range bins: sel_k(z) triangle weight (channel-shared)
    times the row-interpolated grid plane, all VMEM-resident.

Traffic: one read of z, one write of out, tiny grid slabs — the op
becomes VPU-bound at its natural ~D*(C+1) ops/pixel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 64
TILE_W = 512


def _cdiv(a, b):
    return -(-a // b)


def _kernel(z_ref, gxy_ref, o_ref, slab, sem, *, ss, D, C, gh, gh_pad,
            ghh):
    i = pl.program_id(0)
    j = pl.program_id(1)
    # grid-row window for this tile (host-side clamp logic, scalar).
    # Mosaic requires the DMA start on the sublane-adjacent dim to be
    # PROVABLY 8-divisible, so the row start is computed as t*8 (the
    # multiply is last — structurally divisible) and the slab carries up
    # to 7 alignment-slack rows whose hat weights are exactly zero.
    r0 = i * TILE_H
    gy0 = (r0 + 0.5) / float(ss) - 0.5
    t = jnp.clip(jnp.floor_divide(jnp.floor(gy0).astype(jnp.int32), 8),
                 0, (gh_pad - ghh) // 8)
    q_start = t * 8
    copy = pltpu.make_async_copy(
        gxy_ref.at[:, :, pl.ds(q_start, ghh),
                   pl.ds(j * TILE_W, TILE_W)],
        slab, sem)
    copy.start()
    copy.wait()

    # per-row clamped grid coordinate and hat weights vs the ghh slab rows
    rows = (jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
            + r0).astype(jnp.float32)
    gy = jnp.clip((rows + 0.5) / float(ss) - 0.5, 0.0, float(gh - 1))
    qs = q_start.astype(jnp.float32)
    wq = [jnp.maximum(0.0, 1.0 - jnp.abs(gy - (qs + q)))
          for q in range(ghh)]

    z = z_ref[:]
    b0 = jnp.floor(z)
    f = z - b0

    acc = [jnp.zeros((TILE_H, TILE_W), jnp.float32) for _ in range(C)]
    for k in range(D):
        sel = (b0 == float(k)).astype(jnp.float32) * (1.0 - f)
        if k:
            sel = sel + (b0 == float(k - 1)).astype(jnp.float32) * f
        for c in range(C):
            plane = wq[0] * slab[k, c, 0][None, :]
            for q in range(1, ghh):
                plane = plane + wq[q] * slab[k, c, q][None, :]
            acc[c] = acc[c] + sel * plane
    for c in range(C):
        o_ref[c] = acc[c]


def slice_grid(base_grid: jnp.ndarray, z: jnp.ndarray, ss: int,
               interpret: bool = False) -> jnp.ndarray:
    """Trilinear-slice the blurred grid at per-pixel (y/ss, x/ss, z).

    base_grid: (D, C, gh, gw) — blurred, density-normalized grid.
    z: (Hp, Wp) range coordinate in [0, D-1] (Hp = gh*ss, Wp = gw*ss).
    Returns (C, Hp, Wp) float32.
    """
    from ..pixel.bilateralgrid import upsample_axis

    D, C, gh, gw = base_grid.shape
    Hp, Wp = z.shape
    # column upsample at grid-row resolution (cheap: gh rows)
    gxy = upsample_axis(base_grid, ss, axis=3)          # (D, C, gh, Wp)
    ph = (-Hp) % TILE_H
    pw = (-Wp) % TILE_W
    if ph or pw:
        z = jnp.pad(z, ((0, ph), (0, pw)), mode="edge")
        gxy = jnp.pad(gxy, ((0, 0), (0, 0), (0, 0), (0, pw)),
                      mode="edge")
    Hq, Wq = Hp + ph, Wp + pw
    # Mosaic requires the DMA slice shape on the grid-row dim to be a
    # multiple of the 8-sublane tiling AND the start to be 8-divisible:
    # the kernel aligns the start down (up to 7 slack rows), so the slab
    # must cover needed-rows + 7, rounded up to 8.
    ghh = min(_cdiv(gh, 8) * 8, _cdiv(TILE_H // ss + 3 + 7, 8) * 8)
    gh_pad = _cdiv(max(gh, ghh), 8) * 8
    if gh_pad > gh:
        gxy = jnp.pad(gxy, ((0, 0), (0, 0), (0, gh_pad - gh), (0, 0)),
                      mode="edge")
    grid = (Hq // TILE_H, Wq // TILE_W)

    out = pl.pallas_call(
        functools.partial(_kernel, ss=ss, D=D, C=C, gh=gh, gh_pad=gh_pad,
                          ghh=ghh),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((C, TILE_H, TILE_W), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, Hq, Wq), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((D, C, ghh, TILE_W), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(z, gxy)
    return out[:, :Hp, :Wp]
