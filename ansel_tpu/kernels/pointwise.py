"""Generic Pallas pointwise-pipeline kernel.

XLA leaves long per-pixel color pipelines (filmic AgX, color balance…)
as dozens of unfused HBM passes — 70ms where ~2ms of traffic is needed.
This wrapper runs an arbitrary per-pixel function over (C, H, W) planes in
one fused pass: each grid step owns a VMEM tile and the whole math chain
runs register/VMEM-resident.

The per-pixel function receives (block, consts) where `block` is the
(C, th, tw) tile and `consts` is a flat float32 vector of traced scalars
(packed by the caller; SMEM-resident).
"""

from __future__ import annotations

import functools
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def cdiv(a, b):
    return -(-a // b)


def pallas_pointwise(fn: Callable, x: jnp.ndarray, consts,
                     tile_h: int = 256, tile_w: int = 512,
                     with_pos: bool = False,
                     interpret: bool = False) -> jnp.ndarray:
    """Run `fn(block, consts_vec) -> block` tiled over x (C, H, W).
    With `with_pos`, fn receives two extra (th, tw) float32 arguments —
    the absolute pixel y/x coordinates of the tile — so position-dependent
    ops (vignette, graduated filters) can join the fused chain."""
    C, H, W = x.shape
    consts = jnp.asarray(consts, jnp.float32).reshape(-1)
    th = min(tile_h, H)
    tw = min(tile_w, W)
    grid = (cdiv(H, th), cdiv(W, tw))

    def kernel(consts_ref, x_ref, o_ref):
        if with_pos:
            i = pl.program_id(0)
            j = pl.program_id(1)
            # Mosaic iota must be integer; cast after
            yy = (jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0)
                  + i * th).astype(jnp.float32)
            xx = (jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1)
                  + j * tw).astype(jnp.float32)
            o_ref[:] = fn(x_ref[:], consts_ref, yy, xx)
        else:
            o_ref[:] = fn(x_ref[:], consts_ref)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((C, th, tw), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C, th, tw), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, H, W), x.dtype),
        interpret=interpret,
    )(consts, x)


def atan_pos(y, x):
    """atan2(y, x) restricted to the first quadrant (y, x >= 0), Pallas-safe
    (TPU lowering has no atan/atan2): minimax odd polynomial on [0, 1] plus
    the atan(t) = pi/2 - atan(1/t) fold.  |err| < 2e-7 rad."""
    import math

    big = jnp.maximum(jnp.maximum(x, y), 1e-20)
    small = jnp.minimum(x, y)
    z = small / big
    s = z * z
    u = jnp.float32(0.00282363896258175373077393)
    for k in (-0.0159569028764963150024414, 0.0425049886107444763183594,
              -0.0748900920152664184570312, 0.106347933411598205566406,
              -0.142027363181114196777344, 0.199926957488059997558594,
              -0.333331018686294555664062):
        u = u * s + jnp.float32(k)
    theta = u * s * z + z
    return jnp.where(y > x, math.pi / 2.0 - theta, theta)


def atan2_full(y, x):
    """Full-range atan2(y, x) from the first-quadrant poly: quadrant fold
    by the signs of x and y.  Pallas-safe; |err| < 2e-7 rad."""
    import math

    t = atan_pos(jnp.abs(y), jnp.abs(x))
    t = jnp.where(x < 0.0, math.pi - t, t)
    return jnp.where(y < 0.0, -t, t)


class ConstPack:
    """Helper to pack/unpack named traced scalars into the consts vector."""

    def __init__(self):
        self.names = []

    def pack(self, values: dict, order: Sequence[str]):
        self.names = list(order)
        parts = []
        for n in self.names:
            v = jnp.asarray(values[n], jnp.float32).reshape(-1)
            parts.append(v)
        self.sizes = [int(p.shape[0]) for p in parts]
        self.offsets = np.cumsum([0] + self.sizes[:-1]).tolist()
        if not parts:  # const-free chain (e.g. colorspace converts only)
            return jnp.zeros((1,), jnp.float32)
        return jnp.concatenate(parts)

    def get(self, consts_ref, name: str):
        i = self.names.index(name)
        off, n = self.offsets[i], self.sizes[i]
        if n == 1:
            return consts_ref[off]
        return jnp.stack([consts_ref[off + k] for k in range(n)])

    def get_list(self, consts_ref, name: str):
        """Python list of traced SMEM scalars — the Mosaic-friendly form
        for per-segment unrolled math (curve knots): no vector build, each
        knot is a scalar FMA operand."""
        i = self.names.index(name)
        off, n = self.offsets[i], self.sizes[i]
        return [consts_ref[off + k] for k in range(n)]
