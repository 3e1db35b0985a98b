"""flip — EXIF orientation.

Reference: `/root/reference/src/iop/flip.c` (params v2: one
dt_image_orientation_t).  Orientation bits (src/common/image.h):
bit0 = flip x, bit1 = flip y, bit2 = swap x/y (transpose); ORIENTATION_NONE
= 0, ORIENTATION_NULL = -1 (use EXIF).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..core.params import cfield, params
from ..core.types import Colorspace, ImageSpec
from .base import Op, OpPlan, PlanContext, register

ORIENTATION_NULL = -1
FLIP_X = 1
FLIP_Y = 2
SWAP_XY = 4

# EXIF orientation tag (1..8) -> dt orientation bits (flip.c legacy map)
EXIF_TO_ORIENTATION = {1: 0, 2: 1, 3: 3, 4: 2, 5: 4, 6: 6, 7: 7, 8: 5}


@params(op="flip", version=2)
@dataclasses.dataclass
class FlipParams:
    orientation: int = cfield("i", ORIENTATION_NULL)


    @classmethod
    def from_legacy(cls, version, raw):
        import struct

        # flip.c v1 {orientation}; the reference merges with the image's
        # EXIF orientation (merge_two_orientations with base NONE is the
        # identity); headless replay applies EXIF orientation separately
        if version == 1:
            (o,) = struct.unpack("<i", raw[:4])
            return cls(orientation=o)
        return None


@register
class Flip(Op):
    name = "flip"
    input_colorspace = None

    def default_params(self, meta):
        return FlipParams(orientation=ORIENTATION_NULL)

    def enabled_by_default(self, meta):
        return meta.orientation not in (0, 1)

    def _orientation(self, ctx, p: FlipParams) -> int:
        if p.orientation == ORIENTATION_NULL:
            return EXIF_TO_ORIENTATION.get(ctx.meta.orientation, 0)
        return p.orientation

    def plan(self, ctx: PlanContext, spec_in: ImageSpec, p) -> OpPlan:
        o = self._orientation(ctx, p)
        if o & SWAP_XY:
            spec_out = spec_in.with_size(spec_in.height, spec_in.width)
        else:
            spec_out = spec_in
        return OpPlan(spec_in=spec_in, spec_out=spec_out, static=o)

    def apply(self, x, c, plan: OpPlan, ctx: PlanContext):
        o = plan.static
        if o == 0:
            return x
        si, so = plan.spec_in, plan.spec_out
        # operate on the valid region, re-pad after (geometry op)
        if x.ndim == 2:
            v = x[: si.height, : si.width]
        else:
            v = x[:, : si.height, : si.width]
        if o & SWAP_XY:
            v = jnp.swapaxes(v, -1, -2)
        if o & FLIP_X:
            v = jnp.flip(v, axis=-1)
        if o & FLIP_Y:
            v = jnp.flip(v, axis=-2)
        pad = [(0, 0)] * (v.ndim - 2) + [
            (0, so.pad_h - so.height), (0, so.pad_w - so.width)]
        return jnp.pad(v, pad, mode="edge")
