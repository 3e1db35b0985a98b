"""rawprepare — sensor black/white normalization + sensor-crop.

Reference: `/root/reference/src/iop/rawprepare.c` — process() subtracts the
per-CFA-position black level and divides by (white - black)
(rawprepare.c:439-530; position index BL(), rawprepare.c:385-390), crops the
masked borders, and resets processed_maximum to 1.0 (commit_params,
rawprepare.c). Param struct v2: rawprepare.c:73-82.
"""

from __future__ import annotations

import dataclasses

from ..core.params import cfield, params
from ..core.types import Colorspace, ImageSpec, RawMeta
from . import _bayer
from .base import Op, OpPlan, PlanContext, register


@params(op="rawprepare", version=2)
@dataclasses.dataclass
class RawPrepareParams:
    x: int = cfield("i", 0)               # crop left
    y: int = cfield("i", 0)               # crop top
    width: int = cfield("i", 0)           # crop right
    height: int = cfield("i", 0)          # crop bottom
    raw_black_level_separate: tuple = cfield("4H", (0, 0, 0, 0))
    raw_white_point: int = cfield("H", 65535)
    flat_field: int = cfield("i", 0)

    @classmethod
    def from_legacy(cls, version, raw):
        if version == 1:  # rawprepare.c:152-166 — v1 lacked flat_field
            import struct

            vals = struct.unpack("<4i4HH", raw[:26])
            return cls(
                x=vals[0], y=vals[1], width=vals[2], height=vals[3],
                raw_black_level_separate=vals[4:8], raw_white_point=vals[8],
            )
        return None


@register
class RawPrepare(Op):
    name = "rawprepare"
    input_colorspace = Colorspace.RAW
    mandatory = True

    def default_params(self, meta: RawMeta):
        return RawPrepareParams(
            x=meta.crop_x, y=meta.crop_y, width=meta.crop_right,
            height=meta.crop_bottom,
            raw_black_level_separate=tuple(int(b) for b in meta.black_levels),
            raw_white_point=int(meta.white_point),
        )

    def plan(self, ctx: PlanContext, spec_in: ImageSpec, p: RawPrepareParams) -> OpPlan:
        w = spec_in.width - p.x - p.width
        h = spec_in.height - p.y - p.height
        spec_out = spec_in.with_size(w, h, cfa=spec_in.cfa.shifted(p.y, p.x)
                                     if spec_in.cfa else None)
        ctx.processed_maximum = (1.0, 1.0, 1.0)
        return OpPlan(spec_in=spec_in, spec_out=spec_out,
                      static=(p.x, p.y))

    def coeffs(self, ctx: PlanContext, plan: OpPlan, p: RawPrepareParams):
        white = float(p.raw_white_point)
        sub = [float(b) for b in p.raw_black_level_separate]
        div = [white - s for s in sub]
        return {"sub": sub, "inv_div": [1.0 / d if d else 1.0 for d in div]}

    def apply(self, x, c, plan: OpPlan, ctx: PlanContext):
        import jax.numpy as jnp

        cx, cy = plan.static
        so = plan.spec_out
        # crop then pad back to the new aligned shape
        cropped = x[cy : cy + so.height, cx : cx + so.width]
        pad_h = so.pad_h - so.height
        pad_w = so.pad_w - so.width
        y = jnp.pad(cropped, ((0, pad_h), (0, pad_w)), mode="edge")
        # position-indexed black/white normalize; the crop shifted the CFA
        # phase so position index is relative to the *new* origin at
        # (cy, cx): BL() uses (row + crop_y) & 1 with row in output coords.
        sub = _bayer.position_select(c["sub"], so.pad_h, so.pad_w, cy, cx)
        inv = _bayer.position_select(c["inv_div"], so.pad_h, so.pad_w, cy, cx)
        return (y - sub) * inv
