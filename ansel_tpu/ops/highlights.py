"""highlights — clipped-highlight reconstruction.

Reference: `/root/reference/src/iop/highlights/` — params struct
common.h:428-446; modes: CLIP (hard clamp at threshold), LCH, inpaint,
guided-laplacian, segmentation, opposed.  Round 1 implements CLIP exactly
(clip threshold = p.clip * min(processed_maximum), highlights/clip.c) and
OPPOSED-style chromatic reconstruction later; other modes currently alias
to CLIP with a planning note.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..core.params import cfield, params
from ..core.types import Colorspace, ImageSpec
from .base import Op, OpPlan, PlanContext, register

MODE_CLIP = 0  # DT_IOP_HIGHLIGHTS_CLIP


@params(op="highlights", version=4)
@dataclasses.dataclass
class HighlightsParams:
    mode: int = cfield("i", MODE_CLIP)
    blendL: float = cfield("f", 1.0)   # unused (v1 leftovers)
    blendC: float = cfield("f", 0.0)
    blendh: float = cfield("f", 0.0)
    clip: float = cfield("f", 1.0)
    noise_level: float = cfield("f", 0.0)
    iterations: int = cfield("i", 30)
    scales: int = cfield("i", 8)
    reconstructing: float = cfield("f", 0.4)
    combine: float = cfield("f", 2.0)
    debugmode: int = cfield("i", 0)
    solid_color: float = cfield("f", 0.5)


@register
class Highlights(Op):
    name = "highlights"
    input_colorspace = Colorspace.RAW
    mandatory = True

    def plan(self, ctx: PlanContext, spec_in: ImageSpec, p) -> OpPlan:
        # reference clamps processed_maximum to the clip threshold
        clipval = p.clip * min(ctx.processed_maximum)
        ctx.processed_maximum = tuple(
            min(m, clipval) for m in ctx.processed_maximum
        )
        ctx.notes["highlights_clip"] = clipval
        return OpPlan(spec_in=spec_in, spec_out=spec_in, static=p.mode)

    def coeffs(self, ctx: PlanContext, plan: OpPlan, p):
        return {"clip": ctx.notes["highlights_clip"]}

    def apply(self, x, c, plan: OpPlan, ctx: PlanContext):
        clip = jnp.asarray(c["clip"], x.dtype)
        return jnp.minimum(x, clip)
