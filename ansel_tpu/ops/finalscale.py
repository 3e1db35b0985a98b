"""finalscale — resample the processed image to the export size.

Reference: hidden plumbing module `/root/reference/src/iop/finalscale.c` +
the resamplers in `src/pixel/interpolation.c` (bilinear/bicubic/lanczos2/
lanczos3; lanczos3 is the quality default).  TPU form: jax.image.resize —
XLA lowers lanczos3 separably onto the convolution path.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core.params import cfield, params
from ..core.types import ImageSpec
from .base import Op, OpPlan, PlanContext, register


@params(op="finalscale", version=1)
@dataclasses.dataclass
class FinalScaleParams:
    # no user params in the reference; method here for future styles
    method: int = cfield("i", 0)  # 0=lanczos3, 1=cubic, 2=linear

_METHODS = {0: "lanczos3", 1: "cubic", 2: "linear"}


@register
class FinalScale(Op):
    name = "finalscale"
    input_colorspace = None

    def enabled_by_default(self, meta):
        return False  # injected by the planner when ctx.scale != 1

    def plan(self, ctx: PlanContext, spec_in: ImageSpec, p) -> OpPlan:
        if abs(ctx.scale - 1.0) < 1e-9:
            return OpPlan(spec_in=spec_in, spec_out=spec_in, static=None)
        w = max(1, int(round(spec_in.width * ctx.scale)))
        h = max(1, int(round(spec_in.height * ctx.scale)))
        spec_out = spec_in.with_size(w, h)
        return OpPlan(spec_in=spec_in, spec_out=spec_out,
                      static=_METHODS.get(p.method, "lanczos3"))

    def apply(self, x, c, plan: OpPlan, ctx: PlanContext):
        if plan.static is None:
            return x
        si, so = plan.spec_in, plan.spec_out
        v = x[..., : si.height, : si.width]
        out = jax.image.resize(v, x.shape[:-2] + (so.height, so.width),
                               method=plan.static)
        pad = [(0, 0)] * (out.ndim - 2) + [
            (0, so.pad_h - so.height), (0, so.pad_w - so.width)]
        return jnp.pad(out, pad, mode="edge")
