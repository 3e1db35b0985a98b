"""hotpixels — dead/hot photosite suppression on the mosaic.

Reference: `/root/reference/src/iop/hotpixels.c` (params v1,
hotpixels.c:74-80; bayer kernel :161-193): a site above `threshold` whose
value*strength/2 exceeds >= 3 (permissive) or 4 same-color neighbours at
±2 is replaced by the largest of those dimmer neighbours.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..core.params import cfield, params
from ..core.types import Colorspace
from .base import Op, OpPlan, PlanContext, register


@params(op="hotpixels", version=1)
@dataclasses.dataclass
class HotPixelsParams:
    strength: float = cfield("f", 0.25)
    threshold: float = cfield("f", 0.05)
    markfixed: int = cfield("i", 0)
    permissive: int = cfield("i", 0)


@register
class HotPixels(Op):
    name = "hotpixels"
    # +-2 mosaic stencil; 6 keeps window origins CFA-period aligned
    window_halo = 6
    input_colorspace = Colorspace.RAW

    def plan(self, ctx: PlanContext, spec_in, p) -> OpPlan:
        return OpPlan(spec_in=spec_in, spec_out=spec_in,
                      static=3 if p.permissive else 4)

    def coeffs(self, ctx, plan, p):
        return {"multiplier": p.strength / 2.0, "threshold": p.threshold}

    def apply(self, x, c, plan: OpPlan, ctx: PlanContext):
        from ..pixel.shifts import PaddedView

        min_n = plan.static
        mid = x * jnp.asarray(c["multiplier"], x.dtype)
        # fusible static slices, NOT jnp.roll (a roll materializes every
        # shifted 24MP view: this stage was 220ms, shifts make it ~10ms)
        pv = PaddedView(x, 2)
        neighbours = [pv.at(dy, dx) for dy, dx in
                      ((0, 2), (0, -2), (2, 0), (-2, 0))]
        count = sum((n < mid).astype(jnp.int32) for n in neighbours)
        maxin = jnp.zeros_like(x)
        for n in neighbours:
            maxin = jnp.where((n < mid) & (n > maxin), n, maxin)
        fix = (x > c["threshold"]) & (count >= min_n)
        return jnp.where(fix, maxin, x)
