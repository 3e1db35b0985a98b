"""colisa — contrast / brightness / saturation on Lab.

Reference: `/root/reference/src/iop/colisa.c` — params v1 (:60-65),
commit curves (:152-205: linear contrast below 1, sigmoid above; gamma
brightness), process (:~100-130: L through contrast then brightness
curves, a/b scaled by saturation).  Curves evaluated in closed form
instead of the reference's 64k LUTs (fuses on TPU, no table traffic);
the closed forms also extend naturally past L=100 where the reference
switches to an exponential extrapolation fit.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..core.params import cfield, params
from ..core.types import Colorspace
from .base import Op, OpPlan, PlanContext, register


@params(op="colisa", version=1)
@dataclasses.dataclass
class ColisaParams:
    contrast: float = cfield("f", 0.0)
    brightness: float = cfield("f", 0.0)
    saturation: float = cfield("f", 0.0)


@register
class Colisa(Op):
    name = "colisa"
    input_colorspace = Colorspace.LAB

    def plan(self, ctx: PlanContext, spec_in, p: ColisaParams) -> OpPlan:
        return OpPlan(spec_in=spec_in, spec_out=spec_in,
                      static=(p.contrast <= 0.0,))

    def coeffs(self, ctx: PlanContext, plan: OpPlan, p: ColisaParams):
        contrast = p.contrast + 1.0
        brightness = p.brightness * 2.0
        boost = 20.0
        m1sq = boost * (contrast - 1.0) ** 2
        return {
            "contrast": jnp.float32(contrast),
            "m1sq": jnp.float32(m1sq),
            "scale": jnp.float32((1.0 + m1sq) ** 0.5),
            "gamma": jnp.float32(1.0 / (1.0 + brightness)
                                 if brightness >= 0.0 else 1.0 - brightness),
            "saturation": jnp.float32(p.saturation + 1.0),
        }

    def pointwise_spec(self, plan, ctx):
        from .base import PointwiseSpec

        return PointwiseSpec(
            consts=("contrast", "m1sq", "scale", "gamma", "saturation"),
            fn=lambda b, cd: self.apply(b, cd, plan, None))

    def apply(self, x, c, plan: OpPlan, ctx: PlanContext):
        (linear_contrast,) = plan.static
        t = x[0] / 100.0
        if linear_contrast:
            # colisa.c:167 — linear slope around 50
            L = c["contrast"] * (100.0 * t - 50.0) + 50.0
        else:
            # colisa.c:178-179 — sigmoid
            k = 2.0 * t - 1.0
            L = 50.0 * (c["scale"] * k
                        / jnp.sqrt(1.0 + c["m1sq"] * k * k) + 1.0)
        # brightness gamma (colisa.c:193-196)
        L = 100.0 * jnp.maximum(L / 100.0, 0.0) ** c["gamma"]
        return jnp.stack([L, x[1] * c["saturation"], x[2] * c["saturation"]])
