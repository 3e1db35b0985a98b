"""colorcorrection — split-tone white balance in Lab a/b.

Reference: `/root/reference/src/iop/colorcorrection.c` (params v1,
colorcorrection.c:76-80; process: a' = sat*(a + L*(hia-loa)/100 + loa),
same for b).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..core.params import cfield, params
from ..core.types import Colorspace
from .base import Op, OpPlan, PlanContext, register


@params(op="colorcorrection", version=1)
@dataclasses.dataclass
class ColorCorrectionParams:
    hia: float = cfield("f", 0.0)
    hib: float = cfield("f", 0.0)
    loa: float = cfield("f", 0.0)
    lob: float = cfield("f", 0.0)
    saturation: float = cfield("f", 1.0)


@register
class ColorCorrection(Op):
    name = "colorcorrection"
    input_colorspace = Colorspace.LAB

    def coeffs(self, ctx, plan, p):
        return {"a_scale": (p.hia - p.loa) / 100.0, "a_base": p.loa,
                "b_scale": (p.hib - p.lob) / 100.0, "b_base": p.lob,
                "saturation": p.saturation}

    def pointwise_spec(self, plan, ctx):
        from .base import PointwiseSpec

        return PointwiseSpec(
            consts=("a_scale", "a_base", "b_scale", "b_base", "saturation"),
            fn=lambda b, cd: self.apply(b, cd, plan, None))

    def apply(self, x, c, plan: OpPlan, ctx: PlanContext):
        sat = jnp.asarray(c["saturation"], x.dtype)
        a = sat * (x[1] + x[0] * c["a_scale"] + c["a_base"])
        b = sat * (x[2] + x[0] * c["b_scale"] + c["b_base"])
        return jnp.stack([x[0], a, b])
