"""vibrance — chroma-weighted saturation in Lab.

Reference: `/root/reference/src/iop/vibrance.c` (params v2, process():
saturation weight sw = |ab|/256, L scaled by 1 - amount*sw/4, a/b scaled by
1 + amount*sw).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..core.params import cfield, params
from ..core.types import Colorspace
from .base import Op, OpPlan, PlanContext, register


@params(op="vibrance", version=2)
@dataclasses.dataclass
class VibranceParams:
    amount: float = cfield("f", 25.0)


@register
class Vibrance(Op):
    name = "vibrance"
    input_colorspace = Colorspace.LAB

    def coeffs(self, ctx, plan, p):
        return {"amount": p.amount * 0.01}

    def pointwise_spec(self, plan, ctx):
        from .base import PointwiseSpec

        return PointwiseSpec(consts=("amount",),
                             fn=lambda b, cd: self.apply(b, cd, plan, None))

    def apply(self, x, c, plan: OpPlan, ctx: PlanContext):
        amount = jnp.asarray(c["amount"], x.dtype)
        sw = jnp.sqrt(x[1] ** 2 + x[2] ** 2) / 256.0
        ls = 1.0 - amount * sw * 0.25
        ss = 1.0 + amount * sw
        return jnp.stack([x[0] * ls, x[1] * ss, x[2] * ss])
