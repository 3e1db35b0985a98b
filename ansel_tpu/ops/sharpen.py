"""sharpen — unsharp mask on Lab L.

Reference: `/root/reference/src/iop/sharpen.c` (params v1 sharpen.c:83-88):
separable Gaussian blur of L (sigma = radius*scale/2.5), detail = soft
threshold of (L - blur), out L = L + amount * detail; a/b untouched.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..core.params import cfield, params
from ..core.types import Colorspace
from ..pixel.blur import gaussian_blur
from .base import Op, OpPlan, PlanContext, register


@params(op="sharpen", version=1)
@dataclasses.dataclass
class SharpenParams:
    radius: float = cfield("f", 2.0)
    amount: float = cfield("f", 0.5)
    threshold: float = cfield("f", 0.5)


@register
class Sharpen(Op):
    name = "sharpen"
    input_colorspace = Colorspace.LAB

    def plan(self, ctx: PlanContext, spec_in, p: SharpenParams) -> OpPlan:
        sigma = max(p.radius * ctx.scale / 2.5, 1e-3)
        return OpPlan(spec_in=spec_in, spec_out=spec_in,
                      static=round(sigma, 4))

    def coeffs(self, ctx, plan, p):
        return {"amount": p.amount, "threshold": p.threshold}

    def apply(self, x, c, plan: OpPlan, ctx: PlanContext):
        sigma = plan.static
        blur = gaussian_blur(x[0], sigma)
        diff = x[0] - blur
        t = jnp.asarray(c["threshold"], x.dtype)
        detail = jnp.sign(diff) * jnp.maximum(jnp.abs(diff) - t, 0.0)
        L = x[0] + jnp.asarray(c["amount"], x.dtype) * detail
        return jnp.stack([L, x[1], x[2]])
