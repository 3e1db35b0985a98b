"""tonecurve — Lab tone curves (L and optionally a/b).

Reference: `/root/reference/src/iop/tonecurve.c` (params v5,
tonecurve.c:187-197): L curve over [0,100] with unbounded extrapolation;
in automatic-ab mode a/b are scaled by the L ratio (colorfulness
preservation); in manual mode a/b get their own curves over [-128,128].
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..core.params import cfield, params
from ..core.types import Colorspace
from ..pixel import curves
from .base import Op, OpPlan, PlanContext, register

MAXNODES = 20
AUTOSCALE_RGB = 0   # "Lab, linked" in dt terms
MANUAL = 1


@params(op="tonecurve", version=5)
@dataclasses.dataclass
class ToneCurveParams:
    tonecurve: tuple = cfield(
        f"{3 * MAXNODES * 2}f",
        tuple([0.0, 0.0, 1.0, 1.0] + [0.0] * (MAXNODES * 2 - 4)) * 3,
    )
    tonecurve_nodes: tuple = cfield("3i", (2, 3, 3))
    tonecurve_type: tuple = cfield("3i", (2, 2, 2))
    tonecurve_autoscale_ab: int = cfield("i", 0)
    tonecurve_preset: int = cfield("i", 0)
    tonecurve_unbound_ab: int = cfield("i", 1)
    preserve_colors: int = cfield("i", 3)


@register
class ToneCurve(Op):
    name = "tonecurve"
    input_colorspace = Colorspace.LAB

    def plan(self, ctx: PlanContext, spec_in, p) -> OpPlan:
        return OpPlan(spec_in=spec_in, spec_out=spec_in,
                      static=p.tonecurve_autoscale_ab)

    def coeffs(self, ctx, plan, p: ToneCurveParams):
        n = max(2, min(p.tonecurve_nodes[0], MAXNODES))
        xs = [p.tonecurve[2 * i] for i in range(n)]
        ys = [p.tonecurve[2 * i + 1] for i in range(n)]
        cx, cy, cm = curves.curve_coeffs(xs, ys, p.tonecurve_type[0])
        return {"cx": cx, "cy": cy, "cm": cm}

    def apply(self, x, c, plan: OpPlan, ctx: PlanContext):
        L = x[0] / 100.0
        L_out = curves.eval_curve(L, c["cx"], c["cy"], c["cm"]) * 100.0
        # automatic ab: scale chroma with the L ratio
        ratio = L_out / jnp.maximum(x[0], 1e-6)
        return jnp.stack([L_out, x[1] * ratio, x[2] * ratio])
