"""defringe — purple-fringe suppression on Lab chroma edges.

Reference: `/root/reference/src/iop/defringe.c` — params v1 (:68-73),
process (:~240-420): edge map = squared chroma difference between the
image and its Gaussian blur; pixels above an (average-scaled) threshold
(with one pixel of region growing) get their (a, b) replaced by an
inverse-chroma-weighted neighbourhood average.

TPU-first: the reference samples the neighbourhood on a sparse Fibonacci
lattice (a CPU-cache trick); here the weighted average is computed densely
with cumsum box filters — same estimator, fully fused, no gathers.  The
local-average mode's lattice average becomes a box mean of the edge map.
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp

from ..core.params import cfield, params
from ..core.types import Colorspace
from ..pixel.blur import box_blur, gaussian_blur
from .base import Op, OpPlan, PlanContext, register

MODE_GLOBAL_AVERAGE = 0
MODE_LOCAL_AVERAGE = 1
MODE_STATIC = 2
MAGIC = 33.0


@params(op="defringe", version=1)
@dataclasses.dataclass
class DefringeParams:
    radius: float = cfield("f", 4.0)
    thresh: float = cfield("f", 20.0)
    op_mode: int = cfield("i", MODE_GLOBAL_AVERAGE)


@register
class Defringe(Op):
    name = "defringe"
    input_colorspace = Colorspace.LAB

    def plan(self, ctx: PlanContext, spec_in, p: DefringeParams) -> OpPlan:
        sigma = max(0.1, abs(p.radius)) * ctx.scale
        radius = int(math.ceil(2.0 * math.ceil(sigma)))
        return OpPlan(spec_in=spec_in, spec_out=spec_in,
                      static=(p.op_mode, sigma, max(radius, 3),
                              24 + radius * 4))

    def coeffs(self, ctx: PlanContext, plan: OpPlan, p: DefringeParams):
        return {"thresh": jnp.float32(p.thresh)}

    def apply(self, x, c, plan: OpPlan, ctx: PlanContext):
        mode, sigma, small_radius, avg_radius = plan.static
        # only the chroma planes feed the edge detector — don't blur L
        blurred = gaussian_blur(x[1:3], sigma)
        da = x[1] - blurred[0]
        db = x[2] - blurred[1]
        edge = da * da + db * db

        if mode == MODE_GLOBAL_AVERAGE:
            avg = jnp.mean(edge) + 1e-6
            thresh = jnp.maximum(4.0 * c["thresh"] * avg / MAGIC, 0.1)
        elif mode == MODE_LOCAL_AVERAGE:
            avg = jnp.maximum(box_blur(edge, avg_radius), 0.01)
            thresh = jnp.maximum(4.0 * c["thresh"] * avg / MAGIC, 0.1)
        else:  # static
            avg = jnp.float32(MAGIC)
            thresh = jnp.maximum(c["thresh"], 0.1)

        # one pixel of region growing (defringe.c:~365-375): 3x3 max as
        # separable shifted selects — reduce_window on a single-channel
        # 24MP plane pays XLA's 128-lane im2col pad (CLAUDE.md rule)
        from ..pixel.shifts import PaddedView

        pv = PaddedView(edge, 1)
        vmax = jnp.maximum(pv.at(-1, 0), jnp.maximum(pv.at(0, 0),
                                                     pv.at(1, 0)))
        ph = PaddedView(vmax, 1)
        hit = jnp.maximum(ph.at(0, -1), jnp.maximum(ph.at(0, 0),
                                                    ph.at(0, 1))) > thresh

        # inverse-chroma-weighted neighbourhood average
        w = 1.0 / (edge + avg)
        norm = box_blur(w, small_radius)
        a_new = box_blur(w * x[1], small_radius) / jnp.maximum(norm, 1e-12)
        b_new = box_blur(w * x[2], small_radius) / jnp.maximum(norm, 1e-12)
        return jnp.stack([x[0],
                          jnp.where(hit, a_new, x[1]),
                          jnp.where(hit, b_new, x[2])])
