"""rotatepixels — fixed sensor rotation correction (e.g. Fuji DR sensors
mounted at 45 degrees).

Reference: `/root/reference/src/iop/rotatepixels.c` — params v1 (:54-58):
rotation by `angle` around the sensor point (rx, ry); output is the
axis-aligned crop of the rotated frame.  Implemented as an inverse-warp
bilinear gather (same machinery as the lens op).
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp

from ..core.params import cfield, params
from .base import Op, OpPlan, PlanContext, register
from .lens import _sample_bilinear


@params(op="rotatepixels", version=1)
@dataclasses.dataclass
class RotatePixelsParams:
    rx: int = cfield("I", 0)
    ry: int = cfield("I", 0)
    angle: float = cfield("f", 0.0)


@register
class RotatePixels(Op):
    name = "rotatepixels"
    input_colorspace = None

    def enabled_by_default(self, meta):
        return False

    def plan(self, ctx: PlanContext, spec_in, p: RotatePixelsParams) -> OpPlan:
        return OpPlan(spec_in=spec_in, spec_out=spec_in,
                      static=(float(p.angle), float(p.rx), float(p.ry)))

    def apply(self, x, c, plan: OpPlan, ctx: PlanContext):
        angle, rx, ry = plan.static
        if abs(angle) < 1e-9:
            return x
        H, W = x.shape[-2:]
        a = math.radians(angle)
        ca, sa = math.cos(a), math.sin(a)
        ys = jnp.arange(H, dtype=jnp.float32)[:, None] - ry
        xs = jnp.arange(W, dtype=jnp.float32)[None, :] - rx
        src_x = ca * xs + sa * ys + rx
        src_y = -sa * xs + ca * ys + ry
        src_x = jnp.broadcast_to(src_x, (H, W))
        src_y = jnp.broadcast_to(src_y, (H, W))
        return jnp.stack([_sample_bilinear(x[i], src_y, src_x)
                          for i in range(x.shape[0])])
