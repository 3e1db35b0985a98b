"""censorize — anonymization blur/pixelation (typically applied through a
drawn mask via blending).

Reference: `/root/reference/src/iop/censorize.c` — params v1 (:55-61):
input Gaussian blur -> pixelation (cell-mean mosaic) -> output Gaussian
blur -> uniform noise.  Pixelation here is an area resize down + nearest
resize up (same cell-mean semantics, MXU/VPU friendly).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core.params import cfield, params
from ..core.types import Colorspace
from ..pixel.blur import gaussian_blur
from .base import Op, OpPlan, PlanContext, register


@params(op="censorize", version=1)
@dataclasses.dataclass
class CensorizeParams:
    radius_1: float = cfield("f", 0.0)
    pixelate: float = cfield("f", 0.0)
    radius_2: float = cfield("f", 0.0)
    noise: float = cfield("f", 0.0)


@register
class Censorize(Op):
    name = "censorize"
    input_colorspace = Colorspace.WORK_RGB

    def plan(self, ctx: PlanContext, spec_in, p: CensorizeParams) -> OpPlan:
        cell = max(int(round(p.pixelate * ctx.scale)), 0)
        return OpPlan(spec_in=spec_in, spec_out=spec_in,
                      static=(p.radius_1 * ctx.scale, cell,
                              p.radius_2 * ctx.scale, p.noise > 0.0))

    def coeffs(self, ctx: PlanContext, plan: OpPlan, p: CensorizeParams):
        return {"noise": jnp.float32(p.noise)}

    def apply(self, x, c, plan: OpPlan, ctx: PlanContext):
        r1, cell, r2, has_noise = plan.static
        out = x
        if r1 > 0.1:
            out = gaussian_blur(out, r1)
        if cell > 1:
            C, H, W = out.shape
            hs, ws = max(H // cell, 1), max(W // cell, 1)
            small = jax.image.resize(out, (C, hs, ws), method="linear")
            out = jax.image.resize(small, (C, H, W), method="nearest")
        if r2 > 0.1:
            out = gaussian_blur(out, r2)
        if has_noise:
            key = jax.random.PRNGKey(1259)  # reproducible, like grain
            n = jax.random.uniform(key, out.shape, out.dtype, -0.5, 0.5)
            out = jnp.maximum(out * (1.0 + n * c["noise"]), 0.0)
        return out
