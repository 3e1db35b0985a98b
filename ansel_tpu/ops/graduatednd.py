"""graduatednd — optical graduated ND filter simulation.

Reference: `/root/reference/src/iop/graduatednd.c` (params v1
graduatednd.c:87-95): rotated linear gradient `length`, density = 2^(dens *
clip(0.5 + length)), out = in / (color + (1-color) * density) with the tint
color from HSL(hue, saturation, 0.5), inverted for negative density
(commit_params graduatednd.c; process graduatednd.c:684-760).
"""

from __future__ import annotations

import colorsys
import dataclasses
import math

import jax
import jax.numpy as jnp

from ..core.params import cfield, params
from ..core.types import Colorspace
from .base import Op, OpPlan, PlanContext, register


@params(op="graduatednd", version=1)
@dataclasses.dataclass
class GraduatedNDParams:
    density: float = cfield("f", 1.0)
    hardness: float = cfield("f", 0.0)
    rotation: float = cfield("f", 0.0)
    offset: float = cfield("f", 50.0)
    hue: float = cfield("f", 0.0)
    saturation: float = cfield("f", 0.0)


@register
class GraduatedND(Op):
    name = "graduatednd"
    input_colorspace = None  # order 25: runs on scene RGB before colorin

    def coeffs(self, ctx: PlanContext, plan: OpPlan, p: GraduatedNDParams):
        r, g, b = colorsys.hls_to_rgb(p.hue, 0.5, p.saturation)
        color = [r, g, b]
        if p.density < 0:
            color = [1.0 - c for c in color]
        color1 = [1.0 - c for c in color]
        v = (-p.rotation / 180.0) * math.pi
        return {
            "density": p.density,
            "sinv": math.sin(v), "cosv": math.cos(v),
            "offset": p.offset / 100.0 * 2.0,
            "hardness": p.hardness / 100.0,
            "color": color, "color1": color1,
        }

    def pointwise_spec(self, plan, ctx):
        from .base import PointwiseSpec
        iw, ih = float(plan.spec_in.width), float(plan.spec_in.height)

        def fn(b, cd, yy, xx):
            return self._pixel(b, cd, xx, yy, iw, ih)

        return PointwiseSpec(
            consts=("density", "sinv", "cosv", "offset", "hardness",
                    "color", "color1"),
            fn=fn, needs_pos=True)

    def apply(self, x, c, plan: OpPlan, ctx: PlanContext):
        spec = plan.spec_in
        h, w = spec.pad_h, spec.pad_w
        xs = jnp.broadcast_to(
            jax.lax.broadcasted_iota(jnp.float32, (1, w), 1), (h, w))
        ys = jnp.broadcast_to(
            jax.lax.broadcasted_iota(jnp.float32, (h, 1), 0), (h, w))
        return self._pixel(x, c, xs, ys,
                           float(spec.width), float(spec.height))

    def _pixel(self, x, c, xs, ys, iw, ih):
        hw, hh = iw / 2.0, ih / 2.0
        filter_radius = math.sqrt(hh * hh + hw * hw) / hh
        hardness = (1.0 / filter_radius
                    / (1.0 - (0.5 + c["hardness"] * 0.9 / 2.0)) * 0.5)
        length = (c["sinv"] * (-1.0 + xs / hw) - c["cosv"] * (-1.0 + ys / hh)
                  - 1.0 + c["offset"]) * hardness
        dens = c["density"]
        # reference runs the mirrored formula for negative density
        t = jnp.where(dens > 0,
                      jnp.clip(0.5 + length, 0.0, 1.0),
                      jnp.clip(0.5 - length, 0.0, 1.0))
        density = jnp.exp2(jnp.abs(dens) * t)
        col, col1 = c["color"], c["color1"]
        return jnp.stack([
            jnp.maximum(0.0, x[i] / (col[i] + col1[i] * density))
            for i in range(3)])
