"""vignette — elliptic brightness/saturation falloff.

Reference: `/root/reference/src/iop/vignette.c` (params v4,
vignette.c:140-152): inner radius `scale` and falloff band in percent of
half the diagonal, shape exponent, centered ellipse with w/h ratio;
brightness scales RGB, saturation pulls toward the local mean.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from ..core.params import cfield, params
from ..core.types import Colorspace
from .base import Op, OpPlan, PlanContext, register


@params(op="vignette", version=4)
@dataclasses.dataclass
class VignetteParams:
    scale: float = cfield("f", 80.0)
    falloff_scale: float = cfield("f", 50.0)
    brightness: float = cfield("f", -0.5)
    saturation: float = cfield("f", -0.5)
    center_x: float = cfield("f", 0.0)
    center_y: float = cfield("f", 0.0)
    autoratio: int = cfield("i", 0)
    whratio: float = cfield("f", 1.0)
    shape: float = cfield("f", 1.0)
    dithering: int = cfield("i", 0)
    unbound: int = cfield("i", 1)


@register
class Vignette(Op):
    name = "vignette"
    input_colorspace = Colorspace.WORK_RGB

    def coeffs(self, ctx, plan, p: VignetteParams):
        return {"scale": p.scale / 100.0, "falloff": p.falloff_scale / 100.0,
                "brightness": p.brightness, "saturation": p.saturation,
                "cx": p.center_x, "cy": p.center_y,
                "whratio": max(p.whratio, 1e-3), "shape": max(p.shape, 1e-3)}

    def apply(self, x, c, plan: OpPlan, ctx: PlanContext):
        spec = plan.spec_in
        h, w = spec.pad_h, spec.pad_w
        iw, ih = spec.width, spec.height
        xs = (jax.lax.broadcasted_iota(jnp.float32, (1, w), 1)
              - iw / 2.0) / (iw / 2.0) - c["cx"]
        ys = (jax.lax.broadcasted_iota(jnp.float32, (h, 1), 0)
              - ih / 2.0) / (ih / 2.0) - c["cy"]
        # ellipse: whratio <1 widens x, >1 widens y (reference semantics)
        wh = c["whratio"]
        d = jnp.sqrt((xs / wh) ** 2 + ys**2)
        d = d ** jnp.asarray(c["shape"], x.dtype)
        inner = c["scale"]
        outer = inner + jnp.maximum(c["falloff"], 1e-4)
        t = jnp.clip((d - inner) / (outer - inner), 0.0, 1.0)
        # smooth falloff
        t = t * t * (3.0 - 2.0 * t)
        gain = 1.0 + c["brightness"] * t
        out = x * gain[None]
        mean = jnp.mean(out, axis=0, keepdims=True)
        sat = 1.0 + c["saturation"] * t
        return mean + (out - mean) * sat[None]
