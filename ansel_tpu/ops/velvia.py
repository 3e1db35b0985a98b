"""velvia — saturation boost weighted toward unsaturated pixels.

Reference: `/root/reference/src/iop/velvia.c` (params v2 velvia.c:73-77,
pixel math process() velvia.c:100-140): HSL-ish saturation estimate,
bias-weighted strength, per-channel push away from the other channels' mean.
Display-referred RGB, clamped [0,1].
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..core.params import cfield, params
from ..core.types import Colorspace
from .base import Op, OpPlan, PlanContext, register


@params(op="velvia", version=2)
@dataclasses.dataclass
class VelviaParams:
    strength: float = cfield("f", 25.0)
    bias: float = cfield("f", 1.0)


    @classmethod
    def from_legacy(cls, version, raw):
        import struct

        # velvia.c v1 {saturation, vibrance, luminance, clarity}
        if version == 1:
            sat, vib, lum = struct.unpack("<3f", raw[:12])
            return cls(strength=sat * vib / 100.0, bias=lum)
        return None


@register
class Velvia(Op):
    name = "velvia"
    input_colorspace = Colorspace.WORK_RGB

    def coeffs(self, ctx, plan, p):
        return {"strength": p.strength / 100.0, "bias": p.bias}

    def pointwise_spec(self, plan, ctx):
        from .base import PointwiseSpec

        return PointwiseSpec(consts=("strength", "bias"),
                             fn=lambda b, cd: self.apply(b, cd, plan, None))

    def apply(self, x, c, plan: OpPlan, ctx):
        strength = jnp.asarray(c["strength"], x.dtype)
        bias = jnp.asarray(c["bias"], x.dtype)
        pmax = jnp.max(x, axis=0)
        pmin = jnp.min(x, axis=0)
        plum = (pmax + pmin) * 0.5
        psat = jnp.where(
            plum <= 0.5,
            (pmax - pmin) / (1e-5 + pmax + pmin),
            (pmax - pmin) / (1e-5 + jnp.maximum(0.0, 2.0 - pmax - pmin)),
        )
        pweight = jnp.clip(
            ((1.0 - 1.5 * psat) + (1.0 + jnp.abs(plum - 0.5) * 2.0)
             * (1.0 - bias)) / (1.0 + (1.0 - bias)),
            0.0, 1.0,
        )
        sat = strength * pweight
        others = (jnp.sum(x, axis=0, keepdims=True) - x) * 0.5
        return jnp.clip(x + sat[None] * (x - others), 0.0, 1.0)
