"""monochrome — B&W conversion with a virtual color filter.

Reference: `/root/reference/src/iop/monochrome.c` (params v2
monochrome.c:84-90): L_out = 100 * filter(a, b) with a Gaussian chroma
filter centered at (p.a, p.b) of width p.size*128, smoothed (reference uses
a bilateral grid; we use the exposure-safe Gaussian for now), then
highlight-weighted blend with the original L.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..core.params import cfield, params
from ..core.types import Colorspace
from ..pixel.blur import fast_gaussian
from .base import Op, OpPlan, PlanContext, register


@params(op="monochrome", version=2)
@dataclasses.dataclass
class MonochromeParams:
    a: float = cfield("f", 0.0)
    b: float = cfield("f", 0.0)
    size: float = cfield("f", 2.0)
    highlights: float = cfield("f", 0.0)


    @classmethod
    def from_legacy(cls, version, raw):
        import struct

        # monochrome.c v1 = v2 minus trailing highlights (set to 0)
        if version == 1:
            a, b, size = struct.unpack("<3f", raw[:12])
            return cls(a=a, b=b, size=size, highlights=0.0)
        return None


def _color_filter(a, b, fa, fb, sigma2):
    return jnp.exp(-jnp.clip(((a - fa) ** 2 + (b - fb) ** 2) / (2.0 * sigma2),
                             0.0, 30.0))


@register
class Monochrome(Op):
    name = "monochrome"
    input_colorspace = Colorspace.LAB

    def coeffs(self, ctx, plan, p):
        return {"a": p.a, "b": p.b,
                "sigma2": (p.size * 128.0) ** 2,
                "highlights": p.highlights}

    def apply(self, x, c, plan: OpPlan, ctx: PlanContext):
        filt = 100.0 * _color_filter(x[1], x[2], c["a"], c["b"], c["sigma2"])
        # smooth the filter response (bilateral in the reference; a wide
        # Gaussian keeps it local & cheap — bilateral grid kernel pending)
        filt = fast_gaussian(filt, 20.0 / max(ctx.scale, 1e-3))
        tt = jnp.asarray(c["highlights"], x.dtype)
        L = x[0]
        tmpL = jnp.clip(L * filt / 100.0, 0.0, 100.0)
        out_L = jnp.clip((1.0 - tt) * tmpL + tt * L, 0.0, 100.0)
        z = jnp.zeros_like(L)
        return jnp.stack([out_L, z, z])
