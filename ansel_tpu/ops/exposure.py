"""exposure — scene-referred gain + black level correction.

Reference: `/root/reference/src/iop/exposure.c` — params v6
(exposure.c:114-122); scale = 1 / (2^-exposure - black)
(exposure2white macro exposure.c:92, _process_common_setup exposure.c:431-468);
process: out = (in - black) * scale; processed_maximum *= scale
(commit_params exposure.c:630).  compensate_exposure_bias subtracts the EXIF
exposure bias from the user exposure (exposure.c:611-612).
"""

from __future__ import annotations

import dataclasses

from ..core.params import cfield, params
from ..core.types import Colorspace, ImageSpec
from .base import Op, OpPlan, PlanContext, register

EXPOSURE_MODE_MANUAL = 0
EXPOSURE_MODE_DEFLICKER = 1


@params(op="exposure", version=6)
@dataclasses.dataclass
class ExposureParams:
    mode: int = cfield("i", EXPOSURE_MODE_MANUAL)
    black: float = cfield("f", 0.0)
    exposure: float = cfield("f", 0.0)
    deflicker_percentile: float = cfield("f", 50.0)
    deflicker_target_level: float = cfield("f", -4.0)
    compensate_exposure_bias: int = cfield("i", 0)

    @classmethod
    def from_legacy(cls, version, raw):
        import struct

        if version == 2:  # exposure.c:209-230: {black, exposure, gain}
            black, exposure, _gain = struct.unpack("<3f", raw[:12])
            return cls(black=black, exposure=exposure)
        if version in (3, 4, 5):
            # v3+: same leading fields as v6 minus trailing additions
            vals = struct.unpack("<iffff", raw[:20])
            return cls(mode=vals[0], black=vals[1], exposure=vals[2],
                       deflicker_percentile=vals[3],
                       deflicker_target_level=vals[4])
        return None


@register
class Exposure(Op):
    name = "exposure"
    input_colorspace = None  # works on mosaic or RGB identically

    def _scale(self, ctx: PlanContext, p: ExposureParams):
        exposure = p.exposure
        if p.compensate_exposure_bias:
            exposure -= ctx.meta.exposure_bias
        white = 2.0 ** (-exposure)
        return 1.0 / (white - p.black)

    def plan(self, ctx: PlanContext, spec_in: ImageSpec, p) -> OpPlan:
        s = self._scale(ctx, p)
        ctx.processed_maximum = tuple(m * s for m in ctx.processed_maximum)
        return OpPlan(spec_in=spec_in, spec_out=spec_in)

    def coeffs(self, ctx: PlanContext, plan: OpPlan, p):
        return {"black": p.black, "scale": self._scale(ctx, p)}

    def apply(self, x, c, plan: OpPlan, ctx: PlanContext):
        import jax.numpy as jnp

        return (x - jnp.asarray(c["black"], x.dtype)) * jnp.asarray(
            c["scale"], x.dtype
        )

    def pointwise_spec(self, plan, ctx):
        from .base import PointwiseSpec

        return PointwiseSpec(
            consts=("black", "scale"),
            fn=lambda b, cd: (b - cd["black"]) * cd["scale"])
