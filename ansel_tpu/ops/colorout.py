"""colorout — working RGB -> output color profile (display-referred).

Reference: `/root/reference/src/iop/colorout.c` (params v5,
colorout.c:107-112).  Matrix+TRC output profiles (sRGB default, AdobeRGB,
Rec709, Display-P3) are exact here; LCMS LUT/ICC-intent profiles are a later
milestone.  The transfer curve is applied in-graph right after the matrix so
XLA fuses matrix+TRC into one pass.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..color import matrices as cm
from ..color.transforms import apply_matrix, gamma_encode, srgb_encode
from ..core.params import cfield, params
from ..core.types import Colorspace, ImageSpec
from .base import Op, OpPlan, PlanContext, register
from .colorin import (CS_ADOBERGB, CS_DISPLAY_P3, CS_LIN_REC709,
                      CS_LIN_REC2020, CS_PROPHOTO, CS_REC709, CS_SRGB,
                      _WORK_NAMES)

# transfer curves per output profile type
_TRC = {
    CS_SRGB: "srgb",
    CS_DISPLAY_P3: "srgb",
    CS_ADOBERGB: ("gamma", 563.0 / 256.0),  # AdobeRGB 2.19921875
    CS_REC709: ("gamma", 1.0 / 0.45),
    CS_LIN_REC709: "linear",
    CS_LIN_REC2020: "linear",
    CS_PROPHOTO: ("gamma", 1.8),
}


@params(op="colorout", version=5)
@dataclasses.dataclass
class ColoroutParams:
    type: int = cfield("i", CS_SRGB)
    filename: str = cfield("s:512", "")
    intent: int = cfield("i", 0)


@register
class Colorout(Op):
    name = "colorout"
    input_colorspace = Colorspace.WORK_RGB
    mandatory = True

    def plan(self, ctx: PlanContext, spec_in: ImageSpec, p: ColoroutParams) -> OpPlan:
        trc = _TRC.get(p.type, "srgb")
        dst = _WORK_NAMES.get(p.type, "srgb")
        return OpPlan(
            spec_in=spec_in,
            spec_out=spec_in.with_colorspace(Colorspace.DISPLAY_RGB),
            static=(dst, trc),
        )

    def coeffs(self, ctx: PlanContext, plan: OpPlan, p: ColoroutParams):
        dst, _ = plan.static
        work = ctx.notes.get("work_profile", cm.WORK_PROFILE)
        M = cm.rgb_to_rgb_matrix(work, dst)
        return {"M": M.astype(np.float32)}

    def apply(self, x, c, plan: OpPlan, ctx: PlanContext):
        _, trc = plan.static
        y = apply_matrix(x, c["M"])
        y = jnp.clip(y, 0.0, 1.0)
        if trc == "srgb":
            return srgb_encode(y)
        if trc == "linear":
            return y
        return gamma_encode(y, trc[1])

    def pointwise_spec(self, plan, ctx):
        from .base import PointwiseSpec
        _, trc = plan.static

        def fn(b, cd):
            y = jnp.clip(apply_matrix(b, cd["M"]), 0.0, 1.0)
            if trc == "srgb":
                return srgb_encode(y)
            if trc == "linear":
                return y
            return gamma_encode(y, trc[1])

        return PointwiseSpec(consts=("M",), mats=("M",), fn=fn)
