"""splittoning — tint shadows/highlights with chosen hues.

Reference: `/root/reference/src/iop/splittoning.c` (params v1,
splittoning.c:89-97; process: per-pixel HSL lightness selects the shadow or
highlight zone around `balance` with a `compress` dead-band; the pixel is
linearly mixed toward hsl(hue, saturation, L)).  Display-referred RGB.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..core.params import cfield, params
from ..core.types import Colorspace
from ._hsl import hsl_to_rgb, rgb_to_hsl
from .base import Op, OpPlan, PlanContext, register


@params(op="splittoning", version=1)
@dataclasses.dataclass
class SplitToningParams:
    shadow_hue: float = cfield("f", 0.0)
    shadow_saturation: float = cfield("f", 0.5)
    highlight_hue: float = cfield("f", 0.2)
    highlight_saturation: float = cfield("f", 0.5)
    balance: float = cfield("f", 0.5)
    compress: float = cfield("f", 33.0)


@register
class SplitToning(Op):
    name = "splittoning"
    input_colorspace = Colorspace.WORK_RGB

    def coeffs(self, ctx, plan, p):
        return {"shadow_hue": p.shadow_hue, "shadow_sat": p.shadow_saturation,
                "hl_hue": p.highlight_hue, "hl_sat": p.highlight_saturation,
                "balance": p.balance,
                "compress": (p.compress / 110.0) / 2.0}

    def pointwise_spec(self, plan, ctx):
        from .base import PointwiseSpec

        return PointwiseSpec(
            consts=("shadow_hue", "shadow_sat", "hl_hue", "hl_sat",
                    "balance", "compress"),
            fn=lambda b, cd: self.apply(b, cd, plan, None))

    def apply(self, x, c, plan: OpPlan, ctx: PlanContext):
        xc = jnp.clip(x, 0.0, 1.0)
        _, _, l = rgb_to_hsl(xc)
        bal = jnp.asarray(c["balance"], x.dtype)
        comp = jnp.asarray(c["compress"], x.dtype)
        ones = jnp.ones_like(l)

        shadow_mix = hsl_to_rgb(ones * c["shadow_hue"],
                                ones * c["shadow_sat"], l)
        hl_mix = hsl_to_rgb(ones * c["hl_hue"], ones * c["hl_sat"], l)

        ra_sh = jnp.clip((bal - comp - l) * 2.0, 0.0, 1.0)
        ra_hl = jnp.clip((l - (bal + comp)) * 2.0, 0.0, 1.0)
        out = xc * (1.0 - ra_sh[None]) + shadow_mix * ra_sh[None]
        out = out * (1.0 - ra_hl[None]) + hl_mix * ra_hl[None]
        return jnp.clip(out, 0.0, 1.0)
