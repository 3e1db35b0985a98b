"""profile_gamma — unbreak input profile (log / gamma camera response undo).

Reference: `/root/reference/src/iop/profile_gamma.c` — params v2 (:78-87),
log mode (:212-250: value/grey -> (log2 - shadows)/range, noise floor
2^-16), gamma mode (:450-487: pure power with an optional linear toe
segment).  TPU-first: the gamma curve is evaluated in closed form instead
of the reference's 64k LUT — the piecewise expression fuses into the graph
and there is no table memory traffic.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..core.params import cfield, params
from ..core.types import Colorspace
from .base import Op, OpPlan, PlanContext, register

MODE_LOG = 0
MODE_GAMMA = 1
NOISE = 2.0 ** -16


@params(op="profile_gamma", version=2)
@dataclasses.dataclass
class ProfileGammaParams:
    mode: int = cfield("i", MODE_LOG)
    linear: float = cfield("f", 0.1)
    gamma: float = cfield("f", 0.45)
    dynamic_range: float = cfield("f", 10.0)
    grey_point: float = cfield("f", 18.0)
    shadows_range: float = cfield("f", -5.0)
    security_factor: float = cfield("f", 0.0)


    @classmethod
    def from_legacy(cls, version, raw):
        import struct

        # profile_gamma.c v1 {linear, gamma} -> mode GAMMA (= 0)
        if version == 1:
            lin, gam = struct.unpack("<2f", raw[:8])
            return cls(mode=0, linear=lin, gamma=gam)
        return None


@register
class ProfileGamma(Op):
    name = "profile_gamma"
    input_colorspace = None  # pre-colorin: camera RGB

    def plan(self, ctx: PlanContext, spec_in, p: ProfileGammaParams) -> OpPlan:
        return OpPlan(spec_in=spec_in, spec_out=spec_in,
                      static=(p.mode, p.gamma == 1.0, p.linear == 0.0,
                              p.linear >= 1.0))

    def coeffs(self, ctx: PlanContext, plan: OpPlan, p: ProfileGammaParams):
        if p.mode == MODE_LOG:
            return {
                "grey": jnp.float32(p.grey_point / 100.0),
                "shadows": jnp.float32(p.shadows_range),
                "range": jnp.float32(p.dynamic_range),
            }
        # linear-toe power curve constants (profile_gamma.c:462-470)
        lin, g0 = p.linear, p.gamma
        if g0 == 1.0 or lin >= 1.0:
            a = b = g = 0.0
            cc = 1.0
        elif lin == 0.0:
            a, b, cc, g = 1.0, 0.0, 1.0, g0
        else:
            g = g0 * (1.0 - lin) / (1.0 - g0 * lin)
            a = 1.0 / (1.0 + lin * (g - 1.0))
            b = lin * (g - 1.0) * a
            cc = (a * lin + b) ** g / lin
        return {"a": jnp.float32(a), "b": jnp.float32(b),
                "c": jnp.float32(cc), "g": jnp.float32(g),
                "linear": jnp.float32(lin)}

    def pointwise_spec(self, plan, ctx):
        from .base import PointwiseSpec

        mode = plan.static[0]
        keys = (("grey", "shadows", "range") if mode == MODE_LOG
                else ("a", "b", "c", "g", "linear"))
        return PointwiseSpec(consts=keys,
                             fn=lambda b, cd: self.apply(b, cd, plan, None))

    def apply(self, x, c, plan: OpPlan, ctx: PlanContext):
        mode, gamma_is_1, linear_is_0, linear_ge_1 = plan.static
        if mode == MODE_LOG:
            t = jnp.maximum(x / c["grey"], NOISE)
            t = (jnp.log2(t) - c["shadows"]) / c["range"]
            return jnp.maximum(t, NOISE)
        if gamma_is_1 or linear_ge_1:
            return x * c["c"]
        safe = jnp.maximum(x, 0.0)
        if linear_is_0:
            return safe ** c["g"]
        toe = c["c"] * x
        power = jnp.maximum(c["a"] * safe + c["b"], 0.0) ** c["g"]
        return jnp.where(x < c["linear"], toe, power)
