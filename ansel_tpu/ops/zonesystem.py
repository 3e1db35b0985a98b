"""zonesystem — Ansel Adams zone remapping of Lab L.

Reference: `/root/reference/src/iop/zonesystem.c` (params v1,
zonesystem.c:88-92): `size` zones over L in [0,100]; per-zone offsets and
scales from the user zone boundaries (commit: zonemap_offset/scale), L
remapped piecewise-linearly, a/b scaled by the ratio.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..core.params import cfield, params
from ..core.types import Colorspace
from .base import Op, OpPlan, PlanContext, register

MAX_ZONES = 24


@params(op="zonesystem", version=1)
@dataclasses.dataclass
class ZoneSystemParams:
    size: int = cfield("i", 10)
    zone: tuple = cfield(f"{MAX_ZONES + 1}f", (-1.0,) * (MAX_ZONES + 1))


@register
class ZoneSystem(Op):
    name = "zonesystem"
    input_colorspace = Colorspace.LAB

    def plan(self, ctx: PlanContext, spec_in, p) -> OpPlan:
        return OpPlan(spec_in=spec_in, spec_out=spec_in,
                      static=max(2, min(p.size, MAX_ZONES)))

    def coeffs(self, ctx, plan, p: ZoneSystemParams):
        size = plan.static
        # zonemap: boundaries default to uniform; user values override
        zonemap = np.array(
            [p.zone[k] if p.zone[k] >= 0 else k / (size - 1.0)
             for k in range(size)], np.float32)
        xs = np.linspace(0.0, 1.0, size).astype(np.float32)
        return {"xs": xs, "ys": zonemap}

    def apply(self, x, c, plan: OpPlan, ctx: PlanContext):
        from ..pixel.curves import eval_linear

        L = jnp.clip(x[0] / 100.0, 0.0, 1.0)
        L_out = eval_linear(L, c["xs"], c["ys"]) * 100.0
        ratio = L_out / jnp.maximum(x[0], 1e-6)
        return jnp.stack([L_out, x[1] * ratio, x[2] * ratio])
