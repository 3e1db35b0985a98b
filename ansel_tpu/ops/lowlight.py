"""lowlight — scotopic (night) vision simulation.

Reference: `/root/reference/src/iop/lowlight.c` — params v1 (:78-83),
process (:~150-210): scotopic luminance V from XYZ, blue-shifted scotopic
white, Catmull-Rom transition curve over L selecting day/night blending.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..color.transforms import lab_to_xyz, xyz_to_lab
from ..core.params import cfield, params
from ..core.types import Colorspace
from ..pixel.curves import CATMULL_ROM, curve_coeffs, eval_curve
from .base import Op, OpPlan, PlanContext, register

BANDS = 6
# D50 in the reference; this pipeline is D65-referenced throughout
from ..color.matrices import PIPE_WHITE_XYZ as _WHITE_ARR

_WHITE = tuple(float(v) for v in _WHITE_ARR)  # D50 Lab white (reference dt_Lab_to_XYZ)


@params(op="lowlight", version=1)
@dataclasses.dataclass
class LowlightParams:
    blueness: float = cfield("f", 0.0)
    transition_x: tuple = cfield("6f", tuple(k / (BANDS - 1.0)
                                             for k in range(BANDS)))
    transition_y: tuple = cfield("6f", (0.5,) * BANDS)


@register
class Lowlight(Op):
    name = "lowlight"
    input_colorspace = Colorspace.LAB

    def coeffs(self, ctx: PlanContext, plan: OpPlan, p: LowlightParams):
        # periodic-ish end padding like the reference (lowlight.c:218-222)
        xs = ([p.transition_x[BANDS - 2] - 1.0] + list(p.transition_x)
              + [p.transition_x[1] + 1.0])
        ys = [p.transition_y[0]] + list(p.transition_y) \
            + [p.transition_y[BANDS - 1]]
        cx, cy, cmv = curve_coeffs(np.asarray(xs), np.asarray(ys),
                                   CATMULL_ROM)
        # scotopic white: Lab(100, 0, -blueness) -> XYZ
        sw_lab = jnp.asarray([100.0, 0.0, -p.blueness],
                             jnp.float32).reshape(3, 1, 1)
        sw = lab_to_xyz(sw_lab, _WHITE).reshape(3)
        return {"cx": cx, "cy": cy, "cm": cmv, "sw": sw}

    def pointwise_spec(self, plan, ctx):
        from .base import PointwiseSpec

        return PointwiseSpec(consts=("cx", "cy", "cm", "sw"),
                             lists=("cx", "cy", "cm", "sw"),
                             fn=lambda b, cd: self.apply(b, cd, plan, None))

    def apply(self, x, c, plan: OpPlan, ctx: PlanContext):
        xyz = lab_to_xyz(x, _WHITE)
        threshold = 0.01
        denom = jnp.maximum(xyz[0], threshold)
        V = xyz[1] * (1.33 * (1.0 + (xyz[1] + xyz[2]) / denom) - 1.68)
        V = jnp.clip(0.5 * V, 0.0, 1.0)
        w = jnp.clip(eval_curve(x[0] / 100.0, c["cx"], c["cy"], c["cm"]),
                     0.0, 1.0)
        sw = c["sw"]
        mixed = jnp.stack([w * xyz[i] + (1.0 - w) * V * sw[i]
                           for i in range(3)])
        return xyz_to_lab(mixed, _WHITE)
