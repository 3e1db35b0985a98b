"""Hidden plumbing modules that appear in every real sidecar's history but
whose work is owned elsewhere in this build.

  * gamma — reference `/root/reference/src/iop/gamma.c`: final display
    encoding (float -> 8-bit LUT) + GUI mask visualization.  Here the
    display transfer curve is applied by `colorout` and quantization by
    `io/encode.py`, so the pipe stage is an identity.
  * mask_manager — reference `src/develop/masks/mask_manager` placeholder
    module: carries the drawn-shape group list for the GUI, processes no
    pixels (`IOP_FLAGS_NO_HISTORY_STACK` peer).  Params decode so sidecar
    replay is lossless; apply is an identity.
"""

from __future__ import annotations

import dataclasses

from ..core.params import cfield, params
from .base import Op, OpPlan, PlanContext, register


@params(op="gamma", version=1)
@dataclasses.dataclass
class GammaParams:
    gamma: float = cfield("f", 1.0)
    linear: float = cfield("f", 1.0)


@register
class Gamma(Op):
    name = "gamma"
    input_colorspace = None

    def enabled_by_default(self, meta):
        return False


@params(op="mask_manager", version=2)
@dataclasses.dataclass
class MaskManagerParams:
    dummy: int = cfield("i", 0)

    @classmethod
    def from_legacy(cls, version, raw):
        return cls()  # all versions: 4 opaque bytes, no pixel semantics


@register
class MaskManager(Op):
    name = "mask_manager"
    input_colorspace = None

    def enabled_by_default(self, meta):
        return False
