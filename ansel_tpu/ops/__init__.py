"""Image operation modules (the reference's `src/iop/` plugins, re-designed
as pure-JAX / Pallas ops — see ops/base.py for the protocol)."""

from . import (  # noqa: F401
    colorin,
    colorout,
    demosaic,
    exposure,
    filmicrgb,
    highlights,
    rawprepare,
    temperature,
)
from .base import all_ops

ALL_OPS = all_ops()
