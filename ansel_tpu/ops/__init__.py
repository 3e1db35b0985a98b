"""Image operation modules (the reference's `src/iop/` plugins, re-designed
as pure-JAX / Pallas ops — see ops/base.py for the protocol)."""

from . import (  # noqa: F401
    atrous,
    bloom,
    channelmixerrgb,
    colorbalancergb,
    colorcontrast,
    colorin,
    colorize,
    colorout,
    crop,
    demosaic,
    denoiseprofile,
    diffuse,
    exposure,
    filmicrgb,
    finalscale,
    flip,
    graduatednd,
    highlights,
    highpass,
    invert,
    lowpass,
    monochrome,
    rawprepare,
    rgbcurve,
    sharpen,
    soften,
    splittoning,
    temperature,
    toneequal,
    velvia,
    vibrance,
)
from .base import all_ops

ALL_OPS = all_ops()
