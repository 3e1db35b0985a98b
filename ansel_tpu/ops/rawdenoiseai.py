"""rawdenoiseai — CNN raw denoiser (U-Net on the mosaic).

Reference: `/root/reference/src/iop/rawdenoiseai.c` (params v1,
rawdenoiseai.c:159-176) + the inference engine `src/common/nn_model.{h,c}`.
Input planes (fine stage, rawdenoiseai.c:874-905): [mosaic, R/G/B one-hot,
sigma] with sigma = scale[c] * sqrt(a[c]*max(v,0) + b[c]) from the noise
profile variance line and the per-channel correction sliders; output is the
noise residual subtracted from the mosaic, blended by `strength`.

Models load from `.anselnn` files (io/anselnn.py).  The multi-scale
"unet-ms" coarse stage is a later milestone; arch "unet" is complete.
Model resolution order: explicit ModelRegistry entry -> custom_model path.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..core.params import cfield, params
from ..core.types import CFAPattern, Colorspace
from ..io.anselnn import NNModel, load_anselnn
from ..kernels.unet import unet_forward
from . import _bayer
from .base import Op, OpPlan, PlanContext, register

# host-side registry: name -> NNModel (tests/apps inject models here; the
# reference resolves shipped models from its data dir the same way)
MODEL_REGISTRY: Dict[str, NNModel] = {}
MODEL_SEARCH_PATH = [os.path.expanduser("~/.config/ansel_tpu/models")]


@params(op="rawdenoiseai", version=1)
@dataclasses.dataclass
class RawDenoiseAIParams:
    strength: float = cfield("f", 0.85)
    version: int = cfield("i", 0)
    size: int = cfield("i", 0)
    noise_level: float = cfield("f", 1.0)
    sigma_red: float = cfield("f", 2.82)
    sigma_green: float = cfield("f", 3.94)
    sigma_blue: float = cfield("f", 2.96)
    scale_variant: int = cfield("i", 0)
    custom_model: str = cfield("s:128", "")


def _resolve_model(p: RawDenoiseAIParams) -> Optional[NNModel]:
    name = p.custom_model or f"v{p.version}_s{p.size}_sc{p.scale_variant}"
    if name in MODEL_REGISTRY:
        return MODEL_REGISTRY[name]
    if p.custom_model:
        for d in MODEL_SEARCH_PATH:
            path = os.path.join(d, p.custom_model)
            if os.path.exists(path):
                model = load_anselnn(path)
                MODEL_REGISTRY[name] = model
                return model
    return None


@register
class RawDenoiseAI(Op):
    name = "rawdenoiseai"
    input_colorspace = Colorspace.RAW

    def plan(self, ctx: PlanContext, spec_in, p: RawDenoiseAIParams) -> OpPlan:
        model = _resolve_model(p)
        key = None
        if model is not None:
            key = (p.custom_model
                   or f"v{p.version}_s{p.size}_sc{p.scale_variant}")
        return OpPlan(spec_in=spec_in, spec_out=spec_in, static=key)

    def coeffs(self, ctx: PlanContext, plan: OpPlan, p: RawDenoiseAIParams):
        if plan.static is None:
            return None
        model = MODEL_REGISTRY[plan.static]
        # generic profile fallback (profiled values come from
        # noiseprofiles.json when available)
        a = np.full(3, 1e-4, np.float32)
        b = np.full(3, 1e-6, np.float32)
        scale = np.float32([p.sigma_red, p.sigma_green, p.sigma_blue]) \
            * p.noise_level
        return {
            "weights": {k: v for k, v in model.tensors.items()},
            "a": a, "b": b, "scale": scale,
            "strength": np.float32(p.strength),
        }

    def apply(self, x, c, plan: OpPlan, ctx: PlanContext):
        if plan.static is None:
            return x  # no model resolved: identity (reference disables)
        model = MODEL_REGISTRY[plan.static]
        spec = plan.spec_in
        h, w = spec.pad_h, spec.pad_w
        if spec.cfa is CFAPattern.XTRANS:
            masks = _bayer.xtrans_color_masks(ctx.meta.xtrans, h, w, x.dtype)
        else:
            masks = _bayer.color_masks(spec.cfa, h, w, x.dtype)
        a = _bayer.color_select([c["a"][0], c["a"][1], c["a"][2], c["a"][1]],
                                spec.cfa, h, w) \
            if spec.cfa is not CFAPattern.XTRANS else \
            _bayer.xtrans_color_select(list(c["a"]), ctx.meta.xtrans, h, w)
        b = _bayer.color_select([c["b"][0], c["b"][1], c["b"][2], c["b"][1]],
                                spec.cfa, h, w) \
            if spec.cfa is not CFAPattern.XTRANS else \
            _bayer.xtrans_color_select(list(c["b"]), ctx.meta.xtrans, h, w)
        sc = _bayer.color_select(
            [c["scale"][0], c["scale"][1], c["scale"][2], c["scale"][1]],
            spec.cfa, h, w) if spec.cfa is not CFAPattern.XTRANS else \
            _bayer.xtrans_color_select(list(c["scale"]), ctx.meta.xtrans,
                                       h, w)
        var = a * jnp.maximum(x, 0.0) + b
        sigma = sc * jnp.sqrt(jnp.maximum(var, 1e-12))
        planes = jnp.stack([x, masks[0], masks[1], masks[2], sigma])
        noise = unet_forward(model, planes, weights=c["weights"])[0]
        denoised = x - noise
        s = c["strength"]
        return x * (1.0 - s) + denoised * s
