"""drawlayer — painted raster layer composite (headless subset).

Reference: `/root/reference/src/iop/drawlayer.c` + `drawlayer/common.h`
(params v1 :14-21: stroke_commit_hash, 64-char layer name, 256-char work
profile, sidecar timestamp, layer order).  The reference's strokes live
in an on-disk layer cache rendered by an interactive brush engine
(drawlayer/paint.c) — GUI-scope by SURVEY's blueprint.  The headless
subset decodes the params (so real XMPs replay), resolves the layer name
to a premultiplied RGBA raster file next to the sidecar
(`<layer_name>.npz` with an `rgba` array, or any PIL-readable image),
and composites it source-over in work RGB.  A missing layer file is a
planned skip reported through `Pipeline.unsupported`, never a silent
wrong render.
"""

from __future__ import annotations

import dataclasses
import os

import jax.numpy as jnp
import numpy as np

from ..core.params import cfield, params
from ..core.types import Colorspace
from .base import Op, OpPlan, PlanContext, register


@params(op="drawlayer", version=1)
@dataclasses.dataclass
class DrawLayerParams:
    stroke_commit_hash: int = cfield("I", 0)
    layer_name: str = cfield("s:64", "")
    work_profile: str = cfield("s:256", "")
    sidecar_timestamp: int = cfield("q", 0)
    layer_order: int = cfield("i", -1)


def _load_layer(name: str, search_dir: str):
    """-> (4, H, W) premultiplied RGBA float32, or None."""
    if not name:
        return None
    for cand in (os.path.join(search_dir or ".", name + ".npz"),
                 os.path.join(search_dir or ".", name)):
        if not os.path.exists(cand):
            continue
        if cand.endswith(".npz"):
            data = np.load(cand)
            rgba = np.asarray(data["rgba"], np.float32)
            if rgba.shape[-1] == 4:
                rgba = rgba.transpose(2, 0, 1)
            return rgba
        try:
            from PIL import Image

            img = np.asarray(Image.open(cand).convert("RGBA"),
                             np.float32) / 255.0
            rgba = img.transpose(2, 0, 1)
            rgba[:3] *= rgba[3:4]  # premultiply
            return rgba
        except Exception:
            return None
    return None


@register
class DrawLayer(Op):
    name = "drawlayer"
    input_colorspace = Colorspace.WORK_RGB

    def enabled_by_default(self, meta):
        return False

    def plan(self, ctx: PlanContext, spec_in, p: DrawLayerParams) -> OpPlan:
        search = getattr(ctx.meta, "sidecar_dir", "") or ""
        layer = _load_layer(p.layer_name, search)
        if layer is None:
            if p.layer_name:
                raise ValueError(
                    f"drawlayer: layer '{p.layer_name}' not found in "
                    f"'{search}' (export the painted layer as "
                    f"{p.layer_name}.npz next to the sidecar)")
            return OpPlan(spec_in=spec_in, spec_out=spec_in, static=None)
        return OpPlan(spec_in=spec_in, spec_out=spec_in,
                      static=("layer", p.layer_name,
                              layer.shape[1], layer.shape[2]))

    def coeffs(self, ctx: PlanContext, plan: OpPlan, p: DrawLayerParams):
        if plan.static is None:
            return None
        search = getattr(ctx.meta, "sidecar_dir", "") or ""
        return {"rgba": _load_layer(p.layer_name, search)}

    def apply(self, x, c, plan: OpPlan, ctx: PlanContext):
        if plan.static is None:
            return x
        rgba = jnp.asarray(c["rgba"])
        h, w = x.shape[1], x.shape[2]
        lh, lw = rgba.shape[1], rgba.shape[2]
        if (lh, lw) != (h, w):
            import jax

            rgba = jax.image.resize(rgba, (4, h, w), method="bilinear")
        color, alpha = rgba[:3], rgba[3:4]
        # source-over with premultiplied layer color
        return color + x * (1.0 - alpha)
