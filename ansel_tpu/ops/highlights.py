"""highlights — clipped-highlight reconstruction.

Reference: `/root/reference/src/iop/highlights/` — params struct
common.h:428-446; modes (common.h:403-410): CLIP (hard clamp at
threshold, highlights/clip.c), LCH (2x2-cell chroma-ratio reconstruction,
highlights/lch.c:316-410), INPAINT / guided-LAPLACIAN / HARMONIC
(wavelet-scale segmentation paths — later rounds; they alias to LCH).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..core.params import cfield, params
from ..core.types import CFAPattern, Colorspace, ImageSpec
from . import _bayer
from .base import Op, OpPlan, PlanContext, register

MODE_CLIP = 0   # DT_IOP_HIGHLIGHTS_CLIP
MODE_LCH = 1
MODE_INPAINT = 2
MODE_LAPLACIAN = 3
MODE_HARMONIC = 4

SQRT3 = 3.0**0.5
SQRT12 = 12.0**0.5


@params(op="highlights", version=4)
@dataclasses.dataclass
class HighlightsParams:
    mode: int = cfield("i", MODE_CLIP)
    blendL: float = cfield("f", 1.0)   # unused (v1 leftovers)
    blendC: float = cfield("f", 0.0)
    blendh: float = cfield("f", 0.0)
    clip: float = cfield("f", 1.0)
    noise_level: float = cfield("f", 0.0)
    iterations: int = cfield("i", 30)
    scales: int = cfield("i", 8)
    reconstructing: float = cfield("f", 0.4)
    combine: float = cfield("f", 2.0)
    debugmode: int = cfield("i", 0)
    solid_color: float = cfield("f", 0.5)

    @classmethod
    def from_legacy(cls, version, raw):
        import struct

        if version == 1:  # highlights.c:163-184: {mode, blendL, blendC, blendh}
            mode, bl, bc, bh = struct.unpack("<i3f", raw[:16])
            return cls(mode=mode, blendL=bl, blendC=bc, blendh=bh, clip=1.0,
                       noise_level=0.0, iterations=1, scales=5,
                       reconstructing=0.4, combine=2.0, solid_color=0.0)
        if version == 2:  # highlights.c:185-209: v1 + {clip}
            mode, bl, bc, bh, clip = struct.unpack("<i4f", raw[:20])
            return cls(mode=mode, blendL=bl, blendC=bc, blendh=bh, clip=clip,
                       noise_level=0.0, iterations=1, scales=5,
                       reconstructing=0.4, combine=2.0, solid_color=0.0)
        if version == 3:  # highlights.c:210-220: v4 minus {solid_color}
            p = cls.codec.decode(raw[:44] + b"\0" * 4)
            p.solid_color = 0.0
            return p
        return None


@register
class Highlights(Op):
    name = "highlights"
    input_colorspace = Colorspace.RAW
    mandatory = True

    def plan(self, ctx: PlanContext, spec_in: ImageSpec, p) -> OpPlan:
        # reference clamps processed_maximum to the clip threshold
        clipval = p.clip * min(ctx.processed_maximum)
        ctx.processed_maximum = tuple(
            min(m, clipval) for m in ctx.processed_maximum
        )
        ctx.notes["highlights_clip"] = clipval
        return OpPlan(spec_in=spec_in, spec_out=spec_in, static=p.mode)

    def coeffs(self, ctx: PlanContext, plan: OpPlan, p):
        return {"clip": ctx.notes["highlights_clip"]}

    def apply(self, x, c, plan: OpPlan, ctx: PlanContext):
        clip = jnp.asarray(c["clip"], x.dtype)
        mode = plan.static
        spec = plan.spec_in
        if (mode in (MODE_LCH, MODE_INPAINT, MODE_LAPLACIAN, MODE_HARMONIC)
                and spec.cfa is not None
                and spec.cfa is not CFAPattern.XTRANS):
            return self._lch_bayer(x, clip, spec)
        return jnp.minimum(x, clip)

    def _lch_bayer(self, x, clip, spec):
        """process_lch_bayer (highlights/lch.c:316-410): per pixel, analyse
        the 2x2 cell anchored at it; if any channel clipped, rebuild the
        pixel from unclipped-luminance + chroma-ratio-scaled C/H."""
        h, w = spec.pad_h, spec.pad_w
        from ..pixel.shifts import PaddedView

        pv = PaddedView(x, 1)
        v = {(jj, ii): pv.at(jj, ii) for jj in (0, 1) for ii in (0, 1)}
        R = jnp.zeros_like(x)
        B = jnp.zeros_like(x)
        Gmin = jnp.full_like(x, jnp.inf)
        Gmax = jnp.full_like(x, -jnp.inf)
        clipped = jnp.zeros_like(x, dtype=bool)
        for (jj, ii), val in v.items():
            cfa_off = spec.cfa.shifted(jj, ii)
            masks = _bayer.color_masks(cfa_off, h, w, x.dtype)
            clipped = clipped | (val > clip)
            R = jnp.where(masks[0] > 0, val, R)
            B = jnp.where(masks[2] > 0, val, B)
            is_g = masks[1] > 0
            Gmin = jnp.where(is_g, jnp.minimum(Gmin, val), Gmin)
            Gmax = jnp.where(is_g, jnp.maximum(Gmax, val), Gmax)

        Ro = jnp.minimum(R, clip)
        Go = jnp.minimum(Gmin, clip)
        Bo = jnp.minimum(B, clip)
        L = (R + Gmax + B) / 3.0
        C = SQRT3 * (R - Gmax)
        H = 2.0 * B - Gmax - R
        Co = SQRT3 * (Ro - Go)
        Ho = 2.0 * Bo - Go - Ro
        denom = C * C + H * H
        ratio = jnp.sqrt((Co * Co + Ho * Ho) / jnp.maximum(denom, 1e-12))
        do_scale = (R != Gmax) & (Gmax != B)
        C = jnp.where(do_scale, C * ratio, C)
        H = jnp.where(do_scale, H * ratio, H)
        rgb = [L - H / 6.0 + C / SQRT12,
               L - H / 6.0 - C / SQRT12,
               L + H / 3.0]
        masks0 = _bayer.color_masks(spec.cfa, h, w, x.dtype)
        own = (masks0[0] * rgb[0] + masks0[1] * rgb[1] + masks0[2] * rgb[2])
        return jnp.where(clipped, own, x)
