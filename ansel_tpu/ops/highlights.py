"""highlights — clipped-highlight reconstruction.

Reference: `/root/reference/src/iop/highlights/` — params struct
common.h:428-446; modes (common.h:403-410): CLIP (hard clamp at
threshold, highlights/clip.c), LCH (2x2-cell chroma-ratio reconstruction,
highlights/lch.c:316-410), INPAINT (directional ratio-decay color
inpainting, highlights/inpaint.c — exact, associative-scan form),
guided-LAPLACIAN (highlights/laplacian.c via
kernels/highlights_laplacian.py — 1/4-res wavelet guided fit + ratio
diffusion); HARMONIC (highlights/segmentation.c + dome.c + region.c) =
the guided-laplacian pass plus the segmentation path's all-clip joint
core — a biharmonic luminance dome x diffused chromaticity solved as a
global masked multi-level system (kernels/highlights_harmonic.py).
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
        pmax = tuple(m if m > 0 else 1.0 for m in ctx.processed_maximum)
        clipval = p.clip * min(pmax)
        ctx.processed_maximum = tuple(
            min(m, clipval) for m in ctx.processed_maximum
        )
        ctx.notes["highlights_clip"] = clipval
        # per-channel thresholds (highlights.c:385-389)
        ctx.notes["highlights_clips"] = tuple(
            0.995 * p.clip * m for m in pmax[:3])
        return OpPlan(spec_in=spec_in, spec_out=spec_in,
                      static=(p.mode, max(int(p.scales), 1),
                              max(int(p.iterations), 1),
                              round(float(p.noise_level), 6),
                              round(float(p.solid_color), 6)))

    def roi_in(self, plan: OpPlan, ctx: PlanContext, win):
        # CLIP/LCH are local mosaic ops (<= 3x3 support; 6 preserves CFA
        # window alignment); the multiscale reconstructions need the frame
        si, so = plan.spec_in, plan.spec_out
        if tuple(win) == (0, 0, so.height, so.width):
            return (0, 0, si.height, si.width)
        if plan.static[0] not in (MODE_CLIP, MODE_LCH):
            return None
        halo = 6
        y0 = max(0, win[0] - halo)
        x0 = max(0, win[1] - halo)
        y1 = min(si.height, win[0] + win[2] + halo)
        x1 = min(si.width, win[1] + win[3] + halo)
        return (y0, x0, y1 - y0, x1 - x0)

    def coeffs(self, ctx: PlanContext, plan: OpPlan, p):
        return {"clip": ctx.notes["highlights_clip"],
                "clips": list(ctx.notes["highlights_clips"])}

    def apply(self, x, c, plan: OpPlan, ctx: PlanContext):
        clip = jnp.asarray(c["clip"], x.dtype)
        mode, scales_p, iters, noise_lv, solid = plan.static
        spec = plan.spec_in
        is_mosaic = spec.cfa is not None
        if mode == MODE_INPAINT and is_mosaic:
            return self._inpaint(x, c, spec, ctx)
        if (mode in (MODE_LAPLACIAN, MODE_HARMONIC)
                and is_mosaic and spec.cfa is not CFAPattern.XTRANS):
            from ..kernels import highlights_laplacian as hl

            rec = hl.laplacian_reconstruct(
                x, c["clips"], spec.cfa, scales_p, iters, noise_lv,
                solid, zoom=max(ctx.scale, 1e-6))
            if mode == MODE_HARMONIC:
                # segmentation path's all-clip joint core: biharmonic
                # luminance dome x diffused chroma on the fully-clipped
                # holes (highlights/segmentation.c + dome.c + region.c
                # steps 7-8; TPU-native masked multi-level solve — see
                # kernels/highlights_harmonic.py)
                from ..kernels import highlights_harmonic as hh

                rec = hh.harmonic_dome_core(x, rec, c["clips"], spec.cfa)
            return rec
        if mode == MODE_LCH and is_mosaic \
                and spec.cfa is not CFAPattern.XTRANS:
            return self._lch_bayer(x, clip, spec)
        return jnp.minimum(x, clip)

    def _clip_map(self, clips, spec, ctx, dtype, h, w):
        """per-pixel clip threshold = clips[FC(j, i)]."""
        if spec.cfa is CFAPattern.XTRANS:
            masks = _bayer.xtrans_color_masks(ctx.meta.xtrans, h, w, dtype)
        else:
            masks = _bayer.color_masks(spec.cfa, h, w, dtype)
        return (masks[0] * clips[0] + masks[1] * clips[1]
                + masks[2] * clips[2])

    def _inpaint(self, x, c, spec, ctx):
        """process_inpaint_bayer/xtrans (highlights/inpaint.c:64-104 →
        interpolate_color, highlights/lch.c:206-300): four directional
        sweeps; along each, a running odd/even intensity ratio with
        exponential decay (ratio' = (3·ratio + r)/4 at unclipped pairs)
        rebuilds clipped samples from their scan-direction neighbour.

        TPU form: the ratio recurrence is a first-order linear recurrence
        x_k = a_k·x_{k-1} + b_k, evaluated in log-depth with ONE
        `lax.associative_scan` per direction; everything else is
        elementwise.  The four directional estimates average exactly like
        the reference's pass 0/1/2/3 accumulation."""
        import jax

        eps = 1e-5
        H, W = x.shape[-2:]
        clip0 = self._clip_map(c["clips"], spec, ctx, x.dtype, H, W)

        def comb(left, right):
            al, bl = left
            ar, br = right
            return al * ar, bl * ar + br

        row = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        interior = (row > 0) & (row < H - 1) & (col > 0) & (col < W - 1)

        def sweep(axis, direction):
            nxt = jnp.roll(x, -direction, axis=axis)
            clip1 = jnp.roll(clip0, -direction, axis=axis)
            idx = jax.lax.broadcasted_iota(jnp.int32, (H, W), axis)
            odd = (idx & 1) == 1
            # image-border pixels neither update the ratio nor write
            # (interpolate_color's leading border check)
            both_ok = ((x < clip0) & (x > eps) & (nxt < clip1) & (nxt > eps)
                       & interior)
            r = jnp.where(odd, x / jnp.maximum(nxt, eps),
                          nxt / jnp.maximum(x, eps))
            a = jnp.where(both_ok, 0.75, 1.0)
            b = jnp.where(both_ok, 0.25 * r, 0.0)
            aa, bb = jax.lax.associative_scan(
                comb, (a, b), axis=axis, reverse=(direction < 0))
            ratio = aa + bb  # x_init = 1
            return jnp.where(
                nxt >= clip1 - eps, jnp.maximum(clip0, clip1),
                jnp.where(odd, nxt * ratio,
                          nxt / jnp.maximum(ratio, 1e-12)))

        add = (sweep(1, 1) + sweep(1, -1) + sweep(0, 1)
               + sweep(0, -1)) * 0.25
        return jnp.where((x >= clip0 - eps) & interior, add, x)

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
