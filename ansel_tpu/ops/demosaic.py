"""demosaic — CFA mosaic -> camera RGB.

Reference: `/root/reference/src/iop/demosaic.c` (params v4
demosaic.c:266-274, method enum demosaic.c:120-141) with per-method
implementations in `src/iop/demosaic/{rcd.c, ppg.c, vng.c, markesteijn.c,
lmmse.c, ...}`.

TPU design: methods are static plan choices dispatching to fused-JAX or
Pallas kernels in `ansel_tpu.kernels`:
  * BILINEAR — masked 3x3 convolution, pure XLA (also the fallback)
  * PPG      — green gradient-select + chroma interpolation, pure XLA
  * RCD      — ratio-corrected demosaic (kernels/rcd.py), the quality default
  * LMMSE    — Bayer LMMSE (kernels/lmmse.py)
  * VNG4     — variable-number-of-gradients (kernels/vng.py)
  * Markesteijn 1/3-pass — X-Trans (kernels/markesteijn*.py)
  * AMaZE    — full 12-stage implementation (kernels/amaze.py)
  * DUAL     — RCD/VNG4 blend by local gradient
Passthrough modes supported.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..core.params import cfield, params
from ..core.types import CFAPattern, Colorspace, ImageSpec
from . import _bayer
from .base import Op, OpPlan, PlanContext, register

# method ids (reference demosaic.c:120-141)
PPG = 0
AMAZE = 1
VNG4 = 2
PASSTHROUGH_MONO = 3
PASSTHROUGH_COLOR = 4
RCD = 5
LMMSE = 6
DOWNSAMPLE = 7
XTRANS_FLAG = 0x1000   # DEMOSAIC_XTRANS
DUAL_FLAG = 0x2000     # DEMOSAIC_DUAL
MARKESTEIJN = XTRANS_FLAG | 1
MARKESTEIJN_3 = XTRANS_FLAG | 2


@params(op="demosaic", version=4)
@dataclasses.dataclass
class DemosaicParams:
    green_eq: int = cfield("i", 0)
    median_thrs: float = cfield("f", 0.0)
    color_smoothing: int = cfield("i", 0)
    demosaicing_method: int = cfield("i", RCD)
    lmmse_refine: int = cfield("i", 1)
    dual_thrs: float = cfield("f", 0.20)

    @classmethod
    def from_legacy(cls, version, raw):
        import struct

        if version == 3:  # demosaic.c:342-359: dual_thrs added in v4
            g, m, cs, dm, lr = struct.unpack("<ifiIi", raw[:20])
            return cls(green_eq=g, median_thrs=m, color_smoothing=cs,
                       demosaicing_method=dm, lmmse_refine=lr)
        return None


def _conv2(x: jnp.ndarray, k) -> jnp.ndarray:
    """Small 2-D stencil on one plane as fused shifted adds (single-channel
    TPU convs im2col-pad to 128 lanes — see pixel/shifts.py)."""
    from ..pixel.shifts import PaddedView

    kk = [[float(v) for v in row] for row in k]
    r = (len(kk) - 1) // 2
    pv = PaddedView(x, r)
    out = None
    for iy, row in enumerate(kk):
        for ix, t in enumerate(row):
            if t == 0.0:
                continue
            c = t * pv.at(iy - r, ix - r)
            out = c if out is None else out + c
    return out


def bilinear_demosaic(x: jnp.ndarray, cfa: CFAPattern) -> jnp.ndarray:
    """Masked-kernel bilinear: G via 4-neighbour average, R/B via the classic
    [1 2 1]/4 ⊗ [1 2 1]/4 kernel over their sparse planes."""
    h, w = x.shape
    masks = _bayer.color_masks(cfa, h, w, x.dtype)  # (3,h,w)
    kG = [[0, 1, 0], [1, 4, 1], [0, 1, 0]]
    kRB = [[1, 2, 1], [2, 4, 2], [1, 2, 1]]
    planes = masks * x[None]
    r = _conv2(planes[0], kRB) / 4.0
    g = _conv2(planes[1], kG) / 4.0
    b = _conv2(planes[2], kRB) / 4.0
    return jnp.stack([r, g, b])


def ppg_demosaic(x: jnp.ndarray, cfa: CFAPattern) -> jnp.ndarray:
    """Patterned-pixel-grouping (reference src/iop/demosaic/ppg.c semantics):
    green by gradient-weighted directional choice, chroma by green-ratio
    interpolation.  Expressed as shifted-array selects so XLA fuses the whole
    thing into one elementwise pass over 8 shifted views."""
    h, w = x.shape
    masks = _bayer.color_masks(cfa, h, w, x.dtype)
    is_g = masks[1]

    def sh(a, dy, dx):  # shifted view with edge clamp
        return jnp.roll(a, (-dy, -dx), axis=(0, 1))

    # --- green interpolation at R/B sites: choose the axis with the smaller
    # gradient, correcting with the second derivative of the host color.
    gN, gS = sh(x, -1, 0), sh(x, 1, 0)
    gW, gE = sh(x, 0, -1), sh(x, 0, 1)
    cNN, cSS = sh(x, -2, 0), sh(x, 2, 0)
    cWW, cEE = sh(x, 0, -2), sh(x, 0, 2)
    grad_v = jnp.abs(gN - gS) + jnp.abs(x - cNN) + jnp.abs(x - cSS)
    grad_h = jnp.abs(gW - gE) + jnp.abs(x - cWW) + jnp.abs(x - cEE)
    est_v = (gN + gS) * 0.5 + (2.0 * x - cNN - cSS) * 0.25
    est_h = (gW + gE) * 0.5 + (2.0 * x - cWW - cEE) * 0.25
    est_b = (gN + gS + gW + gE) * 0.25 + (4.0 * x - cNN - cSS - cWW - cEE) * 0.125
    g_interp = jnp.where(
        grad_v < 0.8 * grad_h, est_v,
        jnp.where(grad_h < 0.8 * grad_v, est_h, est_b),
    )
    g = jnp.where(is_g > 0, x, jnp.maximum(g_interp, 0.0))

    # --- chroma: interpolate (c - g) differences bilinearly over each
    # sparse chroma plane, then add g back.
    kRB = [[1, 2, 1], [2, 4, 2], [1, 2, 1]]
    out = []
    for ci in (0, 2):
        diff = (x - g) * masks[ci]
        num = _conv2(diff, kRB)
        den = _conv2(masks[ci], kRB)
        out.append(jnp.maximum(g + num / jnp.maximum(den, 1e-6), 0.0))
    return jnp.stack([out[0], g, out[1]])


@register
class Demosaic(Op):
    name = "demosaic"
    input_colorspace = Colorspace.RAW
    mandatory = True

    def plan(self, ctx: PlanContext, spec_in: ImageSpec, p: DemosaicParams) -> OpPlan:
        spec_out = spec_in.with_colorspace(Colorspace.CAMERA_RGB)
        method = p.demosaicing_method
        if spec_in.cfa is CFAPattern.XTRANS and not (method & XTRANS_FLAG):
            method = MARKESTEIJN
        is_xtrans = spec_in.cfa is CFAPattern.XTRANS
        green_eq = 0 if is_xtrans else p.green_eq
        return OpPlan(spec_in=spec_in, spec_out=spec_out,
                      static=(method, green_eq,
                              round(float(p.median_thrs), 6),
                              int(p.color_smoothing),
                              int(p.lmmse_refine),
                              round(float(p.dual_thrs), 4)))

    def roi_in(self, plan: OpPlan, ctx: PlanContext, win):
        """Windowed demosaic: grow by the interpolation support and snap
        the origin to the 6-row/col CFA super-period so the window's CFA
        phase equals the frame's (covers Bayer 2 and X-Trans 6)."""
        si, so = plan.spec_in, plan.spec_out
        if tuple(win) == (0, 0, so.height, so.width):
            return (0, 0, si.height, si.width)
        halo = 18  # RCD/Markesteijn borders fit in 16; 18 = 6-aligned
        y0 = max(0, win[0] - halo) // 6 * 6
        x0 = max(0, win[1] - halo) // 6 * 6
        y1 = min(si.height, win[0] + win[2] + halo)
        x1 = min(si.width, win[1] + win[3] + halo)
        return (y0, x0, y1 - y0, x1 - x0)

    def coeffs(self, ctx: PlanContext, plan: OpPlan, p: DemosaicParams):
        # rcd normalizes by max processed_maximum (rcd.c:283-284) so its eps
        # constants are amplitude-invariant; traced so WB edits don't recompile
        return {"scaler": max(ctx.processed_maximum)}

    def apply(self, x, c, plan: OpPlan, ctx: PlanContext):
        (method_full, green_eq, median_thrs, smooth, lmmse_refine,
         dual_thrs) = plan.static
        method = method_full & ~DUAL_FLAG
        cfa = plan.spec_in.cfa
        if method in (PASSTHROUGH_MONO, XTRANS_FLAG | 3):
            return jnp.stack([x, x, x])
        if green_eq:
            from ..kernels import demosaic_post

            # threshold = 0.0001 * ISO (demosaic.c:1001)
            thr = 0.0001 * float(getattr(ctx.meta, "iso", 100.0) or 100.0)
            x = demosaic_post.apply_green_eq(x, cfa, green_eq, thr)
        out = self._demosaic(x, c, method, cfa, ctx,
                             lmmse_refine=lmmse_refine)
        if (method_full & DUAL_FLAG) and dual_thrs > 0.0:
            # dual demosaic: VNG low-frequency under a detail mask
            # (demosaic/dual.c:38-110) — VNG4 for Bayer, 3-color VNG
            # for X-Trans (dual.c:66 calls the generic vng_interpolate)
            from ..kernels import demosaic_post, vng
            from ..pixel import detail

            if cfa is CFAPattern.XTRANS:
                low = vng.xtrans_vng_demosaic(x, tuple(ctx.meta.xtrans))
            else:
                low = vng.vng4_demosaic(x, cfa)
            low = demosaic_post.color_smoothing(low, 2)
            contrast = 0.005 * dual_thrs ** 1.1  # slider2contrast
            wb = [max(v, 1e-6) for v in ctx.meta.wb_coeffs[:3]]
            raw_m = detail.rawdetail_mask(out, wb)
            blend = detail.detail_mask(raw_m, contrast, detail=True)
            out = blend[None] * out + (1.0 - blend[None]) * low
        if smooth:
            from ..kernels import demosaic_post

            out = demosaic_post.color_smoothing(out, smooth)
        return out

    def _demosaic(self, x, c, method, cfa, ctx, lmmse_refine=1):
        if cfa is CFAPattern.XTRANS:
            import jax

            if method == XTRANS_FLAG:        # DT_IOP_DEMOSAIC_VNG
                from ..kernels import vng

                return vng.xtrans_vng_demosaic(x, tuple(ctx.meta.xtrans))
            passes = 3 if method == MARKESTEIJN_3 else 1
            if jax.default_backend() == "tpu":
                from ..kernels import markesteijn_pallas

                return markesteijn_pallas.xtrans_markesteijn_pallas(
                    x, tuple(ctx.meta.xtrans), passes=passes)
            if passes == 3:
                from ..kernels import markesteijn_pallas

                return markesteijn_pallas.xtrans_markesteijn_pallas(
                    x, tuple(ctx.meta.xtrans), passes=3, interpret=True)
            from ..kernels import markesteijn

            return markesteijn.xtrans_demosaic(x, ctx.meta.xtrans)
        if method == PPG:
            return ppg_demosaic(x, cfa)
        if method == LMMSE:
            from ..kernels import lmmse

            return lmmse.lmmse_demosaic(x, cfa, c["scaler"],
                                        refine=lmmse_refine)
        if method == VNG4:
            from ..kernels import vng

            return vng.vng4_demosaic(x, cfa)
        if method == AMAZE:
            # full AMaZE (amaze.cc:181-1417) as whole-image masked
            # shifted-view XLA — beats RCD by ~5 dB on aliasing-prone
            # diagonal texture (tests/test_substitution_bounds.py)
            from ..kernels import amaze

            return amaze.amaze_demosaic(x, cfa, c["scaler"])
        if method == RCD:
            import jax

            if jax.default_backend() == "tpu":
                from ..kernels import rcd_pallas

                return rcd_pallas.rcd_demosaic_pallas(x, cfa, c["scaler"])
            from ..kernels import rcd

            return rcd.rcd_demosaic(x, cfa, c["scaler"])
        return bilinear_demosaic(x, cfa)
