"""cacorrectrgb — chromatic aberration correction after demosaic.

Reference: `/root/reference/src/iop/cacorrectrgb.c` — params (:156-163),
manifolds (get_manifolds :~260-340 + normalize_manifolds :205-240):
split pixels into above/below-local-average sets of the guide channel,
blur (guide, log2 channel ratios, weight) per set, normalize; correction
(apply_correction :523-580): log-position weights between the two
manifolds, corrected channel = guide * ratio_low^wl * ratio_high^wh with
standard/darken/brighten modes; artifact safety blend
(reduce_artifacts :583-640): w = exp(-|log2 blur(out)/blur(in)| * safety).
sigma = radius/scale, safety = 20^(1-strength) (process :720-760).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..core.params import cfield, params
from ..core.types import Colorspace
from ..pixel.blur import gaussian_blur
from .base import Op, OpPlan, PlanContext, register

GUIDE_R, GUIDE_G, GUIDE_B = 0, 1, 2
MODE_STANDARD, MODE_DARKEN, MODE_BRIGHTEN = 0, 1, 2
MAX_EV_DIFF = 2.0


@params(op="cacorrectrgb", version=1)
@dataclasses.dataclass
class CACorrectRGBParams:
    guide_channel: int = cfield("i", GUIDE_G)
    radius: float = cfield("f", 5.0)
    strength: float = cfield("f", 0.5)
    mode: int = cfield("i", MODE_STANDARD)
    refine_manifolds: int = cfield("i", 0)


@register
class CACorrectRGB(Op):
    name = "cacorrectrgb"
    input_colorspace = None  # camera RGB, right after demosaic (order 13.5)

    def plan(self, ctx: PlanContext, spec_in, p: CACorrectRGBParams) -> OpPlan:
        sigma = max(p.radius / max(ctx.scale, 1e-6), 1.0)
        if p.refine_manifolds:
            sigma = max(p.radius * p.radius / max(ctx.scale, 1e-6), 1.0)
        return OpPlan(spec_in=spec_in, spec_out=spec_in,
                      static=(p.guide_channel, p.mode, min(sigma, 256.0)))

    def coeffs(self, ctx: PlanContext, plan: OpPlan, p: CACorrectRGBParams):
        return {"safety": jnp.float32(20.0 ** (1.0 - p.strength))}

    def apply(self, x, c, plan: OpPlan, ctx: PlanContext):
        guide, mode, sigma = plan.static
        others = [(guide + 1) % 3, (guide + 2) % 3]
        pixg = jnp.maximum(x[guide], 1e-6)
        blurred_g = gaussian_blur(pixg, sigma)

        wh = (pixg >= blurred_g).astype(x.dtype)
        wl = (pixg <= blurred_g).astype(x.dtype)
        logd = [jnp.log2(jnp.maximum(x[ch], 1e-6) / pixg) for ch in others]
        maxlog = jnp.maximum(jnp.abs(logd[0]), jnp.abs(logd[1]))
        cw = jnp.where(maxlog > MAX_EV_DIFF, MAX_EV_DIFF
                       / jnp.maximum(maxlog, 1e-6), 1.0)
        wh = wh * cw
        wl = wl * cw

        # blur (guide*w, logdiff*w, w) per manifold, then normalize
        def manifold(w):
            stack = jnp.stack([pixg * w, logd[0] * w, logd[1] * w, w])
            b = gaussian_blur(stack, sigma)
            wgt = jnp.maximum(b[3], 1e-2)
            # clamp BEFORE deriving the channel manifolds: fused blur
            # reassociation can ring epsilon-negative, and a negative
            # base into the fractional pow below is NaN
            g = jnp.maximum(b[0] / wgt, 1e-6)
            return g, jnp.exp2(b[1] / wgt) * g, jnp.exp2(b[2] / wgt) * g

        high_g, high_c0, high_c1 = manifold(wh)
        low_g, low_c0, low_c1 = manifold(wl)

        # apply_correction (cacorrectrgb.c:523-580)
        hg = jnp.maximum(high_g, 1e-6)
        lg = jnp.maximum(low_g, 1e-6)
        log_high, log_low = jnp.log2(hg), jnp.log2(lg)
        dist = log_high - log_low
        log_pix = jnp.log2(jnp.clip(pixg, lg, hg))
        w_low = jnp.abs(log_high - log_pix) / jnp.maximum(dist, 1e-6)
        thr = 0.25
        soft = jnp.clip(dist / thr, 0.0, 1.0)
        w_low = jnp.where(dist < thr, w_low * soft + 0.5 * (1.0 - soft),
                          w_low)
        # inverted manifolds (hg < lg, possible in flat noise) would give a
        # negative exponent and 1e-9**-x = inf
        w_low = jnp.clip(w_low, 0.0, 1.0)
        w_high = jnp.maximum(1.0 - w_low, 0.0)

        out = [None, None, None]
        out[guide] = pixg
        for k, (ch, hc, lc) in enumerate(
                [(others[0], high_c0, low_c0), (others[1], high_c1, low_c1)]):
            ratio = ((jnp.maximum(lc / lg, 1e-9) ** w_low)
                     * (jnp.maximum(hc / hg, 1e-9) ** w_high))
            corr = pixg * ratio
            pixel = jnp.maximum(x[ch], 0.0)
            if mode == MODE_DARKEN:
                corr = jnp.minimum(corr, pixel)
            elif mode == MODE_BRIGHTEN:
                corr = jnp.maximum(corr, pixel)
            out[ch] = corr
        y = jnp.stack(out)

        # artifact safety blend (reduce_artifacts :583-640)
        safety = c["safety"]
        w = jnp.ones_like(pixg)
        for ch in others:
            avg_in = jnp.log2(jnp.maximum(gaussian_blur(
                jnp.maximum(x[ch], 0.0), sigma), 1e-6))
            avg_out = jnp.log2(jnp.maximum(gaussian_blur(
                jnp.maximum(y[ch], 0.0), sigma), 1e-6))
            w = w * jnp.exp(-jnp.maximum(jnp.abs(avg_out - avg_in), 0.01)
                            * safety)
        res = [None, None, None]
        res[guide] = pixg
        for ch in others:
            res[ch] = (1.0 - w) * jnp.maximum(x[ch], 0.0) \
                + w * jnp.maximum(y[ch], 0.0)
        return jnp.stack(res)
