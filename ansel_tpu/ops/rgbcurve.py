"""rgbcurve — RGB tone curves (linked or per-channel) with color
preservation norms.

Reference: `/root/reference/src/iop/rgbcurve.c` (params v1,
rgbcurve.c:94-109): up to 20 (x,y) nodes per channel, three interpolators
(common/curve_tools.c), linked mode applies curve[0] through a chosen RGB
norm (src/pixel/rgb_norms.h) preserving ratios; independent mode applies
each channel's curve.  Values >1 use the unbounded linear extrapolation.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..color import matrices as cm
from ..core.params import cfield, params
from ..core.types import Colorspace
from ..pixel import curves
from .base import Op, OpPlan, PlanContext, register

MAXNODES = 20
SCALE_AUTOMATIC_RGB = 0
SCALE_MANUAL_RGB = 1

(NORM_NONE, NORM_LUMINANCE, NORM_MAX, NORM_AVERAGE, NORM_SUM, NORM_NORM,
 NORM_POWER) = range(7)

LUT_MAX = 4.0  # sample the curve over [0, 4] to cover scene-referred range


@params(op="rgbcurve", version=1)
@dataclasses.dataclass
class RGBCurveParams:
    # interleaved (x, y) pairs: 3 channels x 20 nodes x 2 floats
    curve_nodes: tuple = cfield(
        f"{3 * MAXNODES * 2}f",
        tuple([0.0, 0.0, 1.0, 1.0] + [0.0] * (MAXNODES * 2 - 4)) * 3,
    )
    curve_num_nodes: tuple = cfield("3i", (2, 2, 2))
    curve_type: tuple = cfield("3i", (2, 2, 2))  # MONOTONE_HERMITE
    curve_autoscale: int = cfield("i", SCALE_AUTOMATIC_RGB)
    compensate_middle_grey: int = cfield("i", 0)
    preserve_colors: int = cfield("i", NORM_LUMINANCE)


def rgb_norm(x: jnp.ndarray, kind: int, y_weights) -> jnp.ndarray:
    if kind == NORM_LUMINANCE:
        # per-channel FMA (no (3,1,1) reshape-broadcast: Pallas-safe, and
        # y_weights may be a Python list of traced SMEM scalars)
        w = y_weights
        return w[0] * x[0] + w[1] * x[1] + w[2] * x[2]
    if kind == NORM_MAX:
        return jnp.max(x, axis=0)
    if kind == NORM_AVERAGE:
        return jnp.mean(x, axis=0)
    if kind == NORM_SUM:
        return jnp.sum(x, axis=0)
    if kind == NORM_NORM:
        return jnp.sqrt(jnp.sum(x * x, axis=0))
    if kind == NORM_POWER:
        a = jnp.abs(x)
        return jnp.sum(a**3, axis=0) / jnp.maximum(jnp.sum(a**2, axis=0),
                                                   1e-12)
    return jnp.max(x, axis=0)


def _nodes(p: RGBCurveParams, ch: int):
    n = max(2, min(int(p.curve_num_nodes[ch]), MAXNODES))
    base = ch * MAXNODES * 2
    xs = [p.curve_nodes[base + 2 * i] for i in range(n)]
    ys = [p.curve_nodes[base + 2 * i + 1] for i in range(n)]
    return xs, ys


@register
class RGBCurve(Op):
    name = "rgbcurve"
    input_colorspace = Colorspace.WORK_RGB

    def plan(self, ctx: PlanContext, spec_in, p: RGBCurveParams) -> OpPlan:
        nodes = tuple(max(2, min(int(p.curve_num_nodes[ch]), MAXNODES))
                      for ch in range(3))
        return OpPlan(spec_in=spec_in, spec_out=spec_in,
                      static=(p.curve_autoscale, p.preserve_colors, nodes))

    def coeffs(self, ctx: PlanContext, plan: OpPlan, p: RGBCurveParams):
        cs = [curves.curve_coeffs(*_nodes(p, ch), p.curve_type[ch])
              for ch in range(3)]
        return {"c0": cs[0], "c1": cs[1], "c2": cs[2],
                "y_weights": np.float32(cm.WORK_Y)}

    def pointwise_spec(self, plan, ctx):
        from .base import PointwiseSpec

        autoscale, preserve, nodes = plan.static

        def fn(b, cd):
            def curve(ch):
                v, n = cd[f"c{ch}"], nodes[ch]
                return v[:n], v[n:2 * n], v[2 * n:3 * n]

            if autoscale == SCALE_AUTOMATIC_RGB and preserve != NORM_NONE:
                ratio_src = jnp.maximum(
                    rgb_norm(b, preserve, cd["y_weights"]), 1e-9)
                mapped = curves.eval_curve(ratio_src, *curve(0))
                return b * (mapped / ratio_src)[None]
            if autoscale == SCALE_AUTOMATIC_RGB:
                return curves.eval_curve(b, *curve(0))
            return jnp.stack([
                curves.eval_curve(b[i], *curve(i)) for i in range(3)])

        return PointwiseSpec(consts=("c0", "c1", "c2", "y_weights"),
                             lists=("c0", "c1", "c2", "y_weights"), fn=fn)

    def apply(self, x, c, plan: OpPlan, ctx: PlanContext):
        autoscale, preserve = plan.static[:2]
        if autoscale == SCALE_AUTOMATIC_RGB and preserve != NORM_NONE:
            ratio_src = rgb_norm(x, preserve, c["y_weights"])
            ratio_src = jnp.maximum(ratio_src, 1e-9)
            mapped = curves.eval_curve(ratio_src, *c["c0"])
            return x * (mapped / ratio_src)[None]
        if autoscale == SCALE_AUTOMATIC_RGB:
            return curves.eval_curve(x, *c["c0"])
        return jnp.stack([
            curves.eval_curve(x[i], *c[f"c{i}"]) for i in range(3)
        ])
