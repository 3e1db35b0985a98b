"""toneequal — exposure-zone tone equalizer over a guided luminance mask.

Reference: `/root/reference/src/iop/toneequal.c` (params v2,
toneequal.c:191-211):

  * luminance estimator + exposure/contrast boost around the -4EV fulcrum
    (src/pixel/luminance_mask.h:71-160)
  * mask smoothing with the (exposure-invariant) guided filter
    (DT_TONEEQ_EIGF default; src/pixel/eigf.h) over `iterations` passes
  * per-pixel gain from a radial-basis (Gaussian) interpolation of the 9
    user EV-band sliders, least-squares-fit onto 8 RBF centers
    (build_interpolation_matrix/pseudo_solve toneequal.c:1346-1357,
    commit_params toneequal.c:1589-1643; apply toneequal.c:764-797)
  * correction clamped to [0.25, 4] (±2 EV)
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
import numpy as np

from ..core.params import cfield, params
from ..core.types import Colorspace
from ..pixel.guided import eigf_surface_blur, fast_surface_blur
from .base import Op, OpPlan, PlanContext, register

CHANNELS = 9
PIXEL_CHAN = 8
CENTERS_PARAMS = np.linspace(-8.0, 0.0, CHANNELS)
CENTERS_OPS = np.linspace(-8.0, 0.0, PIXEL_CHAN)
CONTRAST_FULCRUM = 2.0**-4
MIN_FLOAT = 2.0**-16

# filters
TEQ_NONE, TEQ_AVG_GUIDED, TEQ_GUIDED, TEQ_AVG_EIGF, TEQ_EIGF = range(5)
# estimators
(NORM_MEAN, NORM_LIGHTNESS, NORM_VALUE, NORM_1, NORM_2, NORM_POWER,
 NORM_GEOMEAN) = range(7)


@params(op="toneequal", version=2)
@dataclasses.dataclass
class ToneEqualParams:
    noise: float = cfield("f", 0.0)
    ultra_deep_blacks: float = cfield("f", 0.0)
    deep_blacks: float = cfield("f", 0.0)
    blacks: float = cfield("f", 0.0)
    shadows: float = cfield("f", 0.0)
    midtones: float = cfield("f", 0.0)
    highlights: float = cfield("f", 0.0)
    whites: float = cfield("f", 0.0)
    speculars: float = cfield("f", 0.0)
    blending: float = cfield("f", 5.0)
    smoothing: float = cfield("f", math.sqrt(2.0))
    feathering: float = cfield("f", 1.0)
    quantization: float = cfield("f", 0.0)
    contrast_boost: float = cfield("f", 0.0)
    exposure_boost: float = cfield("f", 0.0)
    details: int = cfield("i", TEQ_EIGF)
    method: int = cfield("i", NORM_2)
    iterations: int = cfield("i", 1)


    @classmethod
    def from_legacy(cls, version, raw):
        import struct

        # toneequal.c v1: {9 zones, blending, feathering,
        # contrast_boost, exposure_boost, details, iterations, method}
        # -> quantization 0.01, smoothing sqrt(2)
        if version == 1:
            v = struct.unpack("<13f3i", raw[:64])
            return cls(noise=v[0], ultra_deep_blacks=v[1],
                       deep_blacks=v[2], blacks=v[3], shadows=v[4],
                       midtones=v[5], highlights=v[6], whites=v[7],
                       speculars=v[8], blending=v[9], feathering=v[10],
                       contrast_boost=v[11], exposure_boost=v[12],
                       details=v[13], iterations=v[14], method=v[15],
                       quantization=0.01, smoothing=math.sqrt(2.0))
        return None


def solve_factors(p: ToneEqualParams) -> np.ndarray:
    """RBF least-squares: 9 user EV gains -> 8 center factors."""
    gains = np.exp2([p.noise, p.ultra_deep_blacks, p.deep_blacks, p.blacks,
                     p.shadows, p.midtones, p.highlights, p.whites,
                     p.speculars])
    denom = 2.0 * p.smoothing * p.smoothing
    A = np.exp(-((CENTERS_PARAMS[:, None] - CENTERS_OPS[None, :]) ** 2)
               / denom)
    factors, *_ = np.linalg.lstsq(A, gains, rcond=None)
    return factors


@register
class ToneEqualizer(Op):
    name = "toneequal"
    input_colorspace = None  # order 24: runs on scene RGB before colorin

    def plan(self, ctx: PlanContext, spec_in, p: ToneEqualParams) -> OpPlan:
        radius = max(1, int(round(p.blending / 100.0
                                  * max(spec_in.width, spec_in.height)
                                  * ctx.scale)))
        return OpPlan(spec_in=spec_in, spec_out=spec_in,
                      static=(p.details, p.method, min(p.iterations, 20),
                              radius))

    def coeffs(self, ctx: PlanContext, plan: OpPlan, p: ToneEqualParams):
        return {
            "factors": solve_factors(p).astype(np.float32),
            "gauss_denom": np.float32(2.0 * p.smoothing * p.smoothing),
            "feathering": np.float32(1.0 / p.feathering),
            "exposure_boost": np.float32(2.0**p.exposure_boost),
            "contrast_boost": np.float32(2.0**p.contrast_boost),
            "quantization": np.float32(p.quantization),
        }

    def _estimate(self, x, method, eb, fulcrum, cb):
        if method == NORM_MEAN:
            lum = jnp.mean(x, axis=0)
        elif method == NORM_LIGHTNESS:
            lum = 0.5 * (jnp.max(x, axis=0) + jnp.min(x, axis=0))
        elif method == NORM_VALUE:
            lum = jnp.max(x, axis=0)
        elif method == NORM_1:
            lum = jnp.sum(jnp.abs(x), axis=0)
        elif method == NORM_POWER:
            a = jnp.abs(x)
            lum = jnp.sum(a**3, axis=0) / jnp.maximum(
                jnp.sum(a**2, axis=0), 1e-12)
        elif method == NORM_GEOMEAN:
            # product of |RGB| (luminance_mask.h:184-199 fabsf)
            lum = jnp.cbrt(jnp.prod(jnp.abs(x), axis=0))
        else:  # NORM_2
            lum = jnp.sqrt(jnp.sum(x**2, axis=0))
        return jnp.maximum((eb * lum - fulcrum) * cb + fulcrum, MIN_FLOAT)

    def apply(self, x, c, plan: OpPlan, ctx: PlanContext):
        details, method, iterations, radius = plan.static
        boosted = details in (TEQ_GUIDED, TEQ_EIGF)
        lum = self._estimate(
            x, method, c["exposure_boost"],
            CONTRAST_FULCRUM if boosted else 0.0,
            c["contrast_boost"] if boosted else 1.0,
        )

        if details != TEQ_NONE:
            # toneequal.c:829-875: the *fast* (4x-downsampled) surface
            # blurs with iterations INSIDE and geomean blending only on
            # the last iteration — not per-iteration full-res filtering
            use_eigf = details in (TEQ_AVG_EIGF, TEQ_EIGF)
            geomean = details in (TEQ_AVG_GUIDED, TEQ_AVG_EIGF)
            if use_eigf:
                lum = eigf_surface_blur(lum, float(radius),
                                        c["feathering"], iterations,
                                        geomean)
            else:
                lum = fast_surface_blur(lum, radius, c["feathering"],
                                        iterations, geomean)
            lum = jnp.maximum(lum, MIN_FLOAT)

        exposure = jnp.clip(jnp.log2(lum), -8.0, 0.0)
        # optional mask quantization in EV steps
        q = c["quantization"]
        exposure = jnp.where(q > 0.0,
                             jnp.round(exposure / jnp.maximum(q, 1e-6))
                             * q, exposure)
        centers = jnp.asarray(CENTERS_OPS, x.dtype).reshape(-1, 1, 1)
        factors = jnp.asarray(c["factors"]).reshape(-1, 1, 1)
        w = jnp.exp(-((exposure[None] - centers) ** 2) / c["gauss_denom"])
        correction = jnp.clip(jnp.sum(w * factors, axis=0), 0.25, 4.0)
        return x * correction[None]
