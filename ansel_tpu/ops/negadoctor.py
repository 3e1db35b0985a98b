"""negadoctor — color/B&W film negative inversion.

Reference: `/root/reference/src/iop/negadoctor.c` — params v2 (:92-113),
commit math (:240-268), pixel loop (:280-306): transmission -> density
around the Dmin fulcrum, log-space density correction, paper print
(exposure/black/gamma) and exponential highlight soft clip.  Runs in
display-referred RGB after filmic in the v3.0 order (order.py: 28.5).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..core.params import cfield, params
from ..core.types import Colorspace
from .base import Op, OpPlan, PlanContext, register

FILMSTOCK_NB = 0
FILMSTOCK_COLOR = 1
THRESHOLD = 2.3283064365386963e-10  # -32 EV
LOG10 = 2.302585092994046


@params(op="negadoctor", version=2)
@dataclasses.dataclass
class NegadoctorParams:
    film_stock: int = cfield("i", FILMSTOCK_COLOR)
    Dmin: tuple = cfield("4f", (1.0, 1.0, 1.0, 1.0))
    wb_high: tuple = cfield("4f", (1.0, 1.0, 1.0, 1.0))
    wb_low: tuple = cfield("4f", (1.0, 1.0, 1.0, 1.0))
    D_max: float = cfield("f", 2.046)
    offset: float = cfield("f", -0.05)
    black: float = cfield("f", 0.0755)
    gamma: float = cfield("f", 4.0)
    soft_clip: float = cfield("f", 0.75)
    exposure: float = cfield("f", 0.9245)


    @classmethod
    def from_legacy(cls, version, raw):
        import struct

        # negadoctor.c v1 = v2 (identical layout, field-by-field copy)
        if version == 1:
            v = struct.unpack("<i12f6f", raw[:76])
            return cls(film_stock=v[0], Dmin=tuple(v[1:5]),
                       wb_high=tuple(v[5:9]), wb_low=tuple(v[9:13]),
                       D_max=v[13], offset=v[14], black=v[15],
                       gamma=v[16], soft_clip=v[17], exposure=v[18])
        return None


@register
class Negadoctor(Op):
    name = "negadoctor"
    input_colorspace = Colorspace.WORK_RGB

    def coeffs(self, ctx: PlanContext, plan: OpPlan, p: NegadoctorParams):
        dmin = list(p.Dmin[:3])
        if p.film_stock == FILMSTOCK_NB:
            dmin = [p.Dmin[0]] * 3
        return {
            "Dmin": jnp.float32(dmin),
            "wb_high": jnp.float32([w / p.D_max for w in p.wb_high[:3]]),
            "offset": jnp.float32([p.wb_high[i] * p.offset * p.wb_low[i]
                                   for i in range(3)]),
            "black": jnp.float32(-p.exposure * (1.0 + p.black)),
            "exposure": jnp.float32(p.exposure),
            "gamma": jnp.float32(p.gamma),
            "soft_clip": jnp.float32(p.soft_clip),
            "soft_clip_comp": jnp.float32(1.0 - p.soft_clip),
        }

    def pointwise_spec(self, plan, ctx):
        from .base import PointwiseSpec

        return PointwiseSpec(
            consts=("Dmin", "wb_high", "offset", "black", "exposure",
                    "gamma", "soft_clip", "soft_clip_comp"),
            fn=lambda b, cd: self._pixel(b, cd))

    def apply(self, x, c, plan: OpPlan, ctx: PlanContext):
        import jax

        if jax.default_backend() == "tpu":
            from ..kernels.pointwise import ConstPack, pallas_pointwise

            order = ("Dmin", "wb_high", "offset", "black", "exposure",
                     "gamma", "soft_clip", "soft_clip_comp")
            pack = ConstPack()
            consts = pack.pack(c, order)

            def block_fn(block, consts_ref):
                cd = {n: pack.get(consts_ref, n) for n in order}
                return self._pixel(block, cd)

            return pallas_pointwise(block_fn, x, consts,
                                    tile_h=256, tile_w=512)
        return self._pixel(x, c)

    def _pixel(self, x, c):
        dmin, wbh, off = c["Dmin"], c["wb_high"], c["offset"]
        chans = []
        for i in range(3):
            # transmission -> density with Dmin as fulcrum (negadoctor.c:293)
            density = -(jnp.log(dmin[i]) - jnp.log(
                jnp.maximum(x[i], THRESHOLD))) / LOG10
            corrected = wbh[i] * density + off[i]
            # print density on paper (negadoctor.c:299-300)
            print_linear = -(c["exposure"] * jnp.exp(corrected * LOG10)
                             + c["black"])
            chans.append(jnp.maximum(print_linear, 0.0) ** c["gamma"])
        pg = jnp.stack(chans)
        # exponential highlight rolloff (negadoctor.c:303)
        sc, comp = c["soft_clip"], c["soft_clip_comp"]
        soft = sc + (1.0 - jnp.exp(-(pg - sc) / comp)) * comp
        return jnp.where(pg > sc, soft, pg)
