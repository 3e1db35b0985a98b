"""colorbalancergb — 4-way scene-referred color grading.

Reference: `/root/reference/src/iop/colorbalancergb.c` (params v5,
colorbalancergb.c:87-133).  Pixel path (process, colorbalancergb.c:
~1460-1700): work RGB -> CIE2006 LMS -> Kirk Yrg; hue rotation + chroma/
vibrance scaling with gamut guards in the (r,g) plane; 4-way grading in
Filmlight grading RGB (offset=global, slopes=shadows/highlights via sigmoid
opacity masks, power=midtones around the white fulcrum); luminance
contrast around the grey fulcrum; then saturation/brilliance in JzAzBz
(eigenvector rotation in the (Jz, Cz) plane, negative-LMS gamut clamps).
Host commit math: commit_params (colorbalancergb.c:~1900-1990),
opacity_masks (colorbalancergb.c:509-534).

The per-hue gamut LUT (out_max_sat_h) and the dt-UCS saturation formula are
pending; the JzAzBz formula with analytic gamut clamps is implemented.
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
import numpy as np

from ..color import matrices as cm
from ..color import spaces as sp
from ..color.transforms import apply_matrix
from ..core.params import cfield, params
from ..core.types import Colorspace
from .base import Op, OpPlan, PlanContext, register

SAT_JZAZBZ = 0
SAT_DTUCS = 1


@params(op="colorbalancergb", version=5)
@dataclasses.dataclass
class ColorBalanceRGBParams:
    shadows_Y: float = cfield("f", 0.0)
    shadows_C: float = cfield("f", 0.0)
    shadows_H: float = cfield("f", 0.0)
    midtones_Y: float = cfield("f", 0.0)
    midtones_C: float = cfield("f", 0.0)
    midtones_H: float = cfield("f", 0.0)
    highlights_Y: float = cfield("f", 0.0)
    highlights_C: float = cfield("f", 0.0)
    highlights_H: float = cfield("f", 0.0)
    global_Y: float = cfield("f", 0.0)
    global_C: float = cfield("f", 0.0)
    global_H: float = cfield("f", 0.0)
    shadows_weight: float = cfield("f", 1.0)
    white_fulcrum: float = cfield("f", 1.0)
    highlights_weight: float = cfield("f", 1.0)
    chroma_shadows: float = cfield("f", 0.0)
    chroma_highlights: float = cfield("f", 0.0)
    chroma_global: float = cfield("f", 0.0)
    chroma_midtones: float = cfield("f", 0.0)
    saturation_global: float = cfield("f", 0.0)
    saturation_highlights: float = cfield("f", 0.0)
    saturation_midtones: float = cfield("f", 0.0)
    saturation_shadows: float = cfield("f", 0.0)
    hue_angle: float = cfield("f", 0.0)
    brilliance_global: float = cfield("f", 0.0)
    brilliance_highlights: float = cfield("f", 0.0)
    brilliance_midtones: float = cfield("f", 0.0)
    brilliance_shadows: float = cfield("f", 0.0)
    mask_grey_fulcrum: float = cfield("f", 0.1845)
    vibrance: float = cfield("f", 0.0)
    grey_fulcrum: float = cfield("f", 0.1845)
    contrast: float = cfield("f", 0.0)
    saturation_formula: int = cfield("i", 1)

    @classmethod
    def from_legacy(cls, version, raw):
        if version == 4:
            # colorbalancergb.c:248-292 — v4 = v5 minus saturation_formula;
            # legacy edits keep the JzAzBz (2021) saturation algorithm
            p = cls.codec.decode(raw + b"\0" * 4)
            p.saturation_formula = 0  # DT_COLORBALANCE_SATURATION_JZAZBZ
            return p
        return None


MASK_EXP = 0.4101205819200422


@register
class ColorBalanceRGB(Op):
    name = "colorbalancergb"
    input_colorspace = Colorspace.WORK_RGB

    def coeffs(self, ctx: PlanContext, plan: OpPlan, p: ColorBalanceRGBParams):
        rgb_norm = sp.ych_to_grading_np(1.0, 0.0, 0.0)

        def grade(Y, C, H_deg):
            return sp.ych_to_grading_np(1.0, C, math.radians(H_deg)), Y

        g_rgb, g_Y = grade(p.global_Y, p.global_C, p.global_H)
        global_v = (g_rgb - rgb_norm) + rgb_norm * p.global_Y
        s_rgb, _ = grade(p.shadows_Y, p.shadows_C, p.shadows_H)
        shadows_v = 1.0 + (s_rgb - rgb_norm) + p.shadows_Y
        h_rgb, _ = grade(p.highlights_Y, p.highlights_C, p.highlights_H)
        highlights_v = 1.0 + (h_rgb - rgb_norm) + p.highlights_Y
        m_rgb, _ = grade(p.midtones_Y, p.midtones_C, p.midtones_H)
        midtones_v = 1.0 / (1.0 + (m_rgb - rgb_norm))

        shadows_weight = 2.0 + p.shadows_weight * 2.0
        highlights_weight = 2.0 + p.highlights_weight * 2.0
        midtones_weight = (shadows_weight**2 * highlights_weight**2
                           / (shadows_weight**2 + highlights_weight**2))

        work_to_lms = (sp.XYZ_D65_TO_LMS2006 @ cm.XYZ_D50_TO_D65
                       @ cm.XYZ_FROM_WORK)

        return {
            "in_mat": np.float32(work_to_lms),
            # the JzAzBz stage hands back XYZ D65, not LMS
            "out_mat": np.float32(cm.WORK_FROM_XYZ @ cm.XYZ_D65_TO_D50),
            "global": np.float32(global_v),
            "shadows": np.float32(shadows_v),
            "highlights": np.float32(highlights_v),
            "midtones": np.float32(midtones_v),
            "midtones_Y": np.float32(1.0 / (1.0 + p.midtones_Y)),
            "white_fulcrum": np.float32(2.0**p.white_fulcrum),
            "grey_fulcrum": np.float32(max(p.grey_fulcrum, 1e-6)),
            "contrast": np.float32(1.0 + p.contrast),
            "shadows_weight": np.float32(shadows_weight),
            "highlights_weight": np.float32(highlights_weight),
            "midtones_weight": np.float32(midtones_weight),
            "mask_grey_fulcrum": np.float32(p.mask_grey_fulcrum**MASK_EXP),
            "chroma_global": np.float32(p.chroma_global),
            "chroma": np.float32([p.chroma_shadows, p.chroma_midtones,
                                  p.chroma_highlights]),
            "saturation_global": np.float32(p.saturation_global),
            "saturation": np.float32([p.saturation_shadows,
                                      p.saturation_midtones,
                                      p.saturation_highlights]),
            "brilliance_global": np.float32(p.brilliance_global),
            "brilliance": np.float32([p.brilliance_shadows,
                                      p.brilliance_midtones,
                                      p.brilliance_highlights]),
            "vibrance": np.float32(p.vibrance),
            "hue_cos": np.float32(math.cos(math.radians(p.hue_angle))),
            "hue_sin": np.float32(math.sin(math.radians(p.hue_angle))),
        }

    def _opacities(self, x, c):
        """sigmoid zone masks (colorbalancergb.c:509-534); x = Y^0.41."""
        off = x - c["mask_grey_fulcrum"]
        off_n = off / c["mask_grey_fulcrum"]
        alpha = 1.0 / (1.0 + jnp.exp(off_n * c["shadows_weight"]))
        beta = 1.0 / (1.0 + jnp.exp(-off_n * c["highlights_weight"]))
        ac, bc = 1.0 - alpha, 1.0 - beta
        gamma = jnp.exp(-off**2 * c["midtones_weight"] / 4.0) * ac**2 \
            * bc**2 * 8.0
        return (alpha, gamma, beta), (ac, 1.0 - gamma, bc)

    # consts packed into the Pallas SMEM vector, in order (51 floats)
    _CONST_ORDER = ("in_mat", "out_mat", "global", "shadows", "highlights",
                    "midtones", "midtones_Y", "white_fulcrum", "grey_fulcrum",
                    "contrast", "shadows_weight", "highlights_weight",
                    "midtones_weight", "mask_grey_fulcrum", "chroma_global",
                    "chroma", "saturation_global", "saturation",
                    "brilliance_global", "brilliance", "vibrance", "hue_cos",
                    "hue_sin")

    def apply(self, x, c, plan: OpPlan, ctx: PlanContext):
        import jax

        if jax.default_backend() == "tpu":
            from ..kernels.pointwise import ConstPack, pallas_pointwise

            pack = ConstPack()
            consts = pack.pack(c, self._CONST_ORDER)

            def block_fn(block, consts_ref):
                cd = {n: pack.get(consts_ref, n) for n in self._CONST_ORDER}
                for k in ("in_mat", "out_mat"):
                    v = cd[k]
                    cd[k] = [[v[3 * r + i] for i in range(3)]
                             for r in range(3)]
                return self._pixel(block, cd)

            # deep chain: small tile to stay under the scoped-VMEM limit
            return pallas_pointwise(block_fn, x, consts,
                                    tile_h=128, tile_w=512)
        return self._pixel(x, c)

    def pointwise_spec(self, plan, ctx):
        from .base import PointwiseSpec

        return PointwiseSpec(
            consts=self._CONST_ORDER, mats=("in_mat", "out_mat"),
            fn=lambda b, cd: self._pixel(b, cd))

    def _pixel(self, x, c):
        rgb = jnp.maximum(x, 0.0)
        lms = apply_matrix(rgb, c["in_mat"])
        yrg = sp.lms_to_yrg(lms)
        Y = jnp.maximum(yrg[0], 0.0)

        (op_s, op_m, op_h), (cp_s, cp_m, cp_h) = self._opacities(
            jnp.maximum(Y, 1e-12) ** MASK_EXP, c)

        # hue rotation + chroma/vibrance in the Yrg chromaticity plane
        r_c = yrg[1] - sp.YRG_WHITE_R
        g_c = yrg[2] - sp.YRG_WHITE_G
        r_rot = c["hue_cos"] * r_c - c["hue_sin"] * g_c
        g_rot = c["hue_sin"] * r_c + c["hue_cos"] * g_c
        chroma_in = jnp.sqrt(r_rot**2 + g_rot**2)
        inv_c = jnp.where(chroma_in > 0.0, 1.0 / jnp.maximum(chroma_in, 1e-20),
                          0.0)
        cos_h = r_rot * inv_c
        sin_h = g_rot * inv_c
        ch = c["chroma"]
        chroma_boost = (c["chroma_global"] + op_s * ch[0] + op_m * ch[1]
                        + op_h * ch[2])
        vib = c["vibrance"] * (1.0 - jnp.maximum(chroma_in, 0.0)
                               ** jnp.abs(c["vibrance"]))
        chroma_factor = jnp.maximum(1.0 + chroma_boost + vib, 0.0)
        chroma_out = chroma_in * chroma_factor
        # gamut guards: keep (r, g, b) of the chromaticity positive
        safe_cos = jnp.where(jnp.abs(cos_h) > 1e-9, cos_h, 1e-9)
        safe_sin = jnp.where(jnp.abs(sin_h) > 1e-9, sin_h, 1e-9)
        r_lim = -sp.YRG_WHITE_R / safe_cos
        g_lim = -sp.YRG_WHITE_G / safe_sin
        s_lim = (1.0 - sp.YRG_WHITE_R - sp.YRG_WHITE_G) / (safe_cos + safe_sin)
        chroma_out = jnp.where(chroma_out * cos_h + sp.YRG_WHITE_R < 0.0,
                               jnp.minimum(r_lim, chroma_out), chroma_out)
        chroma_out = jnp.where(chroma_out * sin_h + sp.YRG_WHITE_G < 0.0,
                               jnp.minimum(g_lim, chroma_out), chroma_out)
        chroma_out = jnp.where(
            (chroma_out * cos_h + sp.YRG_WHITE_R)
            + (chroma_out * sin_h + sp.YRG_WHITE_G) > 1.0,
            jnp.minimum(s_lim, chroma_out), chroma_out)
        yrg = jnp.stack([Y, chroma_out * cos_h + sp.YRG_WHITE_R,
                         chroma_out * sin_h + sp.YRG_WHITE_G])

        # 4-way grading in grading RGB
        grading = sp.lms_to_grading(sp.yrg_to_lms(yrg))
        gl, sh, hl, mt = (c["global"], c["shadows"], c["highlights"],
                          c["midtones"])
        wf = c["white_fulcrum"]
        chans = []
        for i in range(3):
            g = grading[i] + gl[i]
            g = g * (cp_h * (cp_s + op_s * sh[i]) + op_h * hl[i])
            chans.append(jnp.sign(g) * (jnp.abs(g) / wf) ** mt[i] * wf)
        grading = jnp.stack(chans)

        yrg = sp.lms_to_yrg(sp.grading_to_lms(grading))
        Y2 = jnp.maximum(yrg[0] / wf, 0.0) ** c["midtones_Y"] * wf
        Y2 = c["grey_fulcrum"] * jnp.maximum(
            Y2 / c["grey_fulcrum"], 0.0) ** c["contrast"]
        yrg = jnp.stack([Y2, yrg[1], yrg[2]])
        xyz = apply_matrix(sp.yrg_to_lms(yrg), sp.LMS2006_TO_XYZ_D65.tolist())

        # saturation / brilliance in JzAzBz
        jab = sp.xyz_to_jzazbz(jnp.maximum(xyz, 0.0))
        Jz = jab[0]
        Cz = jnp.sqrt(jab[1] ** 2 + jab[2] ** 2)
        inv_cz = jnp.where(Cz > 0.0, 1.0 / jnp.maximum(Cz, 1e-20), 0.0)
        cos_H = jab[1] * inv_cz
        sin_H = jab[2] * inv_cz
        # first quadrant (Jz, Cz >= 0); Pallas TPU has no atan/atan2 lowering
        from ..kernels.pointwise import atan_pos
        T = atan_pos(Cz, Jz)
        hyp = jnp.sqrt(Jz * Jz + Cz * Cz)
        inv_h = jnp.where(hyp > 0.0, 1.0 / jnp.maximum(hyp, 1e-20), 0.0)
        sin_T = Cz * inv_h
        cos_T = jnp.where(hyp > 0.0, Jz * inv_h, 1.0)
        sat = c["saturation"]
        bri = c["brilliance"]
        boost_b = 1.0 + c["brilliance_global"] + op_s * bri[0] \
            + op_m * bri[1] + op_h * bri[2]
        boost_s = c["saturation_global"] + op_s * sat[0] + op_m * sat[1] \
            + op_h * sat[2]
        S0 = Jz * cos_T + Cz * sin_T
        O1 = S0 * jnp.clip(T * boost_s, -T, math.pi / 2.0 - T)
        S1 = jnp.maximum(S0 * boost_b, 0.0)
        Jz2 = jnp.maximum(S1 * cos_T - O1 * sin_T, 0.0)
        Cz2 = jnp.maximum(S1 * sin_T + O1 * cos_T, 0.0)

        # analytic gamut clamps: LMS' rows of the inverse Iz(Az,Bz) matrix
        # must stay positive (colorbalancergb.c JzAzBz branch)
        d0 = 1.6295499532821566e-11
        dd = -0.56
        Iz = Jz2 + d0
        Iz = jnp.maximum(Iz / (1.0 + dd - dd * Iz), 0.0)
        AI = sp.JZ_AI.tolist()
        max_C = Cz2
        for row in range(3):
            denom = AI[row][1] * cos_H + AI[row][2] * sin_H
            lms_test = Iz * AI[row][0] + Cz2 * denom
            lim = -Iz * AI[row][0] / jnp.where(jnp.abs(denom) > 1e-12,
                                               denom, 1e-12)
            max_C = jnp.where(lms_test < 0.0, jnp.minimum(lim, max_C), max_C)

        jab_out = jnp.stack([Jz2, max_C * cos_H, max_C * sin_H])
        xyz_out = sp.jzazbz_to_xyz(jab_out)
        out = apply_matrix(jnp.maximum(xyz_out, 0.0), c["out_mat"])
        return jnp.maximum(out, 0.0)
