"""colorout — working RGB -> output color profile (display-referred).

Reference: `/root/reference/src/iop/colorout.c` (params v5,
colorout.c:107-112).  Matrix+TRC output profiles (sRGB default, AdobeRGB,
Rec709, Display-P3) are exact here; LCMS LUT/ICC-intent profiles are a later
milestone.  The transfer curve is applied in-graph right after the matrix so
XLA fuses matrix+TRC into one pass.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..color import matrices as cm
from ..color.transforms import apply_matrix, gamma_encode, srgb_encode
from ..core.params import cfield, params
from ..core.types import Colorspace, ImageSpec
from .base import Op, OpPlan, PlanContext, register
from .colorin import (CS_ADOBERGB, CS_DISPLAY_P3, CS_LIN_REC709,
                      CS_LIN_REC2020, CS_PROPHOTO, CS_REC709, CS_SRGB,
                      _WORK_NAMES)

# transfer curves per output profile type
_TRC = {
    CS_SRGB: "srgb",
    CS_DISPLAY_P3: "srgb",
    CS_ADOBERGB: ("gamma", 563.0 / 256.0),  # AdobeRGB 2.19921875
    CS_REC709: ("gamma", 1.0 / 0.45),
    CS_LIN_REC709: "linear",
    CS_LIN_REC2020: "linear",
    CS_PROPHOTO: ("gamma", 1.8),
}


@params(op="colorout", version=5)
@dataclasses.dataclass
class ColoroutParams:
    type: int = cfield("i", CS_SRGB)
    filename: str = cfield("s:512", "")
    intent: int = cfield("i", 0)


    @classmethod
    def from_legacy(cls, version, raw):
        import struct

        def cut(b):
            return b.split(b"\x00")[0].decode("utf-8", "replace")

        # colorout.c ladder (:120-210): named-profile strings -> types
        names = {"sRGB": 0, "linear_rec709_rgb": 4, "linear_rgb": 4,
                 "linear_rec2020_rgb": 5, "adobergb": 1,
                 "X profile": -2}
        if version in (2, 3):
            v = struct.unpack("<100s100s2i", raw[:208])
            prof = cut(v[0])
            if prof in names:
                return cls(type=names[prof], intent=v[2])
            return cls(type=99, filename=prof, intent=v[2])
        if version == 4:
            v = struct.unpack("<i100si", raw[:108])
            return cls(type=v[0], filename=cut(v[1]), intent=v[2])
        return None


@register
class Colorout(Op):
    name = "colorout"
    input_colorspace = Colorspace.WORK_RGB
    mandatory = True

    def plan(self, ctx: PlanContext, spec_in: ImageSpec, p: ColoroutParams) -> OpPlan:
        if p.type == 0:  # DT_COLORSPACE_FILE: custom ICC output profile
            fname = p.filename
            if isinstance(fname, bytes):
                fname = fname.split(b"\0")[0].decode("utf-8", "ignore")
            return OpPlan(
                spec_in=spec_in,
                spec_out=spec_in.with_colorspace(Colorspace.DISPLAY_RGB),
                static=("icc", fname.strip("\0")),
            )
        trc = _TRC.get(p.type, "srgb")
        dst = _WORK_NAMES.get(p.type, "srgb")
        return OpPlan(
            spec_in=spec_in,
            spec_out=spec_in.with_colorspace(Colorspace.DISPLAY_RGB),
            static=(dst, trc),
        )

    def coeffs(self, ctx: PlanContext, plan: OpPlan, p: ColoroutParams):
        dst, _ = plan.static
        if dst == "icc":
            return {"M": np.eye(3, dtype=np.float32)}
        work = ctx.notes.get("work_profile", cm.WORK_PROFILE)
        M = cm.rgb_to_rgb_matrix(work, dst)
        return {"M": M.astype(np.float32)}

    def apply(self, x, c, plan: OpPlan, ctx: PlanContext):
        if plan.static[0] == "icc":
            return self._apply_icc(x, plan.static[1], ctx)
        _, trc = plan.static
        y = apply_matrix(x, c["M"])
        y = jnp.clip(y, 0.0, 1.0)
        if trc == "srgb":
            return srgb_encode(y)
        if trc == "linear":
            return y
        return gamma_encode(y, trc[1])

    def _apply_icc(self, x, fname, ctx):
        """Custom matrix+TRC ICC output profile: work -> XYZ D50 ->
        inverse profile matrix -> inverse TRC (colorout.c LCMS path for
        matrix profiles) or the profile's B2A LUT pipeline
        (color/icc.xyz_to_device_fn)."""
        import os

        from ..color import icc as icc_mod
        from ..pixel.curves import MONOTONE_HERMITE, curve_coeffs, eval_curve

        search = getattr(ctx.meta, "sidecar_dir", "") or "."
        prof = None
        for cand in (fname, os.path.join(search, fname),
                     os.path.join(search, "color", "out", fname)):
            if os.path.exists(cand):
                prof = icc_mod.load_icc(cand)
                break
        if prof is None:
            raise ValueError(f"colorout: ICC profile '{fname}' not found")
        if prof.kind != "matrix":
            if prof.b2a is None:
                raise ValueError(
                    "colorout: LUT output profile has no B2A tag")
            xyz = apply_matrix(x, cm.XYZ_FROM_WORK.tolist())
            return jnp.clip(icc_mod.xyz_to_device_fn(prof)(xyz), 0.0, 1.0)
        xyz = apply_matrix(x, cm.XYZ_FROM_WORK.tolist())
        lin = apply_matrix(xyz, np.linalg.inv(prof.to_xyz).tolist())
        lin = jnp.clip(lin, 0.0, 1.0)
        out = []
        for ch in range(3):
            trc = prof.trc[ch]
            # numeric inverse of the (monotone) TRC; nodes packed toward
            # 0 where the inverse gamma curve is steep
            ys = np.linspace(0.0, 1.0, 4096)
            xs = np.interp(ys, trc, np.linspace(0.0, 1.0, len(trc)))
            pick = np.unique((np.linspace(0.0, 1.0, 40) ** 2
                              * 4095).astype(int))
            coeffs = curve_coeffs(ys[pick], xs[pick], MONOTONE_HERMITE)
            out.append(eval_curve(lin[ch], *coeffs))
        return jnp.clip(jnp.stack(out), 0.0, 1.0)

    def pointwise_spec(self, plan, ctx):
        if plan.static[0] == "icc":
            return None
        from .base import PointwiseSpec
        _, trc = plan.static

        def fn(b, cd):
            y = jnp.clip(apply_matrix(b, cd["M"]), 0.0, 1.0)
            if trc == "srgb":
                return srgb_encode(y)
            if trc == "linear":
                return y
            return gamma_encode(y, trc[1])

        return PointwiseSpec(consts=("M",), mats=("M",), fn=fn)
