"""lens — optical corrections: distortion warp, TCA, vignetting.

Reference: `/root/reference/src/iop/lens.cc` (lensfun bridge): the reference
resolves per-lens correction models from the lensfun database at commit
time, then applies (a) a radial distortion warp, (b) per-channel TCA scale
warps, (c) radial vignetting gain.  The lensfun database is not shipped
here, so the op exposes the same correction *models* (ptlens a/b/c, poly3
k1, poly5, plus linear TCA and pa-model vignetting) with explicit
coefficients; the XMP params carry the lens identity which a future
database stage can resolve to coefficients.

TPU form: the inverse-warp coordinates are computed in-graph; on TPU the
resampling runs through the two-pass Pallas warp kernel
(`kernels/warp_pallas.py`, ~27 ms at 24MP x3 vs ~1.5 s for the XLA
gather), with the displacement bound computed host-side from the model
coefficients at plan time.  CPU keeps the direct bilinear gather.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core.params import cfield, params
from ..core.types import Colorspace
from .base import Op, OpPlan, PlanContext, register

DIST_NONE = 0
DIST_POLY3 = 1
DIST_PTLENS = 2
DIST_POLY5 = 3

# modify flags (lensfun LF_MODIFY_*)
MODIFY_TCA = 1
MODIFY_VIGNETTING = 2
MODIFY_DISTORTION = 8
MODIFY_ALL = MODIFY_TCA | MODIFY_VIGNETTING | MODIFY_DISTORTION


@params(op="lens", version=5)
@dataclasses.dataclass
class LensParams:
    # serialized layout = reference dt_iop_lensfun_params_t v5
    # (lens.cc:115, struct at lens.cc:~150): the XMP carries the lens
    # identity + shot metadata; correction-model coefficients are resolved
    # from a database in the reference (lensfun) and are python-only
    # fields here (no lensfun DB in this build — see plan()).
    modify_flags: int = cfield("i", MODIFY_ALL)
    inverse: int = cfield("i", 0)
    scale: float = cfield("f", 1.0)
    crop: float = cfield("f", 1.0)
    focal: float = cfield("f", 50.0)
    aperture: float = cfield("f", 2.8)
    distance: float = cfield("f", 1000.0)
    target_geom: int = cfield("i", 1)  # LF_RECTILINEAR
    camera: str = cfield("s:128", "")
    lens: str = cfield("s:128", "")
    tca_override: int = cfield("i", 0)
    tca_r: float = cfield("f", 1.0)
    tca_b: float = cfield("f", 1.0)
    modified: int = cfield("i", 0)

    @classmethod
    def from_legacy(cls, version, raw):
        import struct

        # lens.cc version ladder: v2 (52-char names), v3 (128-char),
        # v4 (+modified); ALL old versions had tca R and B swapped
        def cut(b):
            return b.split(b"\x00")[0].decode("utf-8", "replace")

        if version == 2:
            v = struct.unpack("<2i5fi52s52si2f", raw[:148])
        elif version == 3:
            v = struct.unpack("<2i5fi128s128si2f", raw[:300])
        elif version == 4:
            v = struct.unpack("<2i5fi128s128si2fi", raw[:304])
        else:
            return None
        return cls(modify_flags=v[0], inverse=v[1], scale=v[2],
                   crop=v[3], focal=v[4], aperture=v[5], distance=v[6],
                   target_geom=v[7], camera=cut(v[8]), lens=cut(v[9]),
                   tca_override=v[10], tca_r=v[12], tca_b=v[11],
                   modified=1 if version < 4 else v[13])
    # --- python-only correction coefficients (not serialized) ---
    distortion_model: int = dataclasses.field(default=DIST_PTLENS)
    dist_a: float = dataclasses.field(default=0.0)
    dist_b: float = dataclasses.field(default=0.0)
    dist_c: float = dataclasses.field(default=0.0)
    vig_k1: float = dataclasses.field(default=0.0)
    vig_k2: float = dataclasses.field(default=0.0)
    vig_k3: float = dataclasses.field(default=0.0)
    # TCA per-channel poly3 r/b terms (lensfun: rs = rd(b r^2 + c r + v);
    # the serialized tca_r/tca_b act as the v terms)
    tca_cr: float = dataclasses.field(default=0.0)
    tca_br: float = dataclasses.field(default=0.0)
    tca_cb: float = dataclasses.field(default=0.0)
    tca_bb: float = dataclasses.field(default=0.0)
    # r-normalization: 0 = half-diagonal (hand-entered coeffs, historic
    # behavior), 1 = half-short-side (lensfun/PanoTools convention, set
    # by the database resolver)
    norm_short_side: int = dataclasses.field(default=0)


def _resolve_from_db(p: "LensParams") -> "LensParams":
    """Fill model coefficients from the lensfun database when the params
    carry a lens identity but no explicit coefficients (the reference
    resolves at commit time via the lensfun bridge, lens.cc).  Explicit
    hand-set coefficients always win.  Unresolvable identities warn
    loudly inside io.lensfun.resolve."""
    explicit = any(abs(v) > 0.0 for v in (
        p.dist_a, p.dist_b, p.dist_c, p.vig_k1, p.vig_k2, p.vig_k3))
    if explicit or not (p.camera or p.lens):
        return p
    from ..io import lensfun as lfdb

    c = lfdb.resolve(p.camera, p.lens, p.focal, p.aperture,
                     p.distance, crop=p.crop)
    if not c.found_lens:
        return p
    upd = dict(norm_short_side=1)
    if c.have_distortion and (p.modify_flags & MODIFY_DISTORTION):
        model = {"ptlens": DIST_PTLENS, "poly3": DIST_POLY3,
                 "poly5": DIST_POLY5}[c.dist_model]
        if model == DIST_POLY3:
            upd.update(distortion_model=model, dist_a=c.dist[0])
        else:
            upd.update(distortion_model=model, dist_a=c.dist[0],
                       dist_b=c.dist[1], dist_c=c.dist[2])
    else:
        upd.update(distortion_model=DIST_NONE)
    if c.have_tca and (p.modify_flags & MODIFY_TCA) and not p.tca_override:
        upd.update(tca_r=c.tca_r[0], tca_cr=c.tca_r[1], tca_br=c.tca_r[2],
                   tca_b=c.tca_b[0], tca_cb=c.tca_b[1], tca_bb=c.tca_b[2])
    if c.have_vignetting and (p.modify_flags & MODIFY_VIGNETTING):
        upd.update(vig_k1=c.vig[0], vig_k2=c.vig[1], vig_k3=c.vig[2])
    return dataclasses.replace(p, **upd)


def _sample_bilinear(plane: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray):
    """Warp via ONE packed gather: the four bilinear corners are stacked
    on a trailing dim so TPU fetches 16 contiguous bytes per pixel instead
    of four scattered scalars — 3.4x faster than four separate gathers."""
    h, w = plane.shape
    y0 = jnp.clip(jnp.floor(ys), 0, h - 2).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(xs), 0, w - 2).astype(jnp.int32)
    fy = jnp.clip(ys - y0, 0.0, 1.0)
    fx = jnp.clip(xs - x0, 0.0, 1.0)
    pad = jnp.pad(plane, ((0, 1), (0, 1)), mode="edge")
    packed = jnp.stack([pad[:h, :w], pad[:h, 1:w + 1],
                        pad[1:h + 1, :w], pad[1:h + 1, 1:w + 1]], axis=-1)
    p = packed[y0, x0]  # (h, w, 4)
    return (p[..., 0] * (1 - fy) * (1 - fx) + p[..., 1] * (1 - fy) * fx
            + p[..., 2] * fy * (1 - fx) + p[..., 3] * fy * fx)


@register
class Lens(Op):
    name = "lens"
    input_colorspace = None  # camera RGB (order 13, after demosaic)

    def plan(self, ctx: PlanContext, spec_in, p: LensParams) -> OpPlan:
        # host-side displacement bound for the Pallas warp (static)
        import numpy as np

        p = _resolve_from_db(p)
        cy = (spec_in.height - 1) / 2.0
        cx = (spec_in.width - 1) / 2.0
        rnorm = (min(cy, cx) if p.norm_short_side
                 else float(np.sqrt(cx * cx + cy * cy)))
        rmax = float(np.sqrt(cx * cx + cy * cy)) / max(rnorm, 1e-6)
        r = np.linspace(0.0, rmax, 257)
        if (p.modify_flags & MODIFY_DISTORTION) \
                and p.distortion_model != DIST_NONE:
            if p.distortion_model == DIST_POLY3:
                mult = 1.0 - p.dist_a + p.dist_a * r * r
            elif p.distortion_model == DIST_POLY5:
                mult = 1.0 + p.dist_a * r**2 + p.dist_b * r**4
            else:
                mult = (p.dist_a * r**3 + p.dist_b * r**2 + p.dist_c * r
                        + (1.0 - p.dist_a - p.dist_b - p.dist_c))
        else:
            mult = np.ones_like(r)
        mult = mult / max(p.scale, 1e-3)
        if p.modify_flags & MODIFY_TCA:
            tcas = (p.tca_r + p.tca_cr * r + p.tca_br * r * r,
                    np.ones_like(r),
                    p.tca_b + p.tca_cb * r + p.tca_bb * r * r)
        else:
            tcas = (np.ones_like(r),)
        max_dev = max(float(np.max(np.abs(mult * t - 1.0) * r))
                      for t in tcas)
        max_disp = int(np.ceil(max_dev * rnorm)) + 1
        return OpPlan(spec_in=spec_in, spec_out=spec_in,
                      static=(p.distortion_model, p.modify_flags,
                              max_disp, bool(p.norm_short_side)))

    def coeffs(self, ctx, plan, p: LensParams):
        p = _resolve_from_db(p)
        return {"a": p.dist_a, "b": p.dist_b, "c": p.dist_c,
                "scale": max(p.scale, 1e-3),
                "tca_r": [p.tca_r, p.tca_cr, p.tca_br],
                "tca_b": [p.tca_b, p.tca_cb, p.tca_bb],
                "vig": [p.vig_k1, p.vig_k2, p.vig_k3]}

    def apply(self, x, c, plan: OpPlan, ctx: PlanContext):
        import math

        model, flags, max_disp, short_side = plan.static
        spec = plan.spec_in
        h, w = spec.pad_h, spec.pad_w
        cy, cx = (spec.height - 1) / 2.0, (spec.width - 1) / 2.0
        rnorm = min(cy, cx) if short_side else math.sqrt(cx * cx + cy * cy)

        def mult_of(r):
            # distortion: destination r -> source r multiplier
            if (flags & MODIFY_DISTORTION) and model != DIST_NONE:
                if model == DIST_POLY3:
                    m = 1.0 - c["a"] + c["a"] * r * r
                elif model == DIST_POLY5:
                    m = 1.0 + c["a"] * r**2 + c["b"] * r**4
                else:  # ptlens: ru = rd*(a rd^3 + b rd^2 + c rd + 1-a-b-c)
                    m = (c["a"] * r**3 + c["b"] * r**2 + c["c"] * r
                         + (1.0 - c["a"] - c["b"] - c["c"]))
            else:
                m = jnp.ones_like(r)
            return m / c["scale"]

        def tca_of(r, ch):
            # per-channel poly3 TCA: rs = rd (v + c r + b r^2)
            if ch is None or not (flags & MODIFY_TCA) or ch == 1:
                return 1.0
            t = c["tca_r"] if ch == 0 else c["tca_b"]
            return t[0] + t[1] * r + t[2] * r * r

        def coord(y, x_, ch=None):
            yn = (y - cy) / rnorm
            xn = (x_ - cx) / rnorm
            r = jnp.sqrt(yn * yn + xn * xn)
            m = mult_of(r) * tca_of(r, ch)
            return cy + (y - cy) * m, cx + (x_ - cx) * m

        if max_disp <= 1:
            res = x  # identity geometry (no distortion/TCA/scale)
        elif jax.default_backend() == "tpu":
            from ..kernels import warp_pallas

            res = warp_pallas.warp_model(
                x, coord, max_dy=max_disp, max_dx=max_disp,
                per_channel=bool(flags & MODIFY_TCA))
        else:
            yy = jax.lax.broadcasted_iota(jnp.float32, (h, 1), 0)
            xx = jax.lax.broadcasted_iota(jnp.float32, (1, w), 1)
            out = []
            for ch in range(3):
                src_y, src_x = coord(yy, xx, ch)
                out.append(_sample_bilinear(
                    x[ch], jnp.broadcast_to(src_y, (h, w)),
                    jnp.broadcast_to(src_x, (h, w))))
            res = jnp.stack(out)

        if flags & MODIFY_VIGNETTING:
            k1, k2, k3 = c["vig"]
            yy = jax.lax.broadcasted_iota(jnp.float32, (h, 1), 0)
            xx = jax.lax.broadcasted_iota(jnp.float32, (1, w), 1)
            r2 = jnp.broadcast_to(
                ((yy - cy) ** 2 + (xx - cx) ** 2) / (rnorm * rnorm),
                (h, w))
            gain = 1.0 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2
            res = res / jnp.maximum(gain, 1e-3)[None]
        return res
