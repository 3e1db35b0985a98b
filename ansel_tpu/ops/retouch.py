"""retouch — per-wavelet-scale clone / heal / blur / fill over drawn masks.

Reference: `/root/reference/src/iop/retouch.c` — form records (:111-124:
formid, wavelet scale, algorithm, blur/fill settings), params (:137-156:
300 form slots + scale controls), process (:3500-3600: B3 à-trous
decompose via dwt.c, rt_process_forms applies each form's tool on its
assigned scale layer, resynthesize).  Algorithms (:103-109): clone=1,
heal=2 (pixel/heal.py Poisson), blur=3, fill=4 (erase or color).

scale 0 edits the full image; 1..n edit that detail layer;
num_scales+1 edits the residual.
"""

from __future__ import annotations

import dataclasses
import struct

import jax.numpy as jnp

from ..core.params import cfield, params
from ..pixel.blur import gaussian_blur
from ..pixel.wavelets import atrous_decompose, atrous_reconstruct
from .base import Op, OpPlan, PlanContext, register

NO_FORMS = 300
ALGO_CLONE, ALGO_HEAL, ALGO_BLUR, ALGO_FILL = 1, 2, 3, 4
FILL_ERASE, FILL_COLOR = 0, 1
# formid, scale, algorithm, blur_type (4i), blur_radius (f),
# fill_mode (i), fill_color (3f), fill_brightness (f), distort_mode (i)
_FORM_FMT = "<4if i3ffi"
_FORM_SIZE = struct.calcsize(_FORM_FMT)  # 44 bytes


@params(op="retouch", version=3)
@dataclasses.dataclass
class RetouchParams:
    rt_forms: bytes = cfield(f"raw:{NO_FORMS * _FORM_SIZE}",
                             b"\0" * (NO_FORMS * _FORM_SIZE))
    algorithm: int = cfield("i", ALGO_HEAL)
    num_scales: int = cfield("i", 0)
    curr_scale: int = cfield("i", 0)
    merge_from_scale: int = cfield("i", 0)
    preview_levels: tuple = cfield("3f", (-3.0, 0.0, 3.0))
    blur_type: int = cfield("i", 0)
    blur_radius: float = cfield("f", 10.0)
    fill_mode: int = cfield("i", FILL_ERASE)
    fill_color: tuple = cfield("3f", (0.0, 0.0, 0.0))
    fill_brightness: float = cfield("f", 0.0)
    max_heal_iter: int = cfield("i", 2000)

    @classmethod
    def from_legacy(cls, version, raw):
        # retouch.c legacy_params ladder (v3 = current, retouch.c:79)
        if version == 2:
            # v2 = v3 minus trailing max_heal_iter
            p = cls.codec.decode(raw + b"\0" * 4)
            p.max_heal_iter = 2000
            return p
        if version == 1:
            # v1 forms are 40B (no distort_mode); expand each record,
            # tagging distort_mode=1 (legacy pre-distortion behavior)
            forms = b"".join(
                raw[k * 40:(k + 1) * 40] + struct.pack("<i", 1)
                for k in range(NO_FORMS))
            tail = raw[NO_FORMS * 40:NO_FORMS * 40 + 56]
            p = cls.codec.decode(forms + tail + b"\0" * 4)
            p.max_heal_iter = 2000
            return p
        return None


def pack_form(formid: int, scale: int = 0, algorithm: int = ALGO_HEAL,
              blur_type: int = 0, blur_radius: float = 10.0,
              fill_mode: int = FILL_ERASE, fill_color=(0.0, 0.0, 0.0),
              fill_brightness: float = 0.0) -> bytes:
    """Helper to build one rt_forms record (scripts/tests)."""
    return struct.pack(_FORM_FMT, formid, scale, algorithm, blur_type,
                       blur_radius, fill_mode, *fill_color,
                       fill_brightness, 2)


def _decode_forms(blob: bytes):
    out = []
    for k in range(NO_FORMS):
        rec = blob[k * _FORM_SIZE:(k + 1) * _FORM_SIZE]
        if len(rec) < _FORM_SIZE:
            break
        vals = struct.unpack(_FORM_FMT, rec)
        if vals[0]:
            out.append(vals)
    return out


@register
class Retouch(Op):
    name = "retouch"
    compile_weight = 3
    input_colorspace = None

    def enabled_by_default(self, meta):
        return False

    def plan(self, ctx: PlanContext, spec_in, p: RetouchParams) -> OpPlan:
        from ..pipeline import masks as mk
        from . import _maskwin

        forms = ctx.notes.get("forms", {})
        num_scales = max(int(p.num_scales), 0)
        recs = []
        blob = p.rt_forms if isinstance(p.rt_forms, bytes) else bytes(
            p.rt_forms)
        boxes = []
        for vals in _decode_forms(blob):
            (fid, scale, algo, btype, bradius, fmode, fr, fg, fb,
             fbright, _dm) = vals
            form = forms.get(fid)
            if form is None or not form.nodes:
                continue
            if algo in (ALGO_CLONE, ALGO_HEAL):
                cx = float(form.nodes[0][0])
                cy = float(form.nodes[0][1])
                dy = int(round((float(form.src[1]) - cy) * spec_in.height))
                dx = int(round((float(form.src[0]) - cx) * spec_in.width))
            else:  # blur/fill read no clone source (src is (0,0) junk)
                dy = dx = 0
            brad = float(bradius) * ctx.scale
            # per-form window for the scale-0 (image-domain) tools
            win = _maskwin.plan_window(form, forms, spec_in, dy, dx,
                                       margin=16 + int(brad * 3))
            recs.append((mk.form_signature(form, forms), fid, scale, algo,
                         brad, fmode,
                         (fr + fbright, fg + fbright, fb + fbright),
                         dy, dx, win))
            if scale != 0:
                box = mk.form_bbox(form, forms, spec_in.height,
                                   spec_in.width)
                if box is None:
                    boxes = None
                    break
                y0, y1, x0, x1 = box
                boxes.append((min(y0, y0 + dy), max(y1, y1 + dy),
                              min(x0, x0 + dx), max(x1, x1 + dx),
                              int(brad * 3)))
        # union window for the wavelet-scale edits: bbox of every
        # scale>0 form (+ its clone source) + the cumulative a-trous
        # support halo, so in-window detail layers match the full-image
        # decompose inside the masks
        wv_win = None
        if num_scales > 0 and boxes:
            halo = 2 * (2 ** min(num_scales, 12)) + 16
            y0 = min(b[0] - b[4] for b in boxes) - halo
            y1 = max(b[1] + b[4] for b in boxes) + halo
            x0 = min(b[2] - b[4] for b in boxes) - halo
            x1 = max(b[3] + b[4] for b in boxes) + halo
            H, W = spec_in.array_shape[-2], spec_in.array_shape[-1]
            y0, x0 = max(y0, 0), max(x0, 0)
            y1, x1 = min(y1, H), min(x1, W)
            if (y1 - y0 >= 2 and x1 - x0 >= 2
                    and (y1 - y0) * (x1 - x0)
                    <= _maskwin.MAX_AREA_FRAC * H * W):
                wv_win = (y0, y1, x0, x1)
        return OpPlan(spec_in=spec_in, spec_out=spec_in,
                      static=(num_scales, tuple(recs), wv_win))

    def _tool(self, layer, mask, rec, forms):
        (_sig, _fid, _scale, algo, bradius, fmode, fill, dy, dx,
         _win) = rec
        if algo == ALGO_CLONE:
            src = jnp.roll(layer, (-dy, -dx), axis=(-2, -1))
            return layer * (1.0 - mask)[None] + src * mask[None]
        if algo == ALGO_HEAL:
            from ..pixel.heal import heal

            src = jnp.roll(layer, (-dy, -dx), axis=(-2, -1))
            return heal(layer, src, mask)
        if algo == ALGO_BLUR:
            blurred = gaussian_blur(layer, max(bradius, 0.5))
            return layer * (1.0 - mask)[None] + blurred * mask[None]
        # fill: erase -> 0 on detail layers / fill color
        color = jnp.asarray(fill, layer.dtype).reshape(3, 1, 1)
        target = jnp.zeros_like(layer) if fmode == FILL_ERASE \
            else jnp.broadcast_to(color, layer.shape)
        return layer * (1.0 - mask)[None] + target * mask[None]

    def _apply_image_domain(self, out, rec, forms, spec):
        """One scale-0 (image-domain) tool, windowed when possible."""
        from ..pipeline import masks as mk
        from . import _maskwin

        form = forms.get(rec[1])
        win = rec[9]
        if win is not None:
            dy, dx = rec[7], rec[8]

            def tool(dst, src, m, _rec=rec):
                if _rec[3] == ALGO_CLONE:
                    return dst * (1.0 - m)[None] + src * m[None]
                if _rec[3] == ALGO_HEAL:
                    from ..pixel.heal import heal

                    return heal(dst, src, m)
                if _rec[3] == ALGO_BLUR:
                    blurred = gaussian_blur(dst, max(_rec[4], 0.5))
                    return dst * (1.0 - m)[None] + blurred * m[None]
                color = jnp.asarray(_rec[6], dst.dtype).reshape(3, 1, 1)
                target = jnp.zeros_like(dst) if _rec[5] == FILL_ERASE \
                    else jnp.broadcast_to(color, dst.shape)
                return dst * (1.0 - m)[None] + target * m[None]

            return _maskwin.apply_windowed(out, form, forms, spec, win,
                                           tool, dy, dx)
        H, W = out.shape[-2:]
        m = mk.rasterize(form, forms, H, W,
                         norm_h=spec.height, norm_w=spec.width)
        return self._tool(out, m, rec, forms)

    def apply(self, x, c, plan: OpPlan, ctx: PlanContext):
        from ..pipeline import masks as mk

        num_scales, recs, wv_win = plan.static
        if not recs:
            return x
        forms = ctx.notes.get("forms", {})
        H, W = x.shape[-2:]
        spec = plan.spec_in

        if num_scales <= 0:
            out = x
            for rec in recs:
                if rec[2] == 0:
                    out = self._apply_image_domain(out, rec, forms, spec)
            return out

        # wavelet-scale edits: decompose only the union window of the
        # scale>0 forms (a-trous reconstruct(decompose(x)) == x, so the
        # paste-back only changes pixels under the edited masks)
        if wv_win is not None:
            y0, y1, x0, x1 = wv_win
            xw = x[:, y0:y1, x0:x1]
            origin = (y0, x0)
        else:
            xw = x
            origin = (0, 0)

        def mask_of(rec):
            form = forms.get(rec[1])
            return mk.rasterize(form, forms, xw.shape[-2], xw.shape[-1],
                                norm_h=spec.height, norm_w=spec.width,
                                origin=origin)

        details, residual = atrous_decompose(xw, num_scales)
        out_layers = list(details)
        for rec in recs:
            scale = rec[2]
            if scale == 0:
                continue  # applied below on the reconstruction
            if 1 <= scale <= num_scales:
                out_layers[scale - 1] = self._tool(
                    out_layers[scale - 1], mask_of(rec), rec, forms)
            else:  # residual
                residual = self._tool(residual, mask_of(rec), rec, forms)
        out_w = atrous_reconstruct(out_layers, residual)
        out = x.at[:, y0:y1, x0:x1].set(out_w) if wv_win is not None \
            else out_w
        for rec in recs:
            if rec[2] == 0:
                out = self._apply_image_domain(out, rec, forms, spec)
        return out
