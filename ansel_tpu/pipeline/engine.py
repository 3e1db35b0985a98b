"""Pipeline engine: history stack -> one jit-fused XLA graph.

This replaces the reference's recursive, cache-walking executor
(`/root/reference/src/develop/pixelpipe_hb.c:833-1244`) and its
history→node synchronization (`src/develop/dev_pixelpipe.c:1557-1700`):

  * `resolve_history` merges user history items with mandatory defaults and
    sorts by iop-order — the analog of `create_nodes` + `synch_all`.
  * `Pipeline.plan` runs each op's host-side planner, threading
    `PlanContext` (processed_maximum, wb, colorspace contracts) — the analog
    of the format/ROI propagation passes.
  * `Pipeline.compile` traces ONE function over all enabled ops and jits it.
    XLA's CSE + fusion replace the per-node pixel cache entirely; plan-level
    memoization (keyed on the static plan signature) replaces the kernel
    binary cache (`opencl.h:360-368`).
  * Params edits only change *traced* coefficient arguments → no recompile,
    which is the TPU answer to the reference's hash-keyed incremental
    recompute model.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import params as params_mod
from ..core.order import sort_key
from ..core.types import CFAPattern, Colorspace, ImageSpec, RawMeta
from ..ops import base as ops_base
from ..ops.base import PlanContext


@dataclasses.dataclass
class HistoryItem:
    """One history entry — reference `dt_dev_history_item_t`
    (src/develop/dev_history.h:50-74), minus GUI fields."""

    op: str
    params: Any = None          # dataclass, dict, or raw bytes
    version: Optional[int] = None
    enabled: bool = True
    iop_order: Optional[float] = None
    multi_priority: int = 0
    blend_params: Any = None


def _resolve_params(item: HistoryItem, meta: RawMeta):
    op = ops_base.get_op(item.op)
    if isinstance(item.params, (bytes, bytearray)):
        return params_mod.decode_blob(item.op, item.version or 1, bytes(item.params))
    if isinstance(item.params, dict):
        cls = params_mod.params_class(item.op, item.version)
        base = op.default_params(meta) if op else cls()
        return dataclasses.replace(base, **item.params)
    if item.params is None and op is not None:
        return op.default_params(meta)
    return item.params


def resolve_history(meta: RawMeta, history: List[HistoryItem],
                    order_version: int = None):
    """Merge history with mandatory modules and order the stack
    (reference dt_dev_read_history_ext's default-module injection +
    iop-order sort).  order_version selects the legacy/v30/v30-jpg/
    ansel order table (iop_order.h:148-157); defaults to v30."""
    from ..core import order as order_mod

    version = (order_version if order_version is not None
               else order_mod.ORDER_V30)
    items = list(history)
    present = {h.op for h in items}
    for name, op in ops_base.all_ops().items():
        if name not in present and op.enabled_by_default(meta):
            items.append(HistoryItem(op=name, enabled=True))
    items.sort(key=lambda h: sort_key(h.op, h.iop_order,
                                      h.multi_priority, version))
    return items


@dataclasses.dataclass
class PlannedOp:
    name: str
    op: ops_base.Op
    plan: ops_base.OpPlan
    params: Any
    blend: Any = None          # BlendParams when active
    blend_static: Any = None   # (cst, blend_mode, mask_mode, combine, blendif)
    blend_form: Any = None     # masks.Form when the blend uses a drawn mask
    multi_priority: int = 0    # instance id (raster side-band key)


class _ConvertOp(ops_base.Op):
    """Synthetic colorspace-conversion stage, inserted by the planner where
    an op's declared input space differs from the pipeline's current one —
    the fused analog of the reference's per-node conversion pass
    (src/develop/pixelpipe_cpu.c:54-77)."""

    name = "_convert"

    def plan_pair(self, spec_in, dst: Colorspace):
        return ops_base.OpPlan(
            spec_in=spec_in,
            spec_out=dataclasses.replace(spec_in, colorspace=dst),
            static=(spec_in.colorspace, dst),
        )

    def apply(self, x, c, plan, ctx):
        from ..color import matrices as cm
        from ..color import transforms as tr

        src, dst = plan.static
        white = cm.PIPE_WHITE_XYZ  # D50 Lab, like the reference
        if (src, dst) == (Colorspace.WORK_RGB, Colorspace.LAB):
            xyz = tr.apply_matrix(x, cm.XYZ_FROM_WORK)
            return tr.xyz_to_lab(xyz, white)
        if (src, dst) == (Colorspace.LAB, Colorspace.WORK_RGB):
            xyz = tr.lab_to_xyz(x, white)
            return tr.apply_matrix(xyz, cm.WORK_FROM_XYZ)
        raise ValueError(f"no conversion {src} -> {dst}")

    def pointwise_spec(self, plan, ctx):
        """Pallas-safe scalar form so Lab pointwise segments fuse too."""
        from ..color import matrices as cm
        from ..color.transforms import apply_matrix
        from ..ops.base import PointwiseSpec

        src, dst = plan.static
        white = [float(v) for v in cm.PIPE_WHITE_XYZ]
        eps, kappa = 216.0 / 24389.0, 24389.0 / 27.0

        if (src, dst) == (Colorspace.WORK_RGB, Colorspace.LAB):
            M = cm.XYZ_FROM_WORK.tolist()

            def fn(b, cd):
                xyz = apply_matrix(b, M)
                f = []
                for i in range(3):
                    r = xyz[i] / white[i]
                    f.append(jnp.where(
                        r > eps, jnp.maximum(r, 1e-12) ** (1.0 / 3.0),
                        (kappa * r + 16.0) / 116.0))
                return jnp.stack([116.0 * f[1] - 16.0,
                                  500.0 * (f[0] - f[1]),
                                  200.0 * (f[1] - f[2])])

            return PointwiseSpec(consts=(), fn=fn)

        if (src, dst) == (Colorspace.LAB, Colorspace.WORK_RGB):
            Mi = cm.WORK_FROM_XYZ.tolist()

            def fn(b, cd):
                fy = (b[0] + 16.0) / 116.0
                fx = fy + b[1] / 500.0
                fz = fy - b[2] / 200.0
                out = []
                for i, fc in enumerate((fx, fy, fz)):
                    f3 = fc * fc * fc
                    out.append(jnp.where(f3 > eps, f3,
                                         (116.0 * fc - 16.0) / kappa)
                               * white[i])
                return apply_matrix(jnp.stack(out), Mi)

            return PointwiseSpec(consts=(), fn=fn)
        return None


def _rewindow(x, spec_from: ImageSpec, spec_to: ImageSpec):
    """Slice the producing stage's buffer down to the consuming stage's
    (possibly smaller) planned window, re-padding to lane shape.  All
    indices are static; identical windows are a no-op."""
    if (spec_from.org_y == spec_to.org_y
            and spec_from.org_x == spec_to.org_x
            and spec_from.pad_h == spec_to.pad_h
            and spec_from.pad_w == spec_to.pad_w
            and spec_from.height == spec_to.height
            and spec_from.width == spec_to.width):
        return x
    y0 = spec_to.org_y - spec_from.org_y
    x0 = spec_to.org_x - spec_from.org_x
    assert y0 >= 0 and x0 >= 0, (spec_from, spec_to)
    # slice as much real data as the source buffer holds (its pad region
    # is edge-replicated, acceptable haloing), then edge-pad the rest
    y1 = min(y0 + spec_to.pad_h, spec_from.pad_h)
    x1 = min(x0 + spec_to.pad_w, spec_from.pad_w)
    sl = (..., slice(y0, y1), slice(x0, x1))
    cut = x[sl]
    py = spec_to.pad_h - (y1 - y0)
    px = spec_to.pad_w - (x1 - x0)
    if py or px:
        pad = [(0, 0)] * (cut.ndim - 2) + [(0, py), (0, px)]
        cut = jnp.pad(cut, pad, mode="edge")
    return cut


_CONVERT = _ConvertOp()
_CONVERTIBLE = {
    (Colorspace.WORK_RGB, Colorspace.LAB),
    (Colorspace.LAB, Colorspace.WORK_RGB),
}


class PipeType:
    """The reference's four pipe kinds (dev_pixelpipe.h
    DT_DEV_PIXELPIPE_*): FULL (interactive full quality), PREVIEW
    (downscaled navigator), THUMBNAIL (library mipmaps), EXPORT.
    PREVIEW/THUMBNAIL trade demosaic quality for speed exactly like the
    reference (fast PPG + early downscale)."""

    FULL = "full"
    PREVIEW = "preview"
    THUMBNAIL = "thumbnail"
    EXPORT = "export"


class Pipeline:
    """A planned (but not yet compiled) pipe for one (image, history)."""

    def __init__(self, meta: RawMeta, history: List[HistoryItem],
                 scale: float = 1.0, forms=None, order_version=None,
                 pipe_type: str = PipeType.EXPORT,
                 out_window: Optional[Tuple[int, int, int, int]] = None,
                 roi: bool = True,
                 spec_in: Optional[ImageSpec] = None):
        self.pipe_type = pipe_type
        if pipe_type in (PipeType.PREVIEW, PipeType.THUMBNAIL):
            # fast-demosaic override (the reference's preview pipes run
            # PPG/half-size demosaic regardless of the user's choice)
            history = [
                (dataclasses.replace(
                    h, params=dict(h.params or {},
                                   demosaicing_method=0))
                 if h.op == "demosaic" and isinstance(h.params,
                                                     (dict, type(None)))
                 else h)
                for h in history]
        self.meta = meta
        self.ctx = PlanContext(meta=meta, scale=scale)
        self.stages: List[PlannedOp] = []
        self.unsupported: List[str] = []
        self.forms = forms or {}  # drawn-mask forms {id: masks.Form}
        self.ctx.notes["forms"] = self.forms  # ops (spots/retouch) read these
        # ops may statically trade quality for speed on fast pipes
        # (filmic skips highlight reconstruction like the reference's
        # "fast mode" pipes)
        self.ctx.notes["pipe_type"] = pipe_type

        # spec_in override: a WINDOW of a larger frame (org/full set) —
        # the spatially sharded pipe (parallel/spatial.py) plans its
        # per-device window with piece dims intact
        spec = spec_in if spec_in is not None else ImageSpec(
            width=meta.width, height=meta.height, colorspace=Colorspace.RAW,
            channels=1,
            cfa=CFAPattern.XTRANS if meta.xtrans else meta.cfa,
        )
        self.spec_in = spec
        history = list(history)
        ops_present = {h.op for h in history}
        if scale < 1.0 - 1e-9 and "initialscale" not in ops_present:
            # downscale early: everything after the camera-RGB stage
            # runs at export resolution (doc/resizing-scaling.md)
            history.append(HistoryItem("initialscale"))
        elif abs(scale - 1.0) > 1e-9 \
                and "finalscale" not in ops_present:
            history.append(HistoryItem("finalscale"))
        for item in resolve_history(meta, history, order_version):
            if not item.enabled:
                continue
            op = ops_base.get_op(item.op)
            if op is None:
                self.unsupported.append(item.op)
                continue
            p = _resolve_params(item, meta)
            need = op.input_colorspace
            if need is not None and need is not spec.colorspace:
                if (spec.colorspace, need) in _CONVERTIBLE:
                    cplan = _CONVERT.plan_pair(spec, need)
                    self.stages.append(
                        PlannedOp("_convert", _CONVERT, cplan, None))
                    spec = cplan.spec_out
                else:
                    # colorspace contract violation -> auto-disable, like the
                    # reference's format propagation (dev_pixelpipe.c:1158)
                    self.unsupported.append(f"{item.op} (colorspace skip)")
                    continue
            plan = op.plan(self.ctx, spec, p)
            stage = PlannedOp(item.op, op, plan, p,
                              multi_priority=item.multi_priority)
            # blending (reference dt_develop_blend_process): only for
            # 3-channel, geometry-preserving stages
            if item.blend_params is not None:
                from . import blend as blend_mod

                bp = (item.blend_params
                      if isinstance(item.blend_params, blend_mod.BlendParams)
                      else blend_mod.decode_blend_params(item.blend_params))
                if (blend_mod.blend_is_active(bp)
                        and plan.spec_in.array_shape == plan.spec_out.array_shape):
                    stage.blend = bp
                    # the full blend blob keys the compile cache: mask
                    # trapezoids/opacity are baked as constants in the trace
                    blend_sig = bp.codec.encode(bp)
                    if bp.mask_mode & blend_mod.MASK_SHAPE:
                        from . import masks as masks_mod

                        stage.blend_form = self.forms.get(bp.mask_id)
                        blend_sig = (blend_sig, masks_mod.form_signature(
                            stage.blend_form, self.forms))
                    stage.blend_static = blend_sig
            self.stages.append(stage)
            spec = plan.spec_out
        self.spec_out = spec

        # Backward ROI planning (reference modify_roi_in walk,
        # dev_pixelpipe.c:564-643): find the smallest input window each
        # stage actually needs to produce the requested output (the full
        # final frame by default — a history crop still shrinks all
        # upstream work), then re-plan the windowed suffix of the pipe.
        self.windowed = False
        if roi and pipe_type not in (PipeType.PREVIEW, PipeType.THUMBNAIL):
            wins = self._backward_windows(out_window)
            if wins is not None:
                self._replan_windowed(wins)
                self.windowed = True
                self.spec_out = self.stages[-1].plan.spec_out

    # --- backward ROI -------------------------------------------------------
    def _backward_windows(self, out_window):
        """Per-stage (win_in, win_out) windows, walking the planned pipe
        backward; None if every window is the full frame (no-op)."""
        n = len(self.stages)
        if n == 0:
            return None
        so_last = self.stages[-1].plan.spec_out
        win = (tuple(out_window) if out_window is not None
               else (0, 0, so_last.height, so_last.width))
        wins = [None] * n
        any_proper = False
        for i in reversed(range(n)):
            s = self.stages[i]
            so = s.plan.spec_out
            si = s.plan.spec_in
            full_out = (0, 0, so.height, so.width)
            full_in = (0, 0, si.height, si.width)
            win_out = tuple(win)
            proper = win_out != full_out
            r = None
            use_out = win_out
            if not proper or s.blend is None:
                r = s.op.roi_in(s.plan, self.ctx, win_out)
            else:
                # blend-aware windowing: drawn masks rasterize org-aware
                # (masks.rasterize origin=), parametric masks are
                # pixel-local.  Only the side-band consumers — RASTER
                # sources and the details slider (demosaic rawdetail
                # plane) — still force the full frame (their producer
                # buffers carry a different window's geometry).  The
                # mask post-feather/blur has spatial support: grow the
                # requested window by it before asking the op.
                from . import blend as blend_mod

                bp = s.blend
                windowable = (not (bp.mask_mode & blend_mod.MASK_RASTER)
                              and abs(bp.details) <= 1e-6)
                if windowable:
                    grow = 0
                    if bp.feathering_radius > 0.1:
                        grow += max(1, int(bp.feathering_radius))
                    if bp.blur_radius > 0.1:
                        grow += int(3.0 * bp.blur_radius + 1.0)
                    y0 = max(0, win_out[0] - grow)
                    x0 = max(0, win_out[1] - grow)
                    y1 = min(so.height, win_out[0] + win_out[2] + grow)
                    x1 = min(so.width, win_out[1] + win_out[3] + grow)
                    gwin = (y0, x0, y1 - y0, x1 - x0)
                    # the stage computes the GROWN output window (the
                    # feather/blur sees its full support); the consumer
                    # slices it back down via _rewindow
                    r = s.op.roi_in(s.plan, self.ctx, gwin)
                    if r is not None:
                        use_out = gwin
            if r is None:
                # boundary: this stage computes the full frame; the
                # engine slices between it and its windowed consumer
                wins[i] = (full_in, full_out)
                win = full_in
            else:
                if tuple(r) != full_in:
                    any_proper = True
                wins[i] = (tuple(r), use_out)
                win = r
        return wins if any_proper else None

    @staticmethod
    def _window_spec(spec: ImageSpec, win) -> ImageSpec:
        y0, x0, h, w = win
        if (y0, x0, h, w) == (0, 0, spec.height, spec.width):
            return spec
        return dataclasses.replace(
            spec, width=w, height=h, pad_w=0, pad_h=0,
            org_y=spec.org_y + y0, org_x=spec.org_x + x0,
            full_h=spec.full_h or spec.height,
            full_w=spec.full_w or spec.width,
            cfa=spec.cfa.shifted(y0, x0) if spec.cfa else None)

    def _replan_windowed(self, wins):
        """Second planning pass with windowed specs (side effects like
        processed_maximum replay in order)."""
        ctx = PlanContext(meta=self.meta, scale=self.ctx.scale)
        ctx.notes.update(self.ctx.notes)
        new_stages: List[PlannedOp] = []
        for s, (win_in, win_out) in zip(self.stages, wins):
            spec_in = self._window_spec(s.plan.spec_in, win_in)
            ctx.notes["_win_out"] = win_out
            if s.name == "_convert":
                plan = _CONVERT.plan_pair(spec_in, s.plan.static[1])
            else:
                plan = s.op.plan(ctx, spec_in, s.params)
            new_stages.append(PlannedOp(
                s.name, s.op, plan, s.params, blend=s.blend,
                blend_static=s.blend_static, blend_form=s.blend_form,
                multi_priority=s.multi_priority))
        ctx.notes.pop("_win_out", None)
        self.stages = new_stages
        self.ctx = ctx

    # --- static signature for compile caching --------------------------------
    def signature(self) -> Tuple:
        sig = [self.spec_in.array_shape]
        for s in self.stages:
            si, so = s.plan.spec_in, s.plan.spec_out
            sig.append((s.name, s.multi_priority,
                        si.array_shape, so.array_shape,
                        (si.org_y, si.org_x, so.org_y, so.org_x),
                        s.plan.static, s.blend_static))
        return tuple(sig)

    def coeffs(self) -> List[Any]:
        ctx = PlanContext(meta=self.meta, scale=self.ctx.scale)
        out = []
        for s in self.stages:
            # replay planning side effects for coeff computation that
            # depends on running processed_maximum
            s.op.plan(ctx, s.plan.spec_in, s.params)
            out.append(s.op.coeffs(ctx, s.plan, s.params))
        return out

    def trace_fn(self, start: int = 0, end: Optional[int] = None,
                 segmented: bool = False):
        """Traceable run over stages[start:end].

        With segmented=True the function takes/returns an explicit
        carry (raster-mask side-band + raw-detail plane) so a very long
        history can compile as several smaller XLA programs chained on
        device — the ~60-module reference sidecars otherwise exhaust the
        XLA compiler's memory in one monolithic program.  Mask keys are
        string-encoded in the carry ((name, None) and (name, int) tuple
        keys don't sort as jit pytree dict keys)."""
        stages = self.stages
        seg_end = len(stages) if end is None else end
        ctx = self.ctx

        forms = self.forms

        # raster side-band consumers (by source name): a blended stage
        # whose mask some later stage reads must run on the spatial path
        # so its mask is materialized into the side-band
        def _raster_sources():
            from . import blend as blend_mod

            out = set()
            for s2 in stages:
                bp = s2.blend
                if bp is None or not (bp.mask_mode & blend_mod.MASK_RASTER):
                    continue
                src = bp.raster_mask_source
                if isinstance(src, bytes):
                    src = src.split(b"\0")[0].decode("utf-8", "ignore")
                src = (src or "").strip("\0")
                if src:
                    out.add(src)
            return out

        raster_consumed = _raster_sources()

        def fusable(s):
            """geometry-preserving 3-channel pointwise stage; a blend is
            allowed when it is itself per-pixel (uniform/parametric mask,
            no spatial post) and nothing downstream consumes its mask."""
            from . import blend as blend_mod

            if (s.plan.spec_in.array_shape != s.plan.spec_out.array_shape
                    or len(s.plan.spec_in.array_shape) != 3):
                return False
            if s.blend is None:
                return True
            if s.plan.spec_out.colorspace is Colorspace.RAW:
                return False
            if s.name in raster_consumed:
                return False
            cst = (blend_mod.CS_LAB
                   if s.plan.spec_out.colorspace is Colorspace.LAB
                   else blend_mod.CS_RGB_SCENE)
            return blend_mod.blend_fusable_pointwise(s.blend, cst)

        def run_fused(x, group):
            """Chain consecutive pointwise stages into ONE Pallas kernel:
            one HBM round-trip for the whole color chain (the reference
            pays one read+write per module — pixelpipe_hb.c node loop)."""
            from ..kernels.pointwise import ConstPack, pallas_pointwise

            values, order, mat_keys, list_keys = {}, [], set(), set()
            for k, (s, spec_pw, c) in enumerate(group):
                for name in spec_pw.consts:
                    key = f"{k}.{name}"
                    values[key] = c[name]
                    order.append(key)
                    if name in spec_pw.mats:
                        mat_keys.add(key)
                    if name in spec_pw.lists:
                        list_keys.add(key)
            pack = ConstPack()
            vec = pack.pack(values, order)
            with_pos = any(sp.needs_pos for (_s, sp, _c) in group)

            from ..color import matrices as cmats
            from . import blend as blend_mod

            def block_fn(block, consts_ref, yy=None, xx=None):
                for k, (s, spec_pw, _c) in enumerate(group):
                    cd = {}
                    for name in spec_pw.consts:
                        key = f"{k}.{name}"
                        if key in list_keys:
                            v = pack.get_list(consts_ref, key)
                        else:
                            v = pack.get(consts_ref, key)
                            if key in mat_keys:
                                v = [[v[3 * r + i] for i in range(3)]
                                     for r in range(3)]
                        cd[name] = v
                    if spec_pw.needs_pos:
                        out = spec_pw.fn(block, cd, yy, xx)
                    else:
                        out = spec_pw.fn(block, cd)
                    if s.blend is not None:
                        # per-pixel blend rides the same VMEM tile
                        # (fusable() admitted it): all params static
                        cst = (blend_mod.CS_LAB
                               if s.plan.spec_out.colorspace
                               is Colorspace.LAB
                               else blend_mod.CS_RGB_SCENE)
                        prm = blend_mod.prepare_parameters(s.blend)
                        out = blend_mod.apply_blend_pointwise(
                            block, out, s.blend, prm, cst, cmats.WORK_Y)
                    block = out
                return block

            # deep chains: small tile to stay under the scoped-VMEM limit
            return pallas_pointwise(block_fn, x, vec, tile_h=64, tile_w=512,
                                    with_pos=with_pos,
                                    interpret=_FORCE_FUSION_INTERPRET)

        def run(x, coeffs, carry=None):
            import jax as _jax

            from . import blend as blend_mod
            from ..color import matrices as cmats

            from ..core import conf as conf_mod

            fuse = ((_jax.default_backend() == "tpu"
                     or _FORCE_FUSION_INTERPRET)
                    and not _DISABLE_FUSION
                    and not getattr(self, "disable_fusion", False)
                    and not conf_mod.get_bool("pipe.disable_fusion"))
            # raster side-band (pixelpipe_raster_masks.c): blend masks of
            # upstream modules, keyed by (op, multi_priority); plus the
            # demosaic-stage raw-detail plane for the details slider
            raster_masks = {}
            rawdetail = None
            if carry is not None:
                enc_masks, rawdetail = carry
                for ks, v in enc_masks.items():
                    name, mp = ks.rsplit("|", 1)
                    raster_masks[(name,
                                  None if mp == "None" else int(mp))] = v
            # over ALL stages: a later segment may consume the plane
            needs_detail = any(
                s.blend is not None and abs(s.blend.details) > 1e-6
                for s in stages)
            cur_spec = (stages[start - 1].plan.spec_out if start > 0
                        else self.spec_in)
            i = start
            while i < seg_end:
                s, c = stages[i], coeffs[i - start]
                x = _rewindow(x, cur_spec, s.plan.spec_in)
                cur_spec = s.plan.spec_out
                spec_pw = (s.op.pointwise_spec(s.plan, ctx)
                           if fuse and fusable(s) else None)
                if spec_pw is not None:
                    # cap per-kernel chain length: very long fused chains
                    # (60-module sidecars) can OOM the Mosaic compiler;
                    # 0 = unlimited
                    max_stages = conf_mod.get_int(
                        "pipe.fusion_max_stages", 0)
                    group = [(s, spec_pw, c)]
                    j = i + 1
                    while j < seg_end and fusable(stages[j]) and (
                            max_stages <= 0 or len(group) < max_stages):
                        sp = stages[j].op.pointwise_spec(stages[j].plan, ctx)
                        if sp is None:
                            break
                        group.append((stages[j], sp, coeffs[j - start]))
                        j += 1
                    x = run_fused(x, group)
                    cur_spec = stages[j - 1].plan.spec_out
                    i = j
                    continue
                if s.blend is not None:
                    a_in = x
                    y = s.op.apply(x, c, s.plan, ctx)
                    prm = blend_mod.prepare_parameters(s.blend)
                    drawn = None
                    if s.blend_form is not None:
                        from . import masks as masks_mod

                        spec = s.plan.spec_out
                        # normalized shape coords refer to the FULL
                        # frame; a windowed stage rasterizes its grid
                        # at the window's origin (blend-aware ROI)
                        drawn = masks_mod.rasterize(
                            s.blend_form, forms,
                            spec.array_shape[-2], spec.array_shape[-1],
                            norm_h=spec.full_h or spec.height,
                            norm_w=spec.full_w or spec.width,
                            origin=(spec.org_y, spec.org_x))
                    if s.plan.spec_out.colorspace is Colorspace.RAW:
                        # RAW blend colorspace: drawn mask + opacity only
                        # (blendif_raw.c)
                        x = blend_mod.apply_blend_raw(a_in, y, s.blend,
                                                      drawn=drawn)
                        cur_spec = s.plan.spec_out
                        i += 1
                        continue
                    cst = (blend_mod.CS_LAB
                           if s.plan.spec_out.colorspace is Colorspace.LAB
                           else blend_mod.CS_RGB_SCENE)
                    raster = None
                    if s.blend.mask_mode & blend_mod.MASK_RASTER:
                        src = s.blend.raster_mask_source
                        if isinstance(src, bytes):
                            src = src.split(b"\0")[0].decode(
                                "utf-8", "ignore")
                        src = (src or "").strip("\0")
                        if src:
                            key = (src, s.blend.raster_mask_instance)
                            raster = raster_masks.get(
                                key, raster_masks.get((src, None)))
                            from ..core import supervisor as sup

                            sup.event(
                                "raster_mask", "read",
                                f"{src}|{s.blend.raster_mask_instance}",
                                links={"consumer": s.name})
                            if raster is None:
                                # a NAMED source that cannot be resolved
                                # is a hard error (dt_dev_get_raster_mask
                                # raster_error); an EMPTY source fills
                                # the mask (blend.c:540-543)
                                raise RuntimeError(
                                    f"stage '{s.name}': raster mask "
                                    f"source '{src}' (instance "
                                    f"{s.blend.raster_mask_instance}) "
                                    "has no mask upstream — enable a "
                                    "mask on the source module or drop "
                                    "the raster blend")
                    x, m = blend_mod.apply_blend(
                        a_in, y, s.blend, prm, cst, cmats.WORK_Y,
                        drawn=drawn, raster=raster, rawdetail=rawdetail,
                        return_mask=True)
                    from ..core import supervisor as sup

                    sup.event("raster_mask", "create",
                              f"{s.name}|{s.multi_priority}",
                              links={"stage": s.name})
                    raster_masks[(s.name, s.multi_priority)] = m
                    raster_masks.setdefault((s.name, None), m)
                else:
                    x = s.op.apply(x, c, s.plan, ctx)
                if s.name == "demosaic" and needs_detail:
                    from ..pixel import detail as detail_mod

                    wb = [max(float(v), 1e-6)
                          for v in ctx.meta.wb_coeffs[:3]]
                    rawdetail = detail_mod.rawdetail_mask(x, wb)
                i += 1
            if segmented:
                enc = {f"{k[0]}|{k[1]}": v for k, v in raster_masks.items()}
                return x, (enc, rawdetail)
            return x

        return run


_COMPILE_CACHE: Dict[Tuple, Any] = {}

# debugging escape hatch: force the per-op path even on TPU
_DISABLE_FUSION = False
# test hook: run the fused Pallas path in interpret mode on CPU
_FORCE_FUSION_INTERPRET = False


class CompiledPipe:
    def __init__(self, pipe: Pipeline):
        import time

        from ..core import conf as conf_mod
        from ..core import log as log_mod

        from ..core import supervisor as sup

        self.pipe = pipe
        sig = pipe.signature()
        sig_key = hash(sig) & 0xFFFFFFFFFFFF
        use_cache = conf_mod.get_bool("pipe.compile_cache", True)
        fn = _COMPILE_CACHE.get(sig) if use_cache else None
        if fn is not None:
            sup.event("pipe", "read", sig_key, stages=len(pipe.stages))
        if fn is None:
            sup.event("pipe", "create", sig_key, stages=len(pipe.stages))
            t0 = time.perf_counter()
            # very long histories compile as several chained XLA
            # programs — one monolithic ~60-module program exhausts the
            # XLA compiler's memory (0 = always one program).  Packing
            # is by per-op compile WEIGHT (Op.compile_weight), so known
            # compiler hogs (cacorrect, colorreconstruct) land in their
            # own segment instead of inflating a 1/N-by-count chunk.
            max_per = conf_mod.get_int("pipe.max_stages_per_jit", 12)
            n = len(pipe.stages)
            weights = [getattr(s.op, "compile_weight", 1)
                       for s in pipe.stages]
            if 0 < max_per < sum(weights):
                bounds = []
                a, acc = 0, 0
                for i, wt in enumerate(weights):
                    if acc and acc + wt > max_per:
                        bounds.append((a, i))
                        a, acc = i, 0
                    acc += wt
                bounds.append((a, n))
                seg_fns = [jax.jit(pipe.trace_fn(a, b, segmented=True))
                           for a, b in bounds]

                def fn(x, coeffs, _b=bounds, _f=seg_fns):
                    carry = ({}, None)
                    for (a, b), f in zip(_b, _f):
                        x, carry = f(x, coeffs[a:b], carry)
                    return x
            else:
                fn = jax.jit(pipe.trace_fn())
            log_mod.log("pipe", "traced pipeline",
                        stages=len(pipe.stages),
                        ms=round((time.perf_counter() - t0) * 1e3, 1))
            if use_cache:
                _COMPILE_CACHE[sig] = fn
        else:
            log_mod.log("pipe", "plan cache hit",
                        stages=len(pipe.stages))
        self._fn = fn
        self._coeffs = pipe.coeffs()

    def __call__(self, raw: np.ndarray) -> jax.Array:
        """raw: (H, W) float32 mosaic in sensor units (or padded already)."""
        spec = self.pipe.spec_in
        if raw.shape != spec.array_shape:
            raw = ops_base.pad_to(np.asarray(raw, np.float32), spec)
        return self._fn(jnp.asarray(raw), self._coeffs)

    def run_padded(self, raw_dev: jax.Array) -> jax.Array:
        return self._fn(raw_dev, self._coeffs)

    def output_array(self, raw: np.ndarray) -> np.ndarray:
        """Run and crop to the logical output size -> (3, H, W) float32."""
        y = np.asarray(self(raw))
        so = self.pipe.spec_out
        if y.ndim == 3:
            return y[:, : so.height, : so.width]
        return y[: so.height, : so.width]


def compile_pipeline(meta: RawMeta, history: List[HistoryItem],
                     scale: float = 1.0, forms=None, order_version=None,
                     pipe_type: str = PipeType.EXPORT) -> CompiledPipe:
    return CompiledPipe(Pipeline(meta, history, scale, forms=forms,
                                 order_version=order_version,
                                 pipe_type=pipe_type))
