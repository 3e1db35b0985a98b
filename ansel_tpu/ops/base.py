"""Op protocol and registry — the TPU-native counterpart of the reference's
IOP plugin vtable (`/root/reference/src/iop/iop_api.h:78-316`).

Design translation (SURVEY.md §7): instead of `process()` callbacks dispatched
by a recursive cache-walking executor, each op contributes

  * host-side **planning** (`plan`): static geometry/colorspace resolution —
    the analog of `modify_roi_out` / `output_format` / `commit_params`'
    shape-relevant half.  Runs once per (image, history) signature.
  * host-side **coefficients** (`coeffs`): numbers derived from params, fed to
    the jitted graph as *traced* arguments so slider edits never recompile —
    the analog of `commit_params`' numeric half.
  * an in-graph **apply** (pure JAX / Pallas): the analog of `process()` /
    `process_cl()`, fused by XLA with its neighbours instead of being a
    cache-boundary.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import numpy as np

from ..core.types import Colorspace, ImageSpec, RawMeta


@dataclasses.dataclass
class PlanContext:
    """Pipeline-global planning state threaded through ops, replacing the
    reference's `dt_dev_pixelpipe_iop_t` contract fields
    (src/develop/pixelpipe_hb.h:100-165)."""

    meta: RawMeta
    # export scale (finalscale target); 1.0 = full size
    scale: float = 1.0
    # per-channel theoretical maxima after each stage, the reference's
    # `processed_maximum` (pixelpipe_hb.h dsc plumbing). Host-side floats.
    processed_maximum: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    # white-balance coefficients committed by temperature, consumed by
    # highlight reconstruction and others (dsc_out.temperature.coeffs analog)
    wb_coeffs: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0)
    # extra cross-op scratch (analog of dsc side-band fields)
    notes: Dict[str, Any] = dataclasses.field(default_factory=dict)


@dataclasses.dataclass(frozen=True)
class OpPlan:
    """Static, hashable result of planning one op instance."""

    spec_in: ImageSpec
    spec_out: ImageSpec
    static: Any = None  # op-specific static config (must be hashable)
    enabled: bool = True
    # host-side payload (e.g. a LUT table) — NOT part of the compile
    # signature; anything cache-relevant must also be reflected in `static`
    aux: Any = None


class Op:
    """Base op. Subclasses set `name` and override what they need."""

    name: str = ""
    # colorspace this op's apply() expects; None = anything
    input_colorspace: Optional[Colorspace] = None
    # mandatory ops are instantiated even without a history entry
    # (reference: modules with `default_enabled`, e.g. rawprepare/demosaic)
    mandatory: bool = False
    # relative XLA-compiler memory/time cost; the engine packs at most
    # `pipe.max_stages_per_jit` units of weight into one jit program
    compile_weight: int = 1

    # --- host side ---------------------------------------------------------
    def default_params(self, meta: RawMeta):
        from ..core.params import params_class

        return params_class(self.name)()

    def enabled_by_default(self, meta: RawMeta) -> bool:
        return self.mandatory

    def plan(self, ctx: PlanContext, spec_in: ImageSpec, p) -> OpPlan:
        return OpPlan(spec_in=spec_in, spec_out=spec_in)

    def coeffs(self, ctx: PlanContext, plan: OpPlan, p):
        """-> pytree of np arrays / python floats, traced into the graph."""
        return None

    # --- device side (pure jax) --------------------------------------------
    def apply(self, x, c, plan: OpPlan, ctx: PlanContext):
        return x

    def pointwise_spec(self, plan: OpPlan, ctx: PlanContext):
        """Fusion hook: return a PointwiseSpec when this op's apply is a
        pure per-pixel function on a (3, H, W) block that is Pallas-safe
        (no captured arrays, no reshape-broadcasts).  The engine chains
        consecutive pointwise stages into ONE Pallas kernel on TPU — one
        HBM round-trip for the whole color chain instead of one per op.
        Return None (default) to opt out."""
        return None

    # --- backward ROI planning (reference modify_roi_in,
    # src/develop/dev_pixelpipe.c:564-643) ------------------------------
    # Geometry-preserving stencil support radius; None = this op has not
    # declared window support (position-dependent or global statistics),
    # which makes it a full-frame boundary in the backward ROI walk.
    window_halo: Optional[int] = None

    def roi_in(self, plan: OpPlan, ctx: PlanContext, win):
        """Which input window (y0, x0, h, w) of spec_in is needed to
        produce output window `win` of spec_out?  A full-frame request
        always passes through; for proper sub-windows the default
        supports geometry-preserving ops that are either declared
        stencils (window_halo) or position-independent pointwise stages
        (pointwise_spec without needs_pos).  Return None to demand the
        whole frame (stops the upstream shrink at this stage)."""
        si, so = plan.spec_in, plan.spec_out
        if tuple(win) == (0, 0, so.height, so.width):
            return (0, 0, si.height, si.width)
        halo = self.window_halo
        if halo is None:
            pw = self.pointwise_spec(plan, ctx)
            if pw is not None and not pw.needs_pos:
                halo = 0
        if halo is None:
            return None
        if (si.height, si.width) != (so.height, so.width):
            return None
        y0 = max(0, win[0] - halo)
        x0 = max(0, win[1] - halo)
        y1 = min(si.height, win[0] + win[2] + halo)
        x1 = min(si.width, win[1] + win[3] + halo)
        return (y0, x0, y1 - y0, x1 - x0)


@dataclasses.dataclass(frozen=True)
class PointwiseSpec:
    """consts: coeff-dict keys to pack into the kernel's SMEM vector;
    mats: subset of consts delivered as 3x3 nested scalar lists;
    fn(block, cd) -> block, where cd maps each const name to its packed
    value (scalar / stacked vector / nested matrix list)."""

    consts: tuple
    fn: Any
    mats: tuple = ()
    # subset of consts delivered as flat Python lists of traced scalars
    # (curve knot vectors: keeps Mosaic on scalar FMAs, no vector build)
    lists: tuple = ()
    # fn also takes (yy, xx) absolute pixel coords as trailing args
    needs_pos: bool = False


_OPS: Dict[str, Op] = {}


def register(op_cls):
    """Class decorator: instantiate and register an op implementation."""
    inst = op_cls()
    assert inst.name, f"{op_cls} missing name"
    _OPS[inst.name] = inst
    return op_cls


def get_op(name: str) -> Optional[Op]:
    return _OPS.get(name)


def all_ops() -> Dict[str, Op]:
    return dict(_OPS)


def full_dims(spec: ImageSpec):
    """(full_h, full_w) of the frame this spec belongs to.  Size-adaptive
    planning (wavelet scale counts etc.) must use the FULL frame dims so
    a windowed/sharded pipe plans the same algorithm as the full pipe —
    the reference's tiling passes piece dims, not tile dims
    (tiling.c:241-680 keeps self->iwidth/iheight)."""
    return (spec.full_h or spec.height, spec.full_w or spec.width)


def pad_to(img: np.ndarray, spec: ImageSpec) -> np.ndarray:
    """Edge-replicate pad a host image up to the spec's padded shape."""
    if img.ndim == 2:
        h, w = img.shape
        return np.pad(img, ((0, spec.pad_h - h), (0, spec.pad_w - w)), mode="edge")
    _, h, w = img.shape
    return np.pad(img, ((0, 0), (0, spec.pad_h - h), (0, spec.pad_w - w)), mode="edge")
