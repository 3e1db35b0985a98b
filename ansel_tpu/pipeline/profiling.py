"""Per-stage timing + NaN-scan debug runners — the `-d perf` / `-d nan`
analogs.

Reference: per-module perf lines `pixelpipe_hb.c:727-756` (dt_show_times
around each node dispatch) and the `-d nan` post-module NaN/Inf scan
`pixelpipe_hb.c:759-831` (counts NaNs/Infs + min/max per module, prints
one line per offender).

The production path compiles ONE fused graph, so stage boundaries don't
exist at runtime; these runners trade that fusion away on purpose: each
planned stage is jitted separately and executed in sequence with a device
sync per stage.  Numbers are therefore upper bounds (per-stage HBM round
trips the fused graph doesn't pay) — still the right tool for finding the
hot or broken module.
"""

from __future__ import annotations

import dataclasses
import time
from typing import List, Optional

import numpy as np

from ..core.types import Colorspace
from ..ops import base as ops_base
from . import engine as engine_mod


@dataclasses.dataclass
class StageReport:
    name: str
    ms: float
    shape: tuple
    nan: int = 0
    inf: int = 0
    vmin: float = 0.0
    vmax: float = 0.0

    def line(self) -> str:
        s = f"[perf] {self.name:<18} {self.ms:8.2f} ms  {self.shape}"
        if self.nan or self.inf:
            s += f"  !! NaN={self.nan} Inf={self.inf}"
        return s


def _sync(arr) -> np.ndarray:
    """Force device completion (block_until_ready is unreliable over the
    axon relay; a tiny readback is the documented sync).  Slice ON DEVICE
    first — np.asarray(full) would ship the whole buffer through the
    ~1-35 MB/s tunnel and time the transfer, not the kernel."""
    tiny = arr[(slice(0, 1),) * (arr.ndim - 1) + (slice(0, 8),)]
    return np.asarray(tiny)


def run_stages(pipe: engine_mod.Pipeline, raw: np.ndarray,
               nan_scan: bool = False, repeats: int = 1,
               verbose: bool = True) -> List[StageReport]:
    """Execute one stage at a time; -> per-stage timings (+ NaN stats)."""
    import jax
    import jax.numpy as jnp

    ctx = pipe.ctx
    coeffs = pipe.coeffs()
    x = jnp.asarray(ops_base.pad_to(np.asarray(raw, np.float32),
                                    pipe.spec_in))
    def stage_fn(s):
        """One stage incl. its blend, mirroring engine.trace_fn's per-op
        branch (pipeline/engine.py run())."""
        from ..color import matrices as cmats
        from . import blend as blend_mod

        def f(xx, cc):
            if s.blend is None:
                return s.op.apply(xx, cc, s.plan, ctx)
            y = s.op.apply(xx, cc, s.plan, ctx)
            cst = (blend_mod.CS_LAB
                   if s.plan.spec_out.colorspace is Colorspace.LAB
                   else blend_mod.CS_RGB_SCENE)
            prm = blend_mod.prepare_parameters(s.blend)
            drawn = None
            if s.blend_form is not None:
                from . import masks as masks_mod

                spec = s.plan.spec_out
                drawn = masks_mod.rasterize(
                    s.blend_form, pipe.forms,
                    spec.array_shape[-2], spec.array_shape[-1],
                    norm_h=spec.height, norm_w=spec.width)
            return blend_mod.apply_blend(xx, y, s.blend, prm, cst,
                                         cmats.WORK_Y, drawn=drawn)
        return f

    reports: List[StageReport] = []
    for s, c in zip(pipe.stages, coeffs):
        fn = jax.jit(stage_fn(s))
        # pin coeffs on device first: the production path ships them
        # once, and re-shipping a big aux (e.g. the watermark overlay)
        # through the ~1-35 MB/s tunnel would time the transfer
        c = jax.device_put(c)
        y = fn(x, c)
        _sync(y)  # warm-up compile
        t0 = time.perf_counter()
        for _ in range(repeats):
            y = fn(x, c)
        _sync(y)
        ms = (time.perf_counter() - t0) / repeats * 1000.0
        rep = StageReport(s.name, ms, tuple(y.shape))
        if nan_scan:
            # reduce on device; read back 4 scalars (not the buffer)
            stats = jax.jit(lambda a: (
                jnp.isnan(a).sum(), jnp.isinf(a).sum(),
                jnp.nanmin(jnp.where(jnp.isinf(a), jnp.nan, a)),
                jnp.nanmax(jnp.where(jnp.isinf(a), jnp.nan, a))))(y)
            rep.nan = int(stats[0])
            rep.inf = int(stats[1])
            rep.vmin, rep.vmax = float(stats[2]), float(stats[3])
        reports.append(rep)
        if verbose:
            print(rep.line())
        x = y
    if verbose:
        total = sum(r.ms for r in reports)
        print(f"[perf] {'TOTAL (stage-split)':<18} {total:8.2f} ms")
    return reports


def nan_report(reports: List[StageReport]) -> Optional[str]:
    """First offending stage, or None if the pipe is clean."""
    for r in reports:
        if r.nan or r.inf:
            return (f"{r.name}: {r.nan} NaN / {r.inf} Inf "
                    f"(finite range [{r.vmin:g}, {r.vmax:g}])")
    return None
