"""Spatial (single-image) sharding: shard_map over row shards with an
explicit ICI halo exchange — the blueprint's mapping of the reference's
tiling engine (SURVEY §5.7: `/root/reference/src/develop/tiling.c:241-680`
computes per-module overlap and processes overlapping tiles; here the
overlap rides `jax.lax.ppermute` between neighbor devices and the whole
per-device body — Pallas kernels included — is the single-chip program).

Design (exactness by construction — the "shifted window" scheme):

  * The image rows are split into n equal shards of Hs rows.  Every
    device traces ONE program over a window of Hs + 2*halo REAL image
    rows; boundary devices don't pad — their window SHIFTS inward
    (device 0 takes rows [0, Hs+2h), device n-1 takes the last Hs+2h
    rows), and the per-device output crop offset (0 / h / 2h, selected
    by `axis_index`) compensates.  Consequences:
      - at TRUE image edges the ops apply their own boundary handling
        on the true edge rows — identical to the single-device run;
      - at interior cut edges the window-edge padding corrupts only
        rows inside the halo, which the crop discards.  The halo is
        the pipe's own backward-ROI growth (engine._backward_windows,
        the reference modify_roi_in walk), so the kept center is
        bit-identical to the single-device program's values modulo
        XLA scheduling.
  * One ppermute pair total (each device sends its top and bottom
    2*halo rows to its neighbors), not one per stage: the backward-ROI
    walk already compounds every stage's support.
  * CFA phase: window starts are kept congruent mod the pattern period
    (2 for Bayer, 6 for X-Trans) so the one traced program sees the
    same mosaic phase on every device.

Not spatially shardable (ValueError): pipes where the backward-ROI walk
hits a full-frame stage (global ops), geometry-changing pipes
(crop/flip/rawprepare sensor crop), drawn-mask blends (forms rasterize
org-aware with static origins), and raster side-band consumers.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.types import RawMeta
from ..ops import base as ops_base
from ..pipeline.engine import HistoryItem, Pipeline


def _cfa_period(meta: RawMeta) -> int:
    return 6 if meta.xtrans else 2


def required_halo(meta: RawMeta, history: List[HistoryItem],
                  shard_h: int) -> int:
    """Row halo one shard needs, from the pipe's own backward-ROI walk
    (an interior output strip of shard_h rows -> input window growth).
    Raises ValueError when the pipe cannot be row-sharded."""
    probe = Pipeline(meta, history, roi=False)
    if probe.unsupported:
        raise ValueError(f"unsupported ops: {probe.unsupported}")
    si, so = probe.spec_in, probe.spec_out
    if (si.height, si.width) != (so.height, so.width):
        raise ValueError(
            "spatial sharding needs a size-preserving pipe "
            f"(in {si.height}x{si.width} vs out {so.height}x{so.width})")
    for s in probe.stages:
        bp = s.blend
        if bp is not None and s.blend_form is not None:
            raise ValueError(
                f"stage '{s.name}' blends with a drawn mask "
                "(org-aware raster) — not row-shardable")
    H, W = so.height, so.width
    y0 = max((H // 2 // shard_h) * shard_h, shard_h)
    if y0 + shard_h > H:
        raise ValueError(f"shard_h {shard_h} too large for height {H}")
    wins = probe._backward_windows((y0, 0, shard_h, W))
    if wins is None:
        return 0
    win_in, _ = wins[0]
    iy0, _ix0, ih, _iw = win_in
    if (iy0, ih) == (0, probe.spec_in.height) and ih > 3 * shard_h:
        # the walk hit a full-frame stage: name it for the error
        culprit = None
        win = (y0, 0, shard_h, W)
        for s in reversed(probe.stages):
            r = s.op.roi_in(s.plan, probe.ctx, win)
            if r is None:
                culprit = s.name
                break
            win = r
        raise ValueError(
            f"stage '{culprit or '?'}' demands the full frame — "
            "not row-shardable (use the GSPMD spatial_sharded_pipe)")
    top = y0 - iy0
    bottom = (iy0 + ih) - (y0 + shard_h)
    return max(top, bottom, 0)


class SpatialPipeline:
    """Single-image pipe, rows sharded over the mesh axis, full
    single-chip per-device body (Pallas kernels included) with one
    ppermute halo exchange.  The VPU-bound configs' latency scaler:
    n devices -> ~n-fold fewer rows per device for the stencil-dominated
    stages (SURVEY §2.9 memory-bounded tiling / §5.7)."""

    def __init__(self, meta: RawMeta, history: List[HistoryItem],
                 mesh: Mesh, axis: str = "sp", halo: int | None = None):
        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map

        self.mesh = mesh
        self.axis = axis
        n = mesh.shape[axis]
        self.n = n
        H, W = meta.height, meta.width
        per = _cfa_period(meta)
        if H % (n * per):
            raise ValueError(
                f"height {H} must divide into {n} shards of a multiple "
                f"of the CFA period {per} rows (pad the input first)")
        Hs = H // n
        self.shard_h = Hs

        h = required_halo(meta, history, Hs) if halo is None else halo
        h = -(-h // per) * per  # CFA-phase-aligned halo
        # the window must have NO physical pad rows (pad_h == height):
        # edge-replicated pad rows carry the WRONG CFA parity (a copy of
        # an odd row sitting at an even position), which poisons
        # plane-split stages near the bottom of every shard — the
        # single-device run at an 8-aligned height has no pad rows to
        # poison.  Bump the halo until Hs + 2h is sublane-aligned.
        for _ in range(5):
            if (Hs + 2 * h) % 8 == 0:
                break
            h += per
        else:
            raise ValueError(
                f"cannot sublane-align the window: shard height {Hs} "
                f"mod 8 unreachable with CFA period {per} halo steps — "
                "pad the image to a shard height that is a multiple of "
                f"{4 if per == 2 else 12}")
        if 2 * h > Hs:
            raise ValueError(
                f"halo {h} needs more than half a shard ({Hs} rows); "
                "use fewer devices or the GSPMD path")
        self.halo = h

        # ONE program for every device: a window of Hs + 2h real rows.
        # The spec is a true WINDOW (org at a representative interior
        # shard, full dims = the frame) so size-adaptive planning
        # (wavelet scale counts) matches the full pipe; position-
        # dependent ops are excluded by required_halo.  org ≡ 0 mod the
        # CFA period keeps the mosaic phase.
        from ..core.types import CFAPattern, Colorspace, ImageSpec

        org = Hs - h if n > 1 else 0       # shard 1's window origin
        wspec = ImageSpec(
            width=W, height=Hs + 2 * h, colorspace=Colorspace.RAW,
            channels=1,
            cfa=CFAPattern.XTRANS if meta.xtrans else meta.cfa,
            org_y=org, full_h=H, full_w=W)
        self.pipe = Pipeline(meta, history, roi=False, spec_in=wspec)
        # ops with global statistics (denoiseprofile's per-scale
        # variance) reconstruct the exact full-frame value via a masked
        # psum over the mesh axis — geometry published plan-side
        self.pipe.ctx.notes["shard_geom"] = dict(
            axis=axis, n=n, Hs=Hs, halo=h, H=H, Hw=Hs + 2 * h)
        self._coeffs = self.pipe.coeffs()
        spec_in = self.pipe.spec_in
        spec_out = self.pipe.spec_out
        run = self.pipe.trace_fn()

        import inspect

        kw = {}
        sig = inspect.signature(shard_map).parameters
        if "check_vma" in sig:           # pallas bodies: no VMA metadata
            kw["check_vma"] = False
        elif "check_rep" in sig:
            kw["check_rep"] = False

        Hw = Hs + 2 * h
        out3 = len(spec_out.array_shape) == 3

        def body(x, coeffs):             # x: (Hs, W) this device's rows
            i = jax.lax.axis_index(axis)
            if h > 0:
                up = [(k, k + 1) for k in range(n - 1)]
                dn = [(k, k - 1) for k in range(1, n)]
                from_prev = jax.lax.ppermute(x[-2 * h:, :], axis, up)
                from_next = jax.lax.ppermute(x[:2 * h, :], axis, dn)
                buf = jnp.concatenate([from_prev, x, from_next], axis=0)
                # buf covers image rows [i*Hs - 2h, (i+1)*Hs + 2h)
                start = jnp.clip(i * Hs - h, 0, H - Hw)  # window origin
                woff = start - (i * Hs - 2 * h)          # 2h / h / 0
                win = jax.lax.dynamic_slice_in_dim(buf, woff, Hw, axis=0)
            else:
                start = i * Hs
                win = x
            # pad to the window spec (edge, like ops_base.pad_to)
            ph = spec_in.pad_h - Hw
            pw = spec_in.pad_w - W
            if ph or pw:
                win = jnp.pad(win, ((0, ph), (0, pw)), mode="edge")
            y = run(win, coeffs)
            y = y[..., :Hw, :spec_out.width]
            if h > 0:
                keep = i * Hs - start                    # 0 / h / 2h
                y = jax.lax.dynamic_slice_in_dim(y, keep, Hs, axis=-2)
            return y

        self._fn = jax.jit(shard_map(
            body, mesh=mesh,
            in_specs=(P(axis, None), P()),
            out_specs=P(None, axis, None) if out3 else P(axis, None),
            **kw))
        self._in_sharding = NamedSharding(mesh, P(axis, None))

    def __call__(self, raw: np.ndarray) -> jax.Array:
        """raw: (H, W) mosaic in sensor units -> (C, H, W) output."""
        H = self.n * self.shard_h
        assert raw.shape[0] == H, (raw.shape, H)
        dev = jax.device_put(jnp.asarray(raw), self._in_sharding)
        return self._fn(dev, self._coeffs)
