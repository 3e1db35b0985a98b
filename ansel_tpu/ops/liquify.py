"""liquify — freeform warp (move / grow / shrink brushes along paths).

Reference: `/root/reference/src/iop/liquify.c` (params :86,290-295: 100
path nodes of {header, warp, bezier ctrl}; path-to-warp interpolation
interpolate_paths :793-866 — one warp every 0.1 radii of arc length,
mix_warps :725-762; per-warp falloff = x-reparameterized cubic bezier
build_lookup_table :878-912; stamps accumulate SUBTRACTIVELY into a global
displacement map add_to_global_distortion_map :1035-1075; sampling
src = pos + map, apply_global_distortion_map :1082-1140).

TPU translation: stamping is a scatter — poison on TPU — but stamps are
additive, so the displacement field is evaluated per pixel instead:
`lax.scan` over warps accumulates d(p) = -Σ_k f_k(|p-c_k|/R_k) · S_k
(liveness-bounded, pure FMA), then one bilinear gather samples the warp.
The bezier falloff is least-squares fit host-side to a degree-8 polynomial
per warp (max fit error < 1e-3 over [0,1]) — Horner in-graph, no tables.
"""

from __future__ import annotations

import dataclasses
import struct

import numpy as np

from ..core.params import cfield, params
from .base import Op, OpPlan, PlanContext, register
from .lens import _sample_bilinear

MAX_NODES = 100
_NODE_SIZE = 76
PATH_INVALIDATED, PATH_MOVE, PATH_LINE, PATH_CURVE = 0, 1, 2, 3
WARP_LINEAR, WARP_RADIAL_GROW, WARP_RADIAL_SHRINK = 0, 1, 2
STATUS_INTERPOLATED = 2
STAMP_RELOCATION = 0.1
_INTERP_POINTS = 100


@params(op="liquify", version=1)
@dataclasses.dataclass
class LiquifyParams:
    nodes: bytes = cfield(f"raw:{MAX_NODES * _NODE_SIZE}",
                          b"\0" * (MAX_NODES * _NODE_SIZE))


@dataclasses.dataclass
class _Node:
    type: int
    prev: int
    next: int
    point: complex
    strength: complex
    radius: complex
    control1: float
    control2: float
    warp_type: int
    status: int
    ctrl1: complex
    ctrl2: complex


def decode_nodes(blob: bytes):
    out = []
    for k in range(MAX_NODES):
        rec = blob[k * _NODE_SIZE:(k + 1) * _NODE_SIZE]
        (ptype, _ntype, _sel, _hov, prev, _idx, nxt, _pad) = struct.unpack(
            "<4i3bB", rec[:20])
        (px, py, sx, sy, rx, ry, c1, c2, wtype, status) = struct.unpack(
            "<8fii", rec[20:60])
        (c1x, c1y, c2x, c2y) = struct.unpack("<4f", rec[60:76])
        out.append(_Node(ptype, prev, nxt, complex(px, py), complex(sx, sy),
                         complex(rx, ry), c1, c2, wtype, status,
                         complex(c1x, c1y), complex(c2x, c2y)))
    return out


def _bezier_points(p0, p1, p2, p3, n=_INTERP_POINTS):
    t = np.linspace(0.0, 1.0, n)
    mt = 1 - t
    return (mt**3 * p0 + 3 * mt**2 * t * p1 + 3 * mt * t**2 * p2
            + t**3 * p3)


def _mix_warps(w1: _Node, w2: _Node, pt: complex, t: float):
    """mix_warps (liquify.c:725-762) — interpolate radius/strength/controls."""
    c1 = w1.control1 * (1 - t) + w2.control1 * t
    c2 = w1.control2 * (1 - t) + w2.control2 * t
    radius = abs(w1.radius - w1.point) * (1 - t) + abs(
        w2.radius - w2.point) * t
    p1 = w1.strength - w1.point
    p2 = w2.strength - w2.point
    a1, a2 = np.angle(p1), np.angle(p2)
    invert = False
    if a1 > 0.0 and a2 < -np.pi / 2:
        invert = True
        a1, a2 = np.pi - a1, -np.pi - a2
    elif a1 < -np.pi / 2 and a2 > 0.0:
        invert = True
        a1, a2 = -np.pi - a1, np.pi - a2
    r = abs(p1) * (1 - t) + abs(p2) * t
    phi = a1 * (1 - t) + a2 * t
    if invert:
        phi = np.pi - phi
    strength = pt + r * np.exp(1j * phi)
    return _Node(0, -1, -1, pt, strength, pt + radius, c1, c2,
                 w1.warp_type, STATUS_INTERPOLATED, 0, 0)


def interpolate_paths(nodes):
    """interpolate_paths (liquify.c:793-866)."""
    warps = []
    for k, d in enumerate(nodes):
        if d.type == PATH_INVALIDATED:
            break
        if d.type == PATH_MOVE:
            if d.next == -1:
                warps.append(d)
            continue
        prev = nodes[d.prev]
        w1, w2 = prev, d
        if d.type == PATH_LINE:
            total = abs(w1.point - w2.point)
            arc = 0.0
            while arc < total:
                t = arc / total if total > 0 else 0.0
                pt = w1.point * (1 - t) + w2.point * t
                w = _mix_warps(w1, w2, pt, t)
                step = abs(w.radius - w.point) * STAMP_RELOCATION
                if step <= 1e-3:
                    break
                arc += step
                warps.append(w)
        elif d.type == PATH_CURVE:
            pts = _bezier_points(w1.point, d.ctrl1, d.ctrl2, w2.point)
            seg = np.abs(np.diff(pts))
            cum = np.concatenate([[0.0], np.cumsum(seg)])
            total = cum[-1]
            arc = 0.0
            while arc < total:
                t = arc / total if total > 0 else 0.0
                i = int(np.searchsorted(cum, arc, side="right"))
                i = min(max(i, 1), len(pts) - 1)
                tt = ((arc - cum[i - 1]) / max(cum[i] - cum[i - 1], 1e-9))
                pt = pts[i - 1] * (1 - tt) + pts[i] * tt
                w = _mix_warps(w1, w2, complex(pt), t)
                step = abs(w.radius - w.point) * STAMP_RELOCATION
                if step <= 1e-3:
                    break
                arc += step
                warps.append(w)
    return warps


def _falloff_poly(c1: float, c2: float, deg: int = 8) -> np.ndarray:
    """Least-squares polynomial of the x-reparameterized falloff bezier
    (build_lookup_table, liquify.c:878-912): f(0)=1, f(1)=0."""
    t = np.linspace(0.0, 1.0, 257)
    mt = 1 - t
    # x(t): bezier(0, c1, c2, 1); y(t): bezier(1, 1, 0, 0)
    x = 3 * mt**2 * t * c1 + 3 * mt * t**2 * c2 + t**3
    y = mt**3 + 3 * mt**2 * t
    xs = np.linspace(0.0, 1.0, 257)
    f = np.interp(xs, x, y)
    return np.polyfit(xs, f, deg)


@register
class Liquify(Op):
    name = "liquify"
    input_colorspace = None  # geometric, camera/work RGB

    def enabled_by_default(self, meta):
        return False

    def plan(self, ctx: PlanContext, spec_in, p: LiquifyParams) -> OpPlan:
        warps = interpolate_paths(decode_nodes(p.nodes))
        warps = [w for w in warps if abs(w.radius - w.point) >= 1.0]
        if not warps:
            return OpPlan(spec_in=spec_in, spec_out=spec_in, static=None)
        # static displacement bound: falloff f <= 1, |dx|/R <= 1 inside
        # the stamp, so each warp contributes at most its strength
        bound = float(sum(
            0.5 * abs(w.strength - w.point)
            * (STAMP_RELOCATION if w.status & STATUS_INTERPOLATED else 1.0)
            for w in warps)) + 2.0
        return OpPlan(spec_in=spec_in, spec_out=spec_in,
                      static=(len(warps), hash(bytes(p.nodes)),
                              round(bound, 1)))

    def coeffs(self, ctx: PlanContext, plan: OpPlan, p: LiquifyParams):
        if plan.static is None:
            return None
        warps = interpolate_paths(decode_nodes(p.nodes))
        warps = [w for w in warps if abs(w.radius - w.point) >= 1.0]
        K = len(warps)
        px = np.array([w.point.real for w in warps], np.float32)
        py = np.array([w.point.imag for w in warps], np.float32)
        R = np.array([abs(w.radius - w.point) for w in warps], np.float32)
        # 0.5 strength factor + 0.1 relocation factor for interpolated
        # stamps (build_round_stamp, liquify.c:957-962)
        s = np.array([0.5 * (w.strength - w.point)
                      * (STAMP_RELOCATION
                         if w.status & STATUS_INTERPOLATED else 1.0)
                      for w in warps], np.complex64)
        poly = np.stack([_falloff_poly(w.control1, w.control2)
                         for w in warps]).astype(np.float32)  # (K, 9)
        radial = np.array(
            [0.0 if w.warp_type == WARP_LINEAR else
             (1.0 if w.warp_type == WARP_RADIAL_GROW else -1.0)
             for w in warps], np.float32)
        return {"px": px, "py": py, "R": R, "sx": s.real.astype(np.float32),
                "sy": s.imag.astype(np.float32), "poly": poly,
                "radial": radial, "smag": np.abs(s).astype(np.float32)}

    def _dmap(self, c, yy, xx):
        """Summed displacement field of all warp stamps at (yy, xx) —
        analytic in the coordinates, so the Pallas warp's fixed-point
        inversion can evaluate it on extended grids."""
        import jax
        import jax.numpy as jnp

        shape = jnp.broadcast_shapes(jnp.shape(yy), jnp.shape(xx))

        def step(acc, w):
            dx = xx - w["px"]
            dy = yy - w["py"]
            d = jnp.sqrt(dx * dx + dy * dy) / w["R"]
            f = jnp.zeros_like(d)
            for k in range(c["poly"].shape[1]):
                f = f * d + w["poly"][k]
            f = jnp.where(d < 1.0, jnp.clip(f, 0.0, 1.0), 0.0)
            lin = jnp.stack([jnp.broadcast_to(f * w["sx"], shape),
                             jnp.broadcast_to(f * w["sy"], shape)])
            rad = jnp.stack([f * w["smag"] * dx / w["R"],
                             f * w["smag"] * dy / w["R"]]) * w["radial"]
            rad = jnp.broadcast_to(rad, (2,) + shape)
            is_rad = (w["radial"] != 0.0)
            return acc - jnp.where(is_rad, rad, lin), None

        init = jnp.zeros((2,) + shape, jnp.float32)
        dmap, _ = jax.lax.scan(step, init, c)
        return dmap

    def apply(self, x, c, plan: OpPlan, ctx: PlanContext):
        if plan.static is None:
            return x
        import jax
        import jax.numpy as jnp

        H, W = x.shape[-2:]
        bound = plan.static[2]
        if jax.default_backend() == "tpu" and bound <= 400.0:
            from ..kernels.warp_pallas import warp_model

            def coord_fn(y, xx_):
                d = self._dmap(c, y, xx_)
                return y + d[1], xx_ + d[0]

            return warp_model(x, coord_fn, bound, bound)

        xx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
        yy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
        dmap = self._dmap(c, yy, xx)
        sx = xx + dmap[0]
        sy = yy + dmap[1]
        return jnp.stack([_sample_bilinear(x[i], sy, sx)
                          for i in range(x.shape[0])])
