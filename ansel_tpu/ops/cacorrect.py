"""cacorrect — automatic chromatic-aberration correction on Bayer raws.

Reference: `/root/reference/src/iop/cacorrect.c` (RawTherapee-heritage):
per-tile R/B-vs-G shift diagnostics, a global polynomial shift model
fitted by least squares (LinEqSolve :219-300), and sub-pixel bilinear
shift compensation of the R/B mosaic sites, optionally iterated
(:323-1300).

TPU-first redesign (same behavioral goal, hardware-shaped estimator):
the reference's serial tile state machine becomes
  1. half-resolution channel planes (R, B, and G averaged at each site),
  2. per-tile displacement via one Lucas-Kanade step
     d = sum(grad_G * (C - G)) / sum(grad_G^2) on a 32x32 tile grid,
  3. weighted least-squares fit of a quadratic shift field (6 terms per
     axis per channel) solved in-graph (jnp.linalg.solve, 6x6),
  4. sub-pixel correction of the half-res R/B planes with a hat-basis
     shifted-view bilinear warp (no gathers), re-interleaved into the
     mosaic by stack+reshape.
Shifts are clamped to the reference's +-4 px diagnostic range.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core.params import cfield, params
from ..core.types import CFAPattern, Colorspace
from .base import Op, OpPlan, PlanContext, register

TILE = 32  # half-res tile for the shift diagnostics
BSLIM = 4.0


@params(op="cacorrect", version=2)
@dataclasses.dataclass
class CACorrectParams:
    avoidshift: int = cfield("i", 0)
    iterations: int = cfield("i", 1)

    @classmethod
    def from_legacy(cls, version, raw):
        if version == 1:
            # cacorrect.c:152-165: v1 payload ignored, v2 defaults
            return cls(avoidshift=0, iterations=1)
        return None


def _halfres_planes(x, cfa: CFAPattern):
    """mosaic (H, W) -> half-res (R, G_at_R, B, G_at_B), each (H/2, W/2).
    G is the 4-neighbor cross average AT the R/B sites — a diagonal
    2-green average would sit at a (0.25, 0.25) spatial offset and bias
    the shift estimator by exactly that much."""
    from ..pixel.shifts import PaddedView

    pvx = PaddedView(x, 1)
    gi = 0.25 * (pvx.at(-1, 0) + pvx.at(1, 0) + pvx.at(0, -1)
                 + pvx.at(0, 1))
    pos = {cfa.color_at(y, xx): (y, xx) for y in range(2) for xx in range(2)}

    def at(pos_yx, img):
        dy, dx = pos_yx
        return img[dy::2, :][:, dx::2]

    return (at(pos[0], x), at(pos[0], gi), at(pos[2], x), at(pos[2], gi))


def _tile_stats(G, C):
    """per-tile Lucas-Kanade displacement of C relative to G."""
    h, w = G.shape
    th, tw = h // TILE, w // TILE
    Gc = G[: th * TILE, : tw * TILE]
    Cc = C[: th * TILE, : tw * TILE]
    from ..pixel.shifts import PaddedView

    pv = PaddedView(Gc, 1)
    gx = 0.5 * (pv.at(0, 1) - pv.at(0, -1))
    gy = 0.5 * (pv.at(1, 0) - pv.at(-1, 0))
    diff = Cc - Gc

    def tsum(a):
        return a.reshape(th, TILE, tw, TILE).sum((1, 3))

    den_x = tsum(gx * gx) + 1e-9
    den_y = tsum(gy * gy) + 1e-9
    dx = jnp.clip(tsum(gx * diff) / den_x, -BSLIM, BSLIM)
    dy = jnp.clip(tsum(gy * diff) / den_y, -BSLIM, BSLIM)
    # weight by gradient energy (flat tiles carry no CA signal)
    wgt = tsum(gx * gx + gy * gy)
    return dx, dy, wgt


def _fit_quadratic(field, wgt, th, tw):
    """weighted LSQ fit shift(x, y) = a + bx + cy + dx^2 + exy + fy^2."""
    ys = (jnp.arange(th, dtype=jnp.float32) + 0.5) / th - 0.5
    xs = (jnp.arange(tw, dtype=jnp.float32) + 0.5) / tw - 0.5
    X, Y = jnp.meshgrid(xs, ys)
    basis = jnp.stack([jnp.ones_like(X), X, Y, X * X, X * Y, Y * Y])
    B = basis.reshape(6, -1)
    w = wgt.reshape(-1)
    f = field.reshape(-1)
    A = (B * w[None]) @ B.T + 1e-6 * jnp.eye(6)
    rhs = (B * w[None]) @ f
    return jnp.linalg.solve(A, rhs)


def _hat_warp(C, dy, dx, lim: float):
    """Bilinear resample of C at (y+dy, x+dx), |d| <= lim, expressed as
    a (2m+1)^2 hat-basis weighted sum of STATIC shifted views: exact
    linear interpolation (hat functions partition unity), zero gathers,
    one fused elementwise pass — both the XLA full-plane gather and the
    Pallas generic warp cost minutes of TPU compile here, this compiles
    in seconds and runs VPU-bound."""
    from ..pixel.shifts import PaddedView

    m = int(lim) + 1
    pv = PaddedView(C, m)
    wx = {k: jnp.maximum(0.0, 1.0 - jnp.abs(dx - k))
          for k in range(-m, m + 1)}
    out = 0.0
    for j in range(-m, m + 1):
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(dy - j))
        row = 0.0
        for k in range(-m, m + 1):
            row = row + wx[k] * pv.at(j, k)
        out = out + wy * row
    return out


def _eval_quadratic(coef, h, w):
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h - 0.5
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w - 0.5
    X, Y = jnp.meshgrid(xs, ys)
    return (coef[0] + coef[1] * X + coef[2] * Y + coef[3] * X * X
            + coef[4] * X * Y + coef[5] * Y * Y)


@register
class CACorrect(Op):
    name = "cacorrect"
    compile_weight = 2
    input_colorspace = Colorspace.RAW

    def enabled_by_default(self, meta):
        return False

    def plan(self, ctx: PlanContext, spec_in, p: CACorrectParams) -> OpPlan:
        bayer = spec_in.cfa is not CFAPattern.XTRANS and spec_in.channels == 1
        return OpPlan(spec_in=spec_in, spec_out=spec_in,
                      static=(bool(bayer), max(int(p.iterations), 1)))

    def apply(self, x, c, plan: OpPlan, ctx: PlanContext):
        bayer, iterations = plan.static
        if not bayer:
            return x
        cfa = plan.spec_in.cfa
        out = x
        for _ in range(iterations):
            R, G_r, B, G_b = _halfres_planes(out, cfa)
            h, w = R.shape
            th, tw = h // TILE, w // TILE
            if th < 3 or tw < 3:
                return out
            coefs = {}
            for color, C, G in ((0, R, G_r), (2, B, G_b)):
                dx_t, dy_t, wgt = _tile_stats(G, C)
                # d estimates MINUS the physical shift (C(x) = G(x-s)
                # => C-G ~ -s*gradG => d = -s); resample C at x - d
                coefs[color] = (_fit_quadratic(dy_t, wgt, th, tw),
                                _fit_quadratic(dx_t, wgt, th, tw))

            corrected = {}
            for color, C in ((0, R), (2, B)):
                cy_, cx_ = coefs[color]
                sx = jnp.clip(_eval_quadratic(cx_, h, w), -BSLIM, BSLIM)
                sy = jnp.clip(_eval_quadratic(cy_, h, w), -BSLIM, BSLIM)
                corrected[color] = _hat_warp(C, -sy, -sx, BSLIM)

            # re-interleave via stack+reshape (2D strided scatter is a
            # 5x-slower lowering — CLAUDE.md rules)
            planes = {}
            for py in range(2):
                for px in range(2):
                    color = cfa.color_at(py, px)
                    planes[(py, px)] = (
                        corrected[color] if color in corrected
                        else out[py::2, :][:, px::2])
            row0 = jnp.stack([planes[(0, 0)], planes[(0, 1)]],
                             axis=-1).reshape(h, 2 * w)
            row1 = jnp.stack([planes[(1, 0)], planes[(1, 1)]],
                             axis=-1).reshape(h, 2 * w)
            out = jnp.stack([row0, row1], axis=1).reshape(2 * h, 2 * w)
        return out
