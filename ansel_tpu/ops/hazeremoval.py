"""hazeremoval — dark-channel-prior dehazing (He et al.).

Reference: `/root/reference/src/iop/hazeremoval.c` — params v1 (:91-95),
dark_channel (:313-331), transition_map (:335-354), ambient_light
(:415-484: ambient color = mean of the brightest 5% among the haziest 5%,
image depth from the critical haze level), process (:492-620: transition
map refined by box-min + guided filter, then out = (in - A0)/t + A0).

TPU-first notes: the reference's quickselect quantiles become a single
sort + traced-index gathers (everything stays on device, one jit graph);
windowed min/max are separable `lax.reduce_window` passes.  Runs
pre-colorin on camera RGB like the reference (iop order 14.0).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core.params import cfield, params
from ..pixel.guided import guided_filter
from .base import Op, OpPlan, PlanContext, register

W1 = 6  # dark-channel / transition-map window
W2 = 9  # guided-filter window
EPS = 0.025  # guided-filter regularization (variance units)


def _window_reduce_shifts(x, radius, fn):
    """Separable (2r+1)^2 running min/max as fused shifted selects —
    XLA's reduce_window on a single-channel TPU plane pays the 128-lane
    im2col pad (CLAUDE.md single-channel-conv rule)."""
    from ..pixel.shifts import PaddedView

    def axis_pass(v, axis):
        pv = PaddedView(v, radius)
        out = v
        for d in range(1, radius + 1):
            if axis == 0:
                out = fn(out, fn(pv.at(-d, 0), pv.at(d, 0)))
            else:
                out = fn(out, fn(pv.at(0, -d), pv.at(0, d)))
        return out

    return axis_pass(axis_pass(x, 0), 1)


def _window_reduce(x, radius, fn, init):
    """Separable (2r+1)^2 running min/max over the last two dims."""
    if x.ndim == 2 and radius <= 16:
        sel = jnp.minimum if init == jnp.inf else jnp.maximum
        return _window_reduce_shifts(x, radius, sel)
    win = 2 * radius + 1
    y = jax.lax.reduce_window(x, init, fn, (win, 1), (1, 1), "SAME")
    return jax.lax.reduce_window(y, init, fn, (1, win), (1, 1), "SAME")


def box_min(x, radius):
    return _window_reduce(x, radius, jax.lax.min, jnp.inf)


def box_max(x, radius):
    return _window_reduce(x, radius, jax.lax.max, -jnp.inf)


def _bisect_quantile(v, target_count, lo, hi, mask=None, iters: int = 18):
    """Smallest t in [lo, hi] with count(v <= t [and mask]) >= target:
    the quantile the reference extracts by partial sort
    (hazeremoval.c:415-484 quickselect).  A 24MP `jnp.sort` costs
    ~70 ms/plane on TPU; 18 bisection rounds of a counting reduction
    are ~2 ms and converge to range/2^18 — far below the estimator's
    own noise (it feeds a mean over thousands of pixels)."""

    def body(_, ab):
        a, b = ab
        m = 0.5 * (a + b)
        le = v <= m
        if mask is not None:
            le = le & mask
        cnt = jnp.sum(le)
        hit = cnt >= target_count
        return (jnp.where(hit, a, m), jnp.where(hit, m, b))

    _, b = jax.lax.fori_loop(0, iters, body,
                             (lo * 1.0, hi * 1.0))
    return b


@params(op="hazeremoval", version=1)
@dataclasses.dataclass
class HazeRemovalParams:
    strength: float = cfield("f", 0.2)
    distance: float = cfield("f", 0.2)


@register
class HazeRemoval(Op):
    name = "hazeremoval"
    input_colorspace = None  # camera RGB, pre-colorin

    def coeffs(self, ctx: PlanContext, plan: OpPlan, p: HazeRemovalParams):
        return {"strength": jnp.float32(p.strength),
                "distance": jnp.float32(p.distance)}

    def apply(self, x, c, plan: OpPlan, ctx: PlanContext):
        H, W = x.shape[-2:]
        size = H * W
        dark = box_min(jnp.min(x, axis=0), W1)

        # ambient light A0 (hazeremoval.c:415-484) — quantiles by value
        # bisection instead of full sorts (see _bisect_quantile)
        crit_haze = _bisect_quantile(dark, size * 0.95 + 1.0,
                                     jnp.min(dark), jnp.max(dark))
        hazy = dark >= crit_haze
        n_hazy = jnp.sum(hazy)
        sums = x[0] + x[1] + x[2]
        # bright quantile among the hazy subset
        crit_bright = _bisect_quantile(
            sums, n_hazy.astype(jnp.float32) * 0.95 + 1.0,
            jnp.min(sums), jnp.max(sums), mask=hazy)
        sel = hazy & (sums >= crit_bright)
        n_sel = jnp.maximum(jnp.sum(sel), 1)
        A0 = jnp.stack([jnp.sum(jnp.where(sel, x[i], 0.0)) / n_sel
                        for i in range(3)])
        distance_max = jnp.where(crit_haze > 0,
                                 -1.125 * jnp.log(jnp.maximum(crit_haze,
                                                              1e-30)),
                                 44.0)  # ~log(FLT_MAX)/2

        # transition map (hazeremoval.c:335-354) + refinement (:588-604)
        safe_A0 = jnp.maximum(A0, 1e-6)
        ratio = jnp.min(jnp.stack([x[i] / safe_A0[i] for i in range(3)]),
                        axis=0)
        trans = box_max(1.0 - ratio * c["strength"], W1)
        trans = box_min(trans, W1)
        trans = guided_filter(jnp.mean(x, axis=0), trans, W2, EPS)

        t_min = jnp.clip(jnp.exp(-c["distance"] * distance_max),
                         1.0 / 1024.0, 1.0)
        t = jnp.maximum(trans, t_min)
        return jnp.stack([(x[i] - A0[i]) / t + A0[i] for i in range(3)])
