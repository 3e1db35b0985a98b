"""crystgrain — physically-inspired silver-halide crystal grain.

Reference: `/root/reference/src/iop/crystgrain.c` (params v1 :56-66;
crystal polygon coverage _crystal_coverage :301-314; per-layer kernel
banks _pick_layer_kernel/_build_layer_kernel_bank :401-524; flat-field
capture prediction + exposure normalization :536-592; sequential
per-layer seed/splat/deplete simulation _simulate_channel :612-706 and
the blue/green/red sub-stack color path _simulate_color :721-800).

TPU redesign (documented deviation): the reference's in-layer simulation
is order-dependent (each seed reads a remaining-light field already
depleted by earlier seeds in raster order).  Here each layer runs as a
MEAN-FIELD parallel update: all Bernoulli seeds of a layer print
simultaneously via dense masked crystal convolutions (shifted adds; no
gathers), and the total deposit is capped by the pre-layer remaining
field.  Crystal banks, seed probabilities, capture prediction and the
exposure normalization follow the reference math exactly; the RNG is
JAX's threefry instead of splitmix64, so grain realizations differ
per-seed but share the same statistics.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..core.params import cfield, params
from ..core.types import Colorspace
from .base import Op, OpPlan, PlanContext, register

MODE_MONO = 0
MODE_COLOR = 1
LAYER_KERNELS = 4
R_CAP = 15  # static footprint cap (grain_size ~<= 10 fully faithful)


@params(op="crystgrain", version=1)
@dataclasses.dataclass
class CrystGrainParams:
    mode: int = cfield("i", MODE_MONO)
    filling: float = cfield("f", 25.0)
    grain_size: float = cfield("f", 4.0)
    layers: int = cfield("i", 30)
    size_stddev: float = cfield("f", 0.25)
    layer_capture: float = cfield("f", 0.0)
    channel_correlation: float = cfield("f", 67.0)
    colorspace_saturation: float = cfield("f", 67.0)


    @classmethod
    def from_legacy(cls, version, raw):
        # crystgrain.c: versions 1/8/9 share the layout (legacy_params
        # is an identity copy); this module is registered v1 here
        if version in (8, 9):
            return cls.codec.decode(raw)
        return None


def _coverage_patch(radius_f, vertices, rotation, r):
    """Dense (2r+1, 2r+1) partial-coverage footprint
    (_crystal_coverage: regular-polygon signed distance + 0.5)."""
    dy, dx = np.mgrid[-r:r + 1, -r:r + 1]
    local_r = np.hypot(dx, dy)
    theta = np.arctan2(dy, dx)
    env = np.cos(np.pi / vertices) / np.cos(
        (2.0 * np.arcsin(np.cos(vertices * (theta + rotation))) + np.pi)
        / (2.0 * vertices))
    return np.clip(radius_f * env - local_r + 0.5, 0.0, 1.0)


def _seed_probability(filling, area):
    """filling% of the layer surface covered on average: p = f / A."""
    return float(np.clip(filling * 0.01 / max(area, 1e-6), 0.0, 1.0))


def build_banks(p: CrystGrainParams, kernel_scale: float, rng_seed: int):
    """Host-side layer kernel banks -> dict with per-kernel patches (each
    at its own static radius — grain graphs scale with actual crystal
    size, not the worst case) + the predicted stack exposure (the
    reference's flat-field recurrence).  Deterministic in (params, scale),
    so plan() and coeffs() reconstruct identical banks."""
    rng = np.random.default_rng(rng_seed)
    mean_size = max(p.grain_size * kernel_scale, 1.0)
    max_size = max(3.0 * mean_size, 1.0)

    layers = max(int(p.layers), 1)
    patches = [[None] * LAYER_KERNELS for _ in range(layers)]
    radii = np.zeros((layers, LAYER_KERNELS), np.int32)
    areas = np.zeros((layers, LAYER_KERNELS), np.float32)
    probs = np.zeros((layers, LAYER_KERNELS), np.float32)
    for li in range(layers):
        for k in range(LAYER_KERNELS):
            vertices = float(np.clip(6.0 + 1.5 * rng.standard_normal(),
                                     3.0, 10.0))
            rotation = 2.0 * np.pi * rng.random()
            size = float(np.clip(
                np.exp(np.log(mean_size)
                       + p.size_stddev * rng.standard_normal()),
                1.0, max_size))
            radius_f = max(0.5 * (size - 1.0), 0.5)
            r = int(min(math.ceil(radius_f + 0.5), R_CAP))
            patch = _coverage_patch(radius_f, vertices, rotation, r)
            area = float(patch.sum())
            patches[li][k] = patch
            radii[li, k] = r
            areas[li, k] = max(area, 1e-6)
            probs[li, k] = _seed_probability(p.filling, area)

    # layer capture normalization (crystgrain.c:1386 current_surface form)
    current_surface = float(areas.mean())
    layer_scale = p.layer_capture / max(float(layers), 1.0) \
        / max(current_surface, 1e-12)

    # flat-field remaining-light recurrence -> exposure compensation
    remaining = 1.0
    for li in range(layers):
        cap = 0.0
        for k in range(LAYER_KERNELS):
            a = areas[li, k]
            cap += probs[li, k] * a * min(remaining, a * layer_scale)
        remaining = max(remaining - cap / LAYER_KERNELS, 0.0)
    transmitted = 1.0 - remaining
    exposure = 1.0 / transmitted if transmitted > 1e-7 else 1.0

    return dict(patches=patches, radii=radii, areas=areas, probs=probs,
                layer_scale=np.float32(layer_scale),
                exposure=np.float32(exposure))


def _conv_patch(field, patch, r):
    """Dense stencil sum via shifted views; patch weights are traced."""
    from ..pixel.shifts import PaddedView

    pv = PaddedView(field, r)
    out = None
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            t = patch[dy + r, dx + r] * pv.at(dy, dx)
            out = t if out is None else out + t
    return out


def simulate_field(image, banks, key, radii, corr_shared=None):
    """One grain stack over a scalar light field (H, W) -> printed field.
    radii: static per-(layer, kernel) footprint radii.  corr_shared:
    optional shared-geometry seed state for the color path."""
    patches = banks["patches"]
    areas = jnp.asarray(banks["areas"])
    probs = jnp.asarray(banks["probs"])
    layer_scale = banks["layer_scale"]
    layers = len(patches)

    result = jnp.zeros_like(image)
    remaining = image
    keys = jax.random.split(key, layers)
    for li in range(layers):
        ku, kk = jax.random.split(keys[li])
        if corr_shared is not None:
            shared_u, shared_k, corr, kc = corr_shared
            mix = jax.random.uniform(kc[li], image.shape)
            u = jnp.where(mix < corr, shared_u[li],
                          jax.random.uniform(ku, image.shape))
            kidx = jnp.where(mix < corr, shared_k[li],
                             jax.random.randint(kk, image.shape, 0,
                                                LAYER_KERNELS))
        else:
            u = jax.random.uniform(ku, image.shape)
            kidx = jax.random.randint(kk, image.shape, 0, LAYER_KERNELS)

        deposit = jnp.zeros_like(image)
        for k in range(LAYER_KERNELS):
            r = int(radii[li][k])
            seeds = (kidx == k) & (u < probs[li, k]) & (remaining > 0.0)
            seeds_f = seeds.astype(image.dtype)
            patch = jnp.asarray(patches[li][k])
            inv_a = 1.0 / areas[li, k]
            # flat crystal tone: average of remaining and of the input
            # over the footprint, capped by the layer capacity
            avg_rem = _conv_patch(remaining, patch, r) * inv_a
            avg_img = _conv_patch(image, patch, r) * layer_scale
            tone = jnp.minimum(avg_rem, avg_img)
            tone = jnp.maximum(tone, 0.0) * seeds_f
            # splat back over the footprint (correlation = flipped conv)
            deposit = deposit + _conv_patch(tone, patch[::-1, ::-1], r)
            del r
        # mean-field cap: total layer deposit cannot exceed the
        # remaining light (replaces the reference's in-layer sequential
        # depletion)
        actual = jnp.minimum(deposit, remaining)
        result = result + actual
        remaining = jnp.maximum(remaining - actual, 0.0)
    return result


@register
class CrystGrain(Op):
    name = "crystgrain"
    input_colorspace = Colorspace.WORK_RGB

    def enabled_by_default(self, meta):
        return False

    def plan(self, ctx: PlanContext, spec_in, p) -> OpPlan:
        if p.layers <= 0 or p.filling <= 0.0:
            return OpPlan(spec_in=spec_in, spec_out=spec_in, static=None)
        kernel_scale = max(1.0 / max(ctx.scale, 1e-6), 1e-6)
        banks = build_banks(p, kernel_scale, rng_seed=0x5EED)
        radii = tuple(tuple(int(v) for v in row) for row in banks["radii"])
        return OpPlan(spec_in=spec_in, spec_out=spec_in,
                      static=(p.mode, int(p.layers), radii,
                              round(p.filling, 4), round(p.grain_size, 4),
                              round(p.size_stddev, 4),
                              round(p.layer_capture, 4),
                              round(p.channel_correlation, 4)))

    def coeffs(self, ctx: PlanContext, plan: OpPlan, p):
        if plan.static is None:
            return None
        kernel_scale = max(1.0 / max(ctx.scale, 1e-6), 1e-6)
        banks = build_banks(p, kernel_scale, rng_seed=0x5EED)
        del banks["radii"]  # static (in plan); keep coeffs traced-only
        banks["corr"] = np.float32(
            np.clip(p.channel_correlation * 0.01, 0.0, 1.0))
        return banks

    def apply(self, x, c, plan: OpPlan, ctx: PlanContext):
        if plan.static is None:
            return x
        mode, _, radii = plan.static[:3]
        key = jax.random.PRNGKey(0x5EED)
        if mode == MODE_MONO:
            from ..color import matrices as cm

            w = jnp.asarray(cm.WORK_Y, x.dtype).reshape(3, 1, 1)
            lum = jnp.sum(x * w, axis=0)
            printed = simulate_field(lum, c, key, radii) * c["exposure"]
            ratio = printed / jnp.maximum(lum, 1e-9)
            return x * ratio[None]
        # color: shared geometry + per-channel decorrelation
        layers = len(c["patches"])
        kshared, kc0, *chan_keys = jax.random.split(key, 5)
        su_keys = jax.random.split(kshared, layers)
        shared_u = jnp.stack([jax.random.uniform(ku, x.shape[1:])
                              for ku in su_keys])
        sk_keys = jax.random.split(kc0, layers)
        shared_k = jnp.stack([jax.random.randint(kk, x.shape[1:], 0,
                                                 LAYER_KERNELS)
                              for kk in sk_keys])
        out = []
        for ch in range(3):
            kc = jax.random.split(chan_keys[ch], layers)
            printed = simulate_field(
                x[ch], c, chan_keys[ch], radii,
                corr_shared=(shared_u, shared_k, c["corr"], kc))
            out.append(printed * c["exposure"])
        return jnp.stack(out)
