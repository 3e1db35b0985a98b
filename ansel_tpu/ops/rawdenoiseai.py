"""rawdenoiseai — CNN raw denoiser (U-Net on the mosaic).

Reference: `/root/reference/src/iop/rawdenoiseai.c` (params v1,
rawdenoiseai.c:159-176) + the inference engine `src/common/nn_model.{h,c}`.
Input planes (fine stage, rawdenoiseai.c:874-905): [mosaic, R/G/B one-hot,
sigma] with sigma = scale[c] * sqrt(a[c]*max(v,0) + b[c]) from the noise
profile variance line and the per-channel correction sliders; output is the
noise residual subtracted from the mosaic, blended by `strength`.

Models load from `.anselnn` files (io/anselnn.py).  Both archs are
complete: "unet" (single-scale) and "unet-ms" (coarse superpixel net
guiding the fine net, rawdenoiseai.c:1317-1342, plus the hybrid
low-band fusion anchor rawdenoiseai.c:1195-1260).
Model resolution order: explicit ModelRegistry entry -> custom_model path.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..core.params import cfield, params
from ..core.types import CFAPattern, Colorspace
from ..io.anselnn import NNModel, load_anselnn
from ..kernels.unet import unet_forward
from . import _bayer
from .base import Op, OpPlan, PlanContext, register

# host-side registry: name -> NNModel (tests/apps inject models here; the
# reference resolves shipped models from its data dir the same way)
MODEL_REGISTRY: Dict[str, NNModel] = {}
MODEL_SEARCH_PATH = [os.path.expanduser("~/.config/ansel_tpu/models")]


@params(op="rawdenoiseai", version=1)
@dataclasses.dataclass
class RawDenoiseAIParams:
    strength: float = cfield("f", 0.85)
    version: int = cfield("i", 0)
    size: int = cfield("i", 0)
    noise_level: float = cfield("f", 1.0)
    sigma_red: float = cfield("f", 2.82)
    sigma_green: float = cfield("f", 3.94)
    sigma_blue: float = cfield("f", 2.96)
    scale_variant: int = cfield("i", 0)
    custom_model: str = cfield("s:128", "")


def _resolve_model(p: RawDenoiseAIParams) -> Optional[NNModel]:
    name = p.custom_model or f"v{p.version}_s{p.size}_sc{p.scale_variant}"
    if name in MODEL_REGISTRY:
        return MODEL_REGISTRY[name]
    if p.custom_model:
        for d in MODEL_SEARCH_PATH:
            path = os.path.join(d, p.custom_model)
            if os.path.exists(path):
                model = load_anselnn(path)
                MODEL_REGISTRY[name] = model
                return model
    return None


@register
class RawDenoiseAI(Op):
    name = "rawdenoiseai"
    input_colorspace = Colorspace.RAW

    def plan(self, ctx: PlanContext, spec_in, p: RawDenoiseAIParams) -> OpPlan:
        model = _resolve_model(p)
        key = None
        if model is not None:
            key = (p.custom_model
                   or f"v{p.version}_s{p.size}_sc{p.scale_variant}")
        return OpPlan(spec_in=spec_in, spec_out=spec_in, static=key)

    def coeffs(self, ctx: PlanContext, plan: OpPlan, p: RawDenoiseAIParams):
        if plan.static is None:
            return None
        model = MODEL_REGISTRY[plan.static]
        # generic profile fallback (profiled values come from
        # noiseprofiles.json when available)
        a = np.full(3, 1e-4, np.float32)
        b = np.full(3, 1e-6, np.float32)
        scale = np.float32([p.sigma_red, p.sigma_green, p.sigma_blue]) \
            * p.noise_level
        out = {
            "a": a, "b": b, "scale": scale,
            "strength": np.float32(p.strength),
        }
        if model.has_coarse:
            out["weights_fine"] = dict(model.stage("fine").tensors)
            out["weights_coarse"] = dict(model.stage("coarse").tensors)
        else:
            out["weights"] = dict(model.tensors)
        return out

    def apply(self, x, c, plan: OpPlan, ctx: PlanContext):
        if plan.static is None:
            return x  # no model resolved: identity (reference disables)
        model = MODEL_REGISTRY[plan.static]
        spec = plan.spec_in
        h, w = spec.pad_h, spec.pad_w
        if spec.cfa is CFAPattern.XTRANS:
            masks = _bayer.xtrans_color_masks(ctx.meta.xtrans, h, w, x.dtype)
        else:
            masks = _bayer.color_masks(spec.cfa, h, w, x.dtype)
        a = _bayer.color_select([c["a"][0], c["a"][1], c["a"][2], c["a"][1]],
                                spec.cfa, h, w) \
            if spec.cfa is not CFAPattern.XTRANS else \
            _bayer.xtrans_color_select(list(c["a"]), ctx.meta.xtrans, h, w)
        b = _bayer.color_select([c["b"][0], c["b"][1], c["b"][2], c["b"][1]],
                                spec.cfa, h, w) \
            if spec.cfa is not CFAPattern.XTRANS else \
            _bayer.xtrans_color_select(list(c["b"]), ctx.meta.xtrans, h, w)
        sc = _bayer.color_select(
            [c["scale"][0], c["scale"][1], c["scale"][2], c["scale"][1]],
            spec.cfa, h, w) if spec.cfa is not CFAPattern.XTRANS else \
            _bayer.xtrans_color_select(list(c["scale"]), ctx.meta.xtrans,
                                       h, w)
        var = a * jnp.maximum(x, 0.0) + b
        sigma = sc * jnp.sqrt(jnp.maximum(var, 1e-12))
        planes = jnp.stack([x, masks[0], masks[1], masks[2], sigma])

        if model.has_coarse:
            # multi-scale ("unet-ms"): denoise the superpixel-binned RGB
            # with the coarse net, inject the nearest-upsampled result as
            # guide planes 5-7 (rawdenoiseai.c:1317-1342, mirrors
            # ms_forward in the training repo)
            is_xt = spec.cfa is CFAPattern.XTRANS
            binf = model.bin_for(is_xt)
            align = binf * (1 << model.stage("coarse").depth)
            ph2 = -(-h // align) * align
            pw2 = -(-w // align) * align
            pads = ((0, ph2 - h), (0, pw2 - w))
            xb = jnp.pad(x, pads, mode="reflect")
            coarse_rgb, coarse_sig = [], []
            for ch in range(3):
                m = jnp.pad(masks[ch], pads, mode="reflect")
                num = (xb * m).reshape(ph2 // binf, binf, pw2 // binf,
                                       binf).sum((1, 3))
                cnt = m.reshape(ph2 // binf, binf, pw2 // binf,
                                binf).sum((1, 3))
                n = jnp.maximum(cnt, 1.0)
                mean = num / n
                coarse_rgb.append(mean)
                cvar = (c["a"][ch] * jnp.maximum(mean, 0.0)
                        + c["b"][ch]) / n
                coarse_sig.append(c["scale"][ch] * jnp.sqrt(
                    jnp.maximum(cvar, 1e-12)))
            coarse_in = jnp.stack(coarse_rgb + coarse_sig)
            head = unet_forward(model.stage("coarse"), coarse_in,
                                weights=c.get("weights_coarse"))
            coarse_dn = coarse_in[:3] - head  # nn_residual
            guide = jnp.repeat(jnp.repeat(coarse_dn, binf, axis=1),
                               binf, axis=2)[:, :h, :w]
            planes = jnp.concatenate([planes, guide], axis=0)
            fine = model.stage("fine")
            noise = unet_forward(fine, planes,
                                 weights=c.get("weights_fine"))[0]
        else:
            noise = unet_forward(model, planes, weights=c["weights"])[0]
        denoised = x - noise
        if model.anchor > 0:
            denoised = low_band_anchor(x, masks, sigma, denoised)
        s = c["strength"]
        return x * (1.0 - s) + denoised * s


# --- low-band fusion anchor (rawdenoiseai.c:1195-1260) ----------------------

_FUSION_FINEST = 16
_FUSION_COARSEST = 64
_FUSION_DENS = (0.25, 0.5, 0.25)
_FUSION_T = 2.5


def _blur3(p):
    """3x3 clamped-edge box mean."""
    from ..pixel.shifts import PaddedView

    pv = PaddedView(p, 1)
    return sum(pv.at(dy, dx) for dy in (-1, 0, 1)
               for dx in (-1, 0, 1)) / 9.0


def _blocksum(p, s):
    h, w = p.shape
    return p.reshape(h // s, s, w // s, s).sum((1, 3))


def _up2(p):
    import jax

    h, w = p.shape
    return jax.image.resize(p, (h * 2, w * 2), "linear")


def low_band_anchor(x, onehot, sigma, denoised):
    """Hybrid low-band fusion (rawdenoiseai.c:1195-1260 /
    cfa.fuse_low_bands): anchor the denoised plane's 16/32/64-px bands to
    the measurement with structure/Wiener gates; hallucination-free at
    the coarsest band.  All arrays (H, W); onehot: (3, H, W)."""
    import jax.numpy as jnp

    h, w = x.shape
    S = _FUSION_COARSEST
    ph2 = -(-h // S) * S
    pw2 = -(-w // S) * S
    pad = ((0, ph2 - h), (0, pw2 - w))
    xs = jnp.pad(x, pad, mode="reflect")
    ds = jnp.pad(denoised, pad, mode="reflect")
    sg = jnp.pad(sigma, pad, mode="reflect")
    ohs = [jnp.pad(onehot[c], pad, mode="reflect") for c in range(3)]

    # level-0 (16 px) M/D/V per channel
    levels = []  # [(M, D, V)] per level, each (3, ch, cw)
    M0, D0, V0 = [], [], []
    for c in range(3):
        cnt = jnp.maximum(_blocksum(ohs[c], _FUSION_FINEST), 1.0)
        M0.append(_blocksum(xs * ohs[c], _FUSION_FINEST) / cnt)
        D0.append(_blocksum(ds * ohs[c], _FUSION_FINEST) / cnt)
        V0.append(_blocksum(sg * sg * ohs[c], _FUSION_FINEST) / cnt)
    levels.append((M0, D0, V0))
    nlev = 1
    s = _FUSION_FINEST
    while s < _FUSION_COARSEST:
        prev = levels[-1]
        levels.append(tuple(
            [_blocksum(pl, 2) / 4.0 for pl in group] for group in prev))
        nlev += 1
        s *= 2

    # floor fuse at the coarsest band (measurement-gated)
    Mc, Dc, Vc = levels[-1]
    Sc = _FUSION_FINEST << (nlev - 1)
    fused = []
    for c in range(3):
        vscale = 1.0 / (_FUSION_DENS[c] * Sc * Sc)
        mloc = Mc[c] - _blur3(Mc[c])
        structure = _blur3(mloc * mloc)
        vn = Vc[c] * vscale
        structure = jnp.maximum(structure - _FUSION_T * vn, 0.0)
        wgt = structure / (structure + vn + 1e-20)
        fused.append(wgt * Dc[c] + (1.0 - wgt) * Mc[c])

    # coarse-to-fine Wiener band fusion
    for k in range(nlev - 2, -1, -1):
        Mf, Df, Vf = levels[k]
        Mc_, Dc_, _ = levels[k + 1]
        sc = _FUSION_FINEST << k
        new_fused = []
        for c in range(3):
            upD = _up2(Dc_[c])
            upM = _up2(Mc_[c])
            upF = _up2(fused[c])
            band = (Df[c] - upD) - (Mf[c] - upM)
            acc = _blur3(band * band)
            vscale = (1.0 / (_FUSION_DENS[c] * sc * sc)
                      - 1.0 / (_FUSION_DENS[c] * 4.0 * sc * sc))
            vn = Vf[c] * vscale
            vm = jnp.maximum(acc - _FUSION_T * vn, 0.0)
            wgt = vn / (vn + vm + 1e-20)
            new_fused.append(upF + wgt * (Df[c] - upD)
                             + (1.0 - wgt) * (Mf[c] - upM))
        fused = new_fused

    # bilinear scatter of (fused - D16) onto the owning channel's sensels
    import jax

    out = ds
    for c in range(3):
        corr = fused[c] - levels[0][1][c]
        up = jax.image.resize(corr, (ph2, pw2), "linear")
        out = out + ohs[c] * up
    return out[:h, :w]
