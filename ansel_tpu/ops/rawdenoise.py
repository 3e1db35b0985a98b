"""rawdenoise — wavelet denoise on the raw mosaic.

Reference: `/root/reference/src/iop/rawdenoise.c` (params v2,
rawdenoise.c:92-97): each of the four CFA phase planes is sqrt()-VST'd,
decomposed with the 3-tap hat à-trous ([1,2,1]/4 separable, spacing 2^lev;
src/pixel/dwt.c:441-538), each band soft-thresholded with
noise_all[band] * force_all^4 * force_chan^4 * 256 * threshold
(compute_channel_noise rawdenoise.c:199-232), then squared back.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core.params import cfield, params
from ..core.types import Colorspace
from .base import Op, OpPlan, PlanContext, register

BANDS = 5
CH_ALL, CH_R, CH_G, CH_B = range(4)
NOISE_ALL = (0.8002, 0.2735, 0.1202, 0.0585, 0.0291, 0.0152, 0.0080, 0.0044)


@params(op="rawdenoise", version=2)
@dataclasses.dataclass
class RawDenoiseParams:
    threshold: float = cfield("f", 0.01)
    x: tuple = cfield(f"{4 * BANDS}f", tuple(
        (k / (BANDS - 1.0)) for _ in range(4) for k in range(BANDS)))
    y: tuple = cfield(f"{4 * BANDS}f", (0.5,) * (4 * BANDS))


    @classmethod
    def from_legacy(cls, version, raw):
        import struct

        # rawdenoise.c v1 {threshold} -> default flat force curves
        if version == 1:
            (t,) = struct.unpack("<f", raw[:4])
            return cls(threshold=t)
        return None


def _hat_blur(x: jnp.ndarray, lev: int) -> jnp.ndarray:
    """separable dilated [1,2,1]/4 (the dwt.c hat transform), fused."""
    from ..pixel.shifts import sep_filter

    return sep_filter(x, [0.25, 0.5, 0.25], dilation=1 << lev)


def dwt_denoise(img: jnp.ndarray, noise) -> jnp.ndarray:
    """hat-wavelet soft-threshold denoise (dwt.c:516-538).  `img` is
    (..., H, W); `noise` indexes levels on axis 0 and broadcasts any
    leading axes (so all 4 CFA planes run in ONE batched pass)."""
    accum = jnp.zeros_like(img)
    cur = img
    for lev in range(len(noise)):
        smooth = _hat_blur(cur, lev)
        diff = cur - smooth
        t = noise[lev]
        accum = accum + jnp.maximum(diff - t, 0.0) + jnp.minimum(diff + t, 0.0)
        cur = smooth
    return cur + accum


def _channel_noise(p: RawDenoiseParams, color: int) -> np.ndarray:
    ch = {0: CH_R, 2: CH_B}.get(color, CH_G)
    out = np.zeros(BANDS, np.float32)
    for i in range(BANDS):
        f_ch = p.y[ch * BANDS + (BANDS - i - 1)]
        f_all = p.y[CH_ALL * BANDS + (BANDS - i - 1)]
        out[i] = (NOISE_ALL[i] * (f_all**4) * (f_ch**4) * 256.0
                  * p.threshold)
    return out


@register
class RawDenoise(Op):
    name = "rawdenoise"
    input_colorspace = Colorspace.RAW
    # hat wavelet on half-res CFA planes: sum(1*2^l, l<BANDS) = 31 plane
    # rows = 62 mosaic rows of stencil support (window-sharding halo)
    window_halo = 2 * ((1 << BANDS) - 1)

    def coeffs(self, ctx: PlanContext, plan: OpPlan, p: RawDenoiseParams):
        cfa = plan.spec_in.cfa
        noise = np.zeros((2, 2, BANDS), np.float32)
        for y in range(2):
            for x in range(2):
                noise[y, x] = _channel_noise(p, cfa.color_at(y, x))
        return {"noise": noise}

    def apply(self, x, c, plan: OpPlan, ctx: PlanContext):
        h, w = x.shape
        # split into the 4 CFA phase planes, VST, denoise all four in one
        # batched hat-wavelet pass ((4, h/2, w/2) — 4x fewer dispatches
        # and full VPU lanes), restore
        planes = x.reshape(h // 2, 2, w // 2, 2).transpose(1, 3, 0, 2) \
                  .reshape(4, h // 2, w // 2)
        vst = jnp.sqrt(jnp.maximum(planes, 0.0))
        # noise: (2, 2, BANDS) -> (BANDS, 4, 1, 1) to broadcast per level
        nz = jnp.asarray(c["noise"]).reshape(4, -1).T[:, :, None, None]
        den = dwt_denoise(vst, nz)
        out = den * den
        return out.reshape(2, 2, h // 2, w // 2) \
                  .transpose(2, 0, 3, 1).reshape(h, w)
