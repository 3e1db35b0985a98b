"""Guided-Laplacian highlight reconstruction (Bayer).

Behavioral reference: `/root/reference/src/iop/highlights/laplacian.c`
(process_laplacian :433-575 — gather/normalize, 4x downsample,
iterations x [guided RGB pass + ratio-diffusion chroma pass] over an
a-trous B-spline pyramid, upsample, remosaic) and
`highlights/gather.c` (_compute_laplacian_normalization :224-280,
_interpolate_and_mask :67-220, _remosaic_and_replace :455-485).

TPU form: whole-image shifted-view math at the 1/4-resolution working
size; the per-pixel guiding-channel argmax and the 3x3 guided moments
are masked selects/sums; iterations run under `lax.scan` so only one
iteration's pyramid is live.  The reference's xoshiro Poisson salt
becomes a jax.random half-normal of the same sigma (documented RNG
deviation).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..core.types import CFAPattern
from ..ops import _bayer
from ..pixel.shifts import PaddedView

DS_FACTOR = 4
B_SPLINE_SIGMA = 1.0553651328015339
B_SPLINE_TO_LAPLACIAN = 3.182727439285017
MAX_NUM_SCALES = 10
_B3 = (1.0 / 16.0, 4.0 / 16.0, 6.0 / 16.0, 4.0 / 16.0, 1.0 / 16.0)

FIRST_SCALE = 1
LAST_SCALE = 2


def _sep_blur4(x4, mult):
    """B3 a-trous blur of a (4, H, W) stack at dilation mult — via
    sep_filter, which routes big planes to the row-strip Pallas kernel
    (same edge-clamp semantics as the PaddedView chain it replaces;
    this blur runs 30 iterations x 2 passes x ~6 scales per laplacian
    reconstruction, the config-2 profile's largest block)."""
    from ..pixel.shifts import sep_filter

    return sep_filter(x4, list(_B3), mult)


def _interpolate_and_mask(x, clips, norm, cfa: CFAPattern):
    """Bilinear CFA fill to [R,G,B,norm] + binary clip masks
    (gather.c:67-220).  Borders mirror (reflection preserves CFA
    phase)."""
    h, w = x.shape
    p = PaddedView(x, 1, mode="reflect")
    N, S, W_, E = p.at(-1, 0), p.at(1, 0), p.at(0, -1), p.at(0, 1)
    NW, NE, SW, SE = p.at(-1, -1), p.at(-1, 1), p.at(1, -1), p.at(1, 1)

    rmask, gmask, bmask = (m.astype(bool)
                           for m in _bayer.color_masks(cfa, h, w))
    # green sites on red rows have horizontal R neighbours
    red_row_parity = 0 if 0 in (cfa.color_at(0, 0), cfa.color_at(0, 1)) \
        else 1
    rp, _ = _bayer.parity_maps(h, w)
    rrow = jnp.broadcast_to(rp == red_row_parity, (h, w))

    cross4 = (N + S + W_ + E) * 0.25
    diag4 = (NW + NE + SW + SE) * 0.25
    horiz = (W_ + E) * 0.5
    vert = (N + S) * 0.5

    def clipped4(a, b, cc, d, t):
        return (a > t) | (b > t) | (cc > t) | (d > t)

    G = jnp.where(gmask, x, cross4)
    G_c = jnp.where(gmask, x > clips[1], clipped4(N, S, W_, E, clips[1]))
    # R: own site / horizontal (G on R-row) / vertical (G on B-row) /
    # diagonal (B site)
    R = jnp.where(rmask, x,
                  jnp.where(gmask & rrow, horiz,
                            jnp.where(gmask, vert, diag4)))
    R_c = jnp.where(
        rmask, x > clips[0],
        jnp.where(gmask & rrow, (W_ > clips[0]) | (E > clips[0]),
                  jnp.where(gmask, (N > clips[0]) | (S > clips[0]),
                            clipped4(NW, NE, SW, SE, clips[0]))))
    B = jnp.where(bmask, x,
                  jnp.where(gmask & (~rrow), horiz,
                            jnp.where(gmask, vert, diag4)))
    B_c = jnp.where(
        bmask, x > clips[2],
        jnp.where(gmask & (~rrow), (W_ > clips[2]) | (E > clips[2]),
                  jnp.where(gmask, (N > clips[2]) | (S > clips[2]),
                            clipped4(NW, NE, SW, SE, clips[2]))))

    Rn = jnp.maximum(R / norm[0], 0.0)
    Gn = jnp.maximum(G / norm[1], 0.0)
    Bn = jnp.maximum(B / norm[2], 0.0)
    mag = jnp.sqrt(Rn * Rn + Gn * Gn + Bn * Bn)
    interp = jnp.stack([Rn, Gn, Bn, jnp.maximum(mag / norm[3], 0.0)])
    dt = x.dtype
    mask = jnp.stack([R_c.astype(dt), G_c.astype(dt), B_c.astype(dt),
                      (R_c | G_c | B_c).astype(dt)])
    return interp, mask


def _guide_laplacians(HF, LF, mask, out, mult, radius_sq, stype,
                      noise_level, salt, key):
    """guide_laplacians (laplacian.c:85-248) on (4, h, w) stacks."""
    # NOTE: a separable-box-sum rewrite through the Pallas sepblur (20
    # pointwise-product planes, C<=8 groups) measured 1.78 -> 1.33
    # img/s on config 2 — the explicit stacks materialize traffic that
    # XLA's fusion of this tap loop never pays.  Keep the fused form.
    taps = [[PaddedView(HF[ch], mult).at(dy * mult, dx * mult)
             for ch in range(4)]
            for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    alpha = mask[3]
    inv_patch = 1.0 / 9.0
    s = [None] * 4
    s2 = [None] * 4
    prods = [[None] * 4 for _ in range(3)]  # prod vs guide in {R,G,B}
    for t in taps:
        for ch in range(4):
            v = t[ch]
            s[ch] = v if s[ch] is None else s[ch] + v
            s2[ch] = v * v if s2[ch] is None else s2[ch] + v * v
            for gch in range(3):
                pv = v * t[gch]
                prods[gch][ch] = pv if prods[gch][ch] is None \
                    else prods[gch][ch] + pv
    means = [v * inv_patch for v in s]
    var = [jnp.maximum(s2[ch] * inv_patch - means[ch] * means[ch], 0.0)
           for ch in range(4)]
    # per-pixel guiding channel = argmax variance over R/G/B
    g_is_g = var[1] > var[0]
    gv01 = jnp.where(g_is_g, var[1], var[0])
    g_is_b = var[2] > gv01
    guide_var = jnp.where(g_is_b, var[2], gv01)

    def pick(vals):
        v01 = jnp.where(g_is_g, vals[1], vals[0])
        return jnp.where(g_is_b, vals[2], v01)

    guide_mean = pick(means)
    guide_hf = pick([HF[0], HF[1], HF[2]])
    newHF = []
    ok = (alpha > 0.0) & (guide_var > 1e-12)
    safe_var = jnp.maximum(guide_var, 1e-12)
    for ch in range(4):
        cov = pick([prods[0][ch], prods[1][ch], prods[2][ch]]) \
            * inv_patch - means[ch] * guide_mean
        slope = jnp.maximum(cov / safe_var, 0.0)
        intercept = means[ch] - slope * guide_mean
        blend = mask[ch] / radius_sq
        fitted = blend * (slope * guide_hf + intercept) \
            + (1.0 - blend) * HF[ch]
        newHF.append(jnp.where(ok, fitted, HF[ch]))
    newHF = jnp.stack(newHF)

    out = newHF if (stype & FIRST_SCALE) else out + newHF
    if stype & LAST_SCALE:
        out = jnp.maximum(out + LF, 0.0)
        if salt and noise_level > 0.0:
            # Poisson-style salt: half-normal of sigma = value*noise
            # (the reference's xoshiro generator; RNG deviation)
            g = jax.random.normal(key, out.shape)
            noisy = out + jnp.abs(g * out * noise_level)
            a = alpha[None]
            out = jnp.maximum(a * noisy + (1.0 - a) * out, 0.0)
        # break into ratios + norm
        mag = jnp.maximum(jnp.sqrt(out[0] ** 2 + out[1] ** 2
                                   + out[2] ** 2), 1e-6)
        out = jnp.stack([out[0] / mag, out[1] / mag, out[2] / mag, mag])
    return out


def _heat_pde(HF, LF, mask, out, mult, stype, f1):
    """heat_PDE_diffusion (laplacian.c:248-374) on ratios+norm."""
    # (a sep([.5,1,.5]) - 4*center Pallas form measured 1.685 vs the
    # fused chain's 1.784 on config 2 — same lesson as the moments)
    iso = (0.25, 0.5, 0.25, 0.5, -3.0, 0.5, 0.25, 0.5, 0.25)
    alpha = mask
    newHF = []
    for ch in range(3):
        p = PaddedView(HF[ch], mult)
        lap = sum(iso[k] * p.at((k // 3 - 1) * mult, (k % 3 - 1) * mult)
                  for k in range(9))
        upd = HF[ch] + alpha[ch] * (lap - f1 * HF[ch]) \
            / B_SPLINE_TO_LAPLACIAN
        newHF.append(jnp.where(alpha[3] > 0.0, upd, HF[ch]))
    newHF.append(HF[3])  # norm channel not diffused
    newHF = jnp.stack(newHF)

    out = newHF if (stype & FIRST_SCALE) else out + newHF
    if stype & LAST_SCALE:
        out = jnp.maximum(out + LF, 0.0)
        mag = jnp.sqrt(out[0] ** 2 + out[1] ** 2 + out[2] ** 2)
        renorm = (alpha[3] > 0.0) & (mag > 1e-4)
        safe = jnp.maximum(mag, 1e-4)
        ratios = [jnp.where(renorm, out[ch] / safe, out[ch])
                  for ch in range(3)]
        out = jnp.stack([r * out[3] for r in ratios] + [out[3]])
    return out


def _scale_type(s, scales):
    t = 0
    if s == 0:
        t |= FIRST_SCALE
    if s == scales - 1:
        t |= LAST_SCALE
    return t


def _equivalent_sigma(s_eff):
    sig = B_SPLINE_SIGMA
    for i in range(1, s_eff + 1):
        sig = math.sqrt(sig ** 2 + ((1 << i) * B_SPLINE_SIGMA) ** 2)
    return sig


def laplacian_reconstruct(x, clips, cfa: CFAPattern, scales_param: int,
                          iterations: int, noise_level: float,
                          solid_color: float, zoom: float = 1.0):
    """(H, W) Bayer mosaic -> reconstructed mosaic (process_laplacian)."""
    h, w = x.shape
    clips = [jnp.asarray(c, x.dtype) for c in clips]

    # per-CFA-color plain averages over the frame (gather.c:224-280);
    # divided by the FULL pixel count so they carry the fill fraction
    rmaskf, gmaskf, bmaskf = _bayer.color_masks(cfa, h, w, x.dtype)
    n = float(h * w)
    norm = [jnp.maximum(jnp.sum(x * rmaskf) / n, 1e-6),
            jnp.maximum(jnp.sum(x * gmaskf) / n, 1e-6),
            jnp.maximum(jnp.sum(x * bmaskf) / n, 1e-6)]
    norm.append(jnp.maximum(
        jnp.sqrt(norm[0] ** 2 + norm[1] ** 2 + norm[2] ** 2), 1e-6))

    interp, mask = _interpolate_and_mask(x, clips, norm, cfa)
    # feather the mask: 5x5 box mean (dt_box_mean radius 2)
    maskb = []
    for ch in range(4):
        p = PaddedView(mask[ch], 2)
        row = sum(p.at(k, 0) for k in range(-2, 3)) / 5.0
        pr = PaddedView(row, 2)
        maskb.append(sum(pr.at(0, k) for k in range(-2, 3)) / 5.0)
    mask = jnp.stack(maskb)

    dsh, dsw = max(h // DS_FACTOR, 8), max(w // DS_FACTOR, 8)
    ds_interp = jax.image.resize(interp, (4, dsh, dsw), "bilinear")
    ds_mask = jax.image.resize(mask, (4, dsh, dsw), "bilinear")

    eff_scale = DS_FACTOR * max(zoom, 1e-6)
    final_radius = float(1 << max(int(scales_param), 1)) / eff_scale
    scales = min(max(int(math.ceil(math.log2(max(final_radius, 1.0)))),
                     1), MAX_NUM_SCALES)
    noise = noise_level / eff_scale

    def wavelets_pass(buf, variant_rgb, salt, key):
        out = jnp.zeros_like(buf)
        cur = buf
        for s in range(scales):
            mult = 1 << s
            lf = _sep_blur4(cur, mult)
            hf = cur - lf
            stype = _scale_type(s, scales)
            radius_sq = _equivalent_sigma(s * DS_FACTOR) ** 2
            if variant_rgb:
                out = _guide_laplacians(hf, lf, ds_mask, out, mult,
                                        radius_sq, stype, noise, salt,
                                        key)
            else:
                out = _heat_pde(hf, lf, ds_mask, out, mult, stype,
                                solid_color)
            cur = lf
        return out

    iterations = max(int(iterations), 1)

    # salt fires only on the last iteration (laplacian.c:530): run
    # iterations-1 saltless under lax.scan, then one salted iteration
    keys = jax.random.split(jax.random.PRNGKey(0x411E), iterations)
    buf = ds_interp
    if iterations > 1:
        def body_nosalt(carry, _):
            b = carry
            t = wavelets_pass(b, True, salt=False, key=keys[0])
            b = wavelets_pass(t, False, salt=False, key=keys[0])
            return b, None

        buf, _ = jax.lax.scan(body_nosalt, buf, None,
                              length=iterations - 1)
    t = wavelets_pass(buf, True, salt=True, key=keys[-1])
    buf = wavelets_pass(t, False, salt=False, key=keys[-1])

    up = jax.image.resize(buf, (4, h, w), "bilinear")
    # remosaic + composite (gather.c:455-485): undo the normalization
    site_norm = rmaskf * norm[0] + gmaskf * norm[1] + bmaskf * norm[2]
    site_rec = jnp.maximum(
        (up[0] * rmaskf + up[1] * gmaskf + up[2] * bmaskf) * site_norm,
        0.0)
    opacity = jnp.clip(jax.image.resize(mask[3], (h, w), "bilinear"),
                       0.0, 1.0)
    return opacity * site_rec + (1.0 - opacity) * x
