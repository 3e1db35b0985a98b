"""Segmentation-based highlight reconstruction — the HARMONIC mode's
all-clip core: a biharmonic luminance dome x diffused chromaticity.

Behavioral reference: `/root/reference/src/iop/highlights/segmentation.c`
(flood-fill connected components of the clipped mask, padded-box regions)
+ `highlights/dome.c:_biharmonic_dome` (per-region coarse-grid Delta^2 u=0
solve, 13-point stencil, Dirichlet data from the valid rim, sparse
Cholesky, bilinear upsample) + `highlights/region.c` steps 7-8 (the
all-clip joint core: shared luminance dome x diffused chroma under the
saturation-floor obstacle r >= c0/L).

TPU-native reformulation (not a port) — the key identity: the reference
segments BECAUSE its direct solver needs small dense/sparse systems per
region box.  A masked ITERATIVE solve over the whole coarse grid is the
same linear system: Dirichlet data at every valid cell decouples the
holes exactly as the flood-fill regions are decoupled (information
cannot cross a fixed cell), and overlapping "regions" automatically
share context (the reference merges overlapping padded boxes for the
same reason, segmentation.c:130-137).  So:

  * connected-component labeling      -> nothing (implicit in the mask)
  * per-region padded gather/scatter  -> whole-plane masked updates
  * per-region sparse Cholesky        -> multi-level damped Richardson
    on the SAME clamped-border 13-point biharmonic operator
    (dome.c:105-107), coarse-to-fine so every hole size converges with
    a fixed iteration budget (static shapes, `lax.scan` liveness)
  * per-region solver grids           -> one static pyramid from the
    image size (the reference already forces a SHARED downsample per
    region for hue stability — dome.c:44-49 — this shares it globally)

Luminance gets the biharmonic dome (gradient-matching at the rim ->
recovers energy ABOVE the clip ceiling; a harmonic fill cannot, by the
maximum principle).  Chromaticity r_c = c/L is bounded, so it gets the
STRUCTURE-STEERED fill of region.c step 8: the variance-adaptive tensor
D blends isophote and gradient transport from the dome-luminance guide
(coefficient_field.c:_cf_adaptive_tensor), the fill relaxes div(D grad
r)=0 through the Weickert nonnegativity stencil (chroma.h), and every
sweep projects the saturation-floor obstacle r >= clip0/L
(_aniso_iterate_obs semantics).  The remosaic floor max(rec, clip0)
(region.c:73-77) still applies unconditionally.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..core.types import CFAPattern
from ..ops import _bayer
from ..pixel.shifts import PaddedView
from .highlights_laplacian import _interpolate_and_mask

DS_FACTOR = 4          # working resolution of the dome pyramid base
COARSEST = 24          # stop the pyramid when max(h, w) <= this


def _lap5(u):
    """Clamped-border 5-point Laplacian (the factor of the reference's
    13-point Delta^2 stencil, dome.c:101-107)."""
    p = PaddedView(u, 1)
    return (p.at(-1, 0) + p.at(1, 0) + p.at(0, -1) + p.at(0, 1)) - 4.0 * u


def _down2(x):
    h, w = x.shape[-2:]
    ph, pw = (-h) % 2, (-w) % 2
    if ph or pw:
        pad = [(0, 0)] * (x.ndim - 2) + [(0, ph), (0, pw)]
        x = jnp.pad(x, pad, mode="edge")
    h2, w2 = x.shape[-2] // 2, x.shape[-1] // 2
    return x.reshape(*x.shape[:-2], h2, 2, w2, 2).mean(axis=(-3, -1))


def _up2(x, h, w):
    return jax.image.resize(x, (*x.shape[:-2], h, w), "bilinear")


def _masked_cg(u, fixed, hole, iters, biharmonic):
    """Conjugate gradient on the masked operator, Dirichlet-fixed valid
    cells: solve A v = b with A = P_h L P_h (P_h = restriction to hole
    cells), L = Delta^2 (the reference's 13-point stencil = Lap(Lap),
    dome.c:101-107, clamped borders) or -Delta for the harmonic fills.
    A is SPD on the hole subspace, so CG applies; the reference's own
    iterative path budgets max_cg_iter = clamp(2*extent, 200, 2000)
    (region.c:205) — here the coarse-to-fine pyramid keeps each level's
    residual local, so a small fixed budget converges."""
    hf = hole.astype(u.dtype)

    def L(v):
        return _lap5(_lap5(v)) if biharmonic else -_lap5(v)

    def A(v):
        return hf * L(hf * v)

    u0 = jnp.where(hole, u, fixed)
    b = -hf * L(u0)
    x = jnp.zeros_like(u0)
    r = b
    p = r
    rs = jnp.sum(r * r)

    def body(carry, _):
        x, r, p, rs = carry
        Ap = A(p)
        alpha = rs / jnp.maximum(jnp.sum(p * Ap), 1e-30)
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = jnp.sum(r * r)
        beta = rs_new / jnp.maximum(rs, 1e-30)
        p = r + beta * p
        return (x, r, p, rs_new), None

    (x, _, _, _), _ = jax.lax.scan(body, (x, r, p, rs), None,
                                   length=iters)
    return jnp.where(hole, u0 + x, fixed)


def _masked_laplace(u, fixed, hole, iters):
    """Harmonic fill (Delta u = 0 on holes): seeds the dome and
    diffuses chromaticity (region.c step 8, isotropic D)."""
    return _masked_cg(u, fixed, hole, iters, biharmonic=False)


def _adaptive_tensor(steer, k=0.15):
    """Variance-adaptive steering tensor D from the guide plane
    (coefficient_field.c:_cf_adaptive_tensor, transcribed math):

      D = [m + (1-m) c2] t t^T + [m c2 + (1-m)] g g^T
      c2 = exp(-|grad Lb| / (4 <|grad Lb|>))
      m  = v / (v + (k Lb)^2),  v = max(var_w(Lb) - 4/3 |grad Lb|^2, 0)

    with Lb = twice-3x3-box-blurred steer, g the unit gradient, t the
    unit isophote.  m->0 (clean halo ramp): transport radially along
    the ramp; m->1 (hard edge in the zone): transport along the edge,
    never across it.  -> (Dxx, Dxy, Dyy), SPD with entries in (0, 1]."""
    def box3(p):
        pv = PaddedView(p, 1)
        row = (pv.at(-1, 0) + p + pv.at(1, 0)) / 3.0
        pr = PaddedView(row, 1)
        return (pr.at(0, -1) + row + pr.at(0, 1)) / 3.0

    lb = box3(box3(steer))
    qb = box3(box3(steer * steer))
    p = PaddedView(lb, 1)
    gx = 0.5 * (p.at(0, 1) - p.at(0, -1))
    gy = 0.5 * (p.at(1, 0) - p.at(-1, 0))
    gmag = jnp.sqrt(gx * gx + gy * gy)
    gmean = jnp.maximum(jnp.mean(gmag), 1e-9)
    nonzero = (gmag > 1e-12).astype(steer.dtype)
    inv = nonzero / (gmag + (1.0 - nonzero))
    gux = gx * inv + (1.0 - nonzero)
    guy = gy * inv
    tx, ty = -guy, gux
    c2 = jnp.exp(-gmag / (4.0 * gmean))
    var = jnp.maximum(qb - lb * lb, 0.0)
    vres = jnp.maximum(var - (4.0 / 3.0) * (gx * gx + gy * gy), 0.0)
    kterm = (k * jnp.maximum(lb, 1e-9)) ** 2
    m = vres / (vres + kterm + 1e-18)
    dt_ = m + (1.0 - m) * c2
    dg = m * c2 + (1.0 - m)
    dxx = dt_ * tx * tx + dg * gux * gux
    dxy = dt_ * tx * ty + dg * gux * guy
    dyy = dt_ * ty * ty + dg * guy * guy
    return dxx, dxy, dyy


def _masked_aniso_laplace(u, fixed, hole, steer, iters, obstacle=None):
    """Structure-steered harmonic fill: div(D grad u) = 0 on the holes,
    Dirichlet anchors elsewhere (region.c step 8 / chroma.h).  Weickert
    nonnegativity stencil (_aniso_edge_w): per edge, tensor entries
    averaged across the edge, cross term clamped to +-min(a, c); axis
    weights a-|b| / c-|b|, diagonal weights +-b halves — all >= 0, so
    each Jacobi sweep is a convex combination of anchors (maximum
    principle).  With `obstacle`, every sweep projects u = max(u, obs):
    the monotone obstacle relaxation of chroma.h (_aniso_iterate_obs,
    the saturation floor r >= c0/L spread smoothly, not clamped)."""
    dxx, dxy, dyy = _adaptive_tensor(steer)
    pxx = PaddedView(dxx, 1)
    pxy = PaddedView(dxy, 1)
    pyy = PaddedView(dyy, 1)

    ws = []
    offs = [(0, -1), (0, 1), (-1, 0), (1, 0),
            (-1, -1), (1, 1), (-1, 1), (1, -1)]
    for (dy, dx) in offs:
        axx = 0.5 * (dxx + pxx.at(dy, dx))
        ayy = 0.5 * (dyy + pyy.at(dy, dx))
        limit = jnp.minimum(axx, ayy)
        cross = jnp.clip(0.5 * (dxy + pxy.at(dy, dx)), -limit, limit)
        if dy == 0:
            w = jnp.maximum(axx - jnp.abs(cross), 1e-4)
        elif dx == 0:
            w = jnp.maximum(ayy - jnp.abs(cross), 1e-4)
        elif dx == dy:
            w = jnp.maximum(cross, 0.0)
        else:
            w = jnp.maximum(-cross, 0.0)
        ws.append(w)
    wsum = sum(ws)

    u0 = jnp.where(hole, u, fixed)

    def sweep(v, _):
        pv = PaddedView(v, 1)
        acc = sum(w * pv.at(dy, dx)
                  for w, (dy, dx) in zip(ws, offs))
        upd = acc / jnp.maximum(wsum, 1e-12)
        if obstacle is not None:
            upd = jnp.maximum(upd, obstacle)
        return jnp.where(hole, upd, v), None

    v, _ = jax.lax.scan(sweep, u0, None, length=iters)
    return jnp.where(hole, v, fixed)


def _masked_biharmonic(u, fixed, hole, iters):
    """Biharmonic dome (Delta^2 u = 0 on holes): rim value AND gradient
    continuation — the energy-recovering solve of dome.c."""
    return _masked_cg(u, fixed, hole, iters, biharmonic=True)


def _solve_pyramid(field, valid, hole, nlev, lap_iters=40, bih_iters=80,
                   biharmonic=True, steer=None, obstacle=None):
    """Coarse-to-fine masked solve.  field: (H, W) with garbage in the
    hole; valid: float 0/1 (1 - hole); returns field with the hole
    filled by the dome / harmonic fill.  With `steer` (a guide plane),
    the harmonic fills become structure-steered div(D grad u) = 0
    sweeps — the tensor is rebuilt per level from the downsampled guide
    exactly as the reference's pyramid path does (coefficient_field.c
    _cf_harmonic_fill with steer != NULL); `obstacle` adds the per-sweep
    projection u = max(u, obs)."""
    fields, valids, holes = [field], [valid], [hole]
    steers = [steer]
    obss = [obstacle]
    for _ in range(nlev):
        v2 = _down2(valids[-1])
        f2 = _down2(fields[-1] * valids[-1]) / jnp.maximum(v2, 1e-6)
        # a coarse cell is a hole if the majority of its support is
        # (dome.c:90); keep real rim data on boundary cells
        h2 = v2 < 0.5
        fields.append(jnp.where(h2, 0.0, f2))
        valids.append(jnp.where(h2, 0.0, 1.0))
        holes.append(h2)
        steers.append(_down2(steers[-1]) if steer is not None else None)
        obss.append(_down2(obss[-1]) if obstacle is not None else None)

    def hfill(u, fixed, hl, iters, lev):
        if steer is not None:
            return _masked_aniso_laplace(u, fixed, hl, steers[lev],
                                         iters, obstacle=obss[lev])
        return _masked_laplace(u, fixed, hl, iters)

    # coarsest: seed holes with the valid mean (dome.c:286-301 fallback
    # semantics), harmonic-fill, then dome
    fL, hL = fields[-1], holes[-1]
    vL = 1.0 - hL
    mean = jnp.sum(fL * vL) / jnp.maximum(jnp.sum(vL), 1.0)
    u = jnp.where(hL, mean, fL)
    u = hfill(u, fL, hL, lap_iters, nlev)
    if biharmonic:
        u = _masked_biharmonic(u, fL, hL, bih_iters)

    for lev in range(nlev - 1, -1, -1):
        h, w = fields[lev].shape
        init = jnp.where(holes[lev], _up2(u, h, w), fields[lev])
        u = hfill(init, fields[lev], holes[lev], lap_iters // 2, lev)
        if biharmonic:
            u = _masked_biharmonic(u, fields[lev], holes[lev], bih_iters)
    return u


def harmonic_dome_core(x, rec, clips, cfa: CFAPattern):
    """Per-channel biharmonic domes + all-clip chroma coherence on a
    Bayer mosaic.

    x: (H, W) original mosaic; rec: mosaic after the guided-laplacian
    pass (rim estimates the domes anchor on); clips: per-channel clip.

    Structure mirrors the reference's region pipeline:
      * per-channel domes on each channel's OWN clip hole (the
        _selfdome stage) — a channel's valid rim carries its true
        values AND gradient, so the dome recovers real energy above
        the clip ceiling ("opposed-color estimates grown into the
        region": R's dome deep inside is informed by the ring where
        only R was lost);
      * in the all-clip core, chromaticity r_c = c/L is re-diffused
        from the rim over the dome luminance with the structure-steered
        tensor fill (the joint core / step 8), preventing per-channel
        dome drift from collapsing hue AND keeping chroma from bleeding
        across hard luminance edges that cross the zone;
      * saturation floor max(rec, clip) per site (region.c:73-77).
    """
    h, w = x.shape
    clips = [jnp.asarray(c, x.dtype) for c in clips]
    norm = [jnp.asarray(1.0, x.dtype)] * 3 + [jnp.asarray(math.sqrt(3.0))]
    # clip masks from the ORIGINAL mosaic (what is clipped), values
    # from the laplacian-reconstructed one (best rim estimates)
    _, mask = _interpolate_and_mask(x, clips, norm, cfa)
    interp, _ = _interpolate_and_mask(rec, clips, norm, cfa)

    # working resolution (dome.c picks a per-region coarse factor; the
    # static equivalent is the laplacian path's 1/4 base + pyramid,
    # shared across channels exactly as dome.c:44-49 forces)
    dsh, dsw = max(h // DS_FACTOR, 8), max(w // DS_FACTOR, 8)
    planes = jax.image.resize(interp[:3], (3, dsh, dsw), "bilinear")
    maskds = jax.image.resize(mask[:3], (3, dsh, dsw), "bilinear")
    nlev = max(int(math.ceil(math.log2(max(dsh, dsw) / COARSEST)))
               if max(dsh, dsw) > COARSEST else 0, 0)

    # per-channel biharmonic domes on per-channel holes (_selfdome)
    domes = []
    for c in range(3):
        hole_c = maskds[c] > 0.5
        validf = 1.0 - hole_c.astype(x.dtype)
        domes.append(_solve_pyramid(
            jnp.where(hole_c, 0.0, planes[c]), validf, hole_c, nlev))
    domes = jnp.stack(domes)

    # all-clip core: re-diffuse chromaticity from the rim over the dome
    # luminance — step 8's structure-steered div(D grad r) = 0 with the
    # dome luminance as the steering plane (region.c:519 builds the
    # steering plane from the measured guide structure; chroma.h's
    # Weickert stencil + the obstacle r >= clip/L projected per sweep)
    hole_all = ((maskds[0] > 0.5) & (maskds[1] > 0.5)
                & (maskds[2] > 0.5))
    valid_all = 1.0 - hole_all.astype(x.dtype)
    L_dome = (domes[0] + domes[1] + domes[2]) / 3.0
    Lsafe = jnp.maximum(L_dome, 1e-6)
    ratios = jnp.stack([
        _solve_pyramid(jnp.where(hole_all, 0.0, domes[c] / Lsafe),
                       valid_all, hole_all, nlev, biharmonic=False,
                       lap_iters=100, steer=L_dome,
                       obstacle=clips[c] / Lsafe)
        for c in range(3)
    ])
    rec_planes = jnp.where(hole_all[None], ratios * Lsafe, domes)
    rec_full = jax.image.resize(rec_planes, (3, h, w), "bilinear")

    # remosaic: per-site reconstructed value, saturation floor at the
    # site's clip level (region.c:73-77 — only ever raise), composite
    # through the feathered per-site clip mask
    rmaskf, gmaskf, bmaskf = _bayer.color_masks(cfa, h, w, x.dtype)
    site_rec = (rec_full[0] * rmaskf + rec_full[1] * gmaskf
                + rec_full[2] * bmaskf)
    site_rec = jnp.maximum(site_rec, rec)

    # feather the per-site clip mask (5x5 box, the segmentation path's
    # seed feather — segmentation.c:52-56)
    site_clip = clips[0] * rmaskf + clips[1] * gmaskf + clips[2] * bmaskf
    m = (x > site_clip).astype(x.dtype)
    p = PaddedView(m, 2)
    row = sum(p.at(k, 0) for k in range(-2, 3)) / 5.0
    pr = PaddedView(row, 2)
    opacity = sum(pr.at(0, k) for k in range(-2, 3)) / 5.0
    opacity = jnp.clip(opacity, 0.0, 1.0)
    return opacity * site_rec + (1.0 - opacity) * rec
