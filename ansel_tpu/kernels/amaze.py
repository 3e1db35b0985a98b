"""AMaZE demosaic (Aliasing Minimization and Zipper Elimination), Bayer.

Behavioral reference: `/root/reference/src/iop/demosaic/amaze.cc`
(amaze_demosaic_RT :181-1417, E. Martinec / I. Weyrich).  Full algorithm,
re-derived as whole-image masked shifted-view math (no tiles, no
half-packed index arithmetic — the reference's `indx >> 1` arrays become
full-resolution planes valid on their CFA coset; garbage off-coset
values are never read because every tap lands on the correct coset):

  1. directional gradients dirwts0/1 + delhvsqsum          (:464-474)
  2. H/V colour differences, Hamilton-Adams + adaptive-ratio
     variants, highlight fallback, opposite-direction
     fluctuations dgintv/dginth                            (:476-582)
  3. variance-based HA/AR selection + saturation bounding  (:585-705)
  4. directional colour-difference variances -> hvwt       (:707-760)
  5. Nyquist texture test (gaussodd/gaussgrad quincunx),
     neighbour consensus, area interpolation               (:762-890)
  6. G at R/B sites + Nyquist curvature refinement         (:893-955)
  7. diagonal gradients delp/delm, Dgrbsq1p/m              (:957-981)
  8. diagonal R/B interpolation rbp/rbm, pmwt, bounding    (:983-1107)
  9. pmwt neighbour escalation, rbint                      (:1109-1126)
 10. G re-interpolation from R+B where the diagonal
     discrimination beats the cardinal one                 (:1129-1233)
 11. "fancy" diagonal chrominance interpolation of the
     missing colour difference at R/B sites                (:1237-1276)
 12. final R/B at G sites via hvwt-weighted cardinal
     colour differences                                    (:1278-1410)

Gated float-exact (<=1e-7 interior) against the scalar transcription of
the reference in tests/mirrors/amaze_ref.py — including the reference's
in-place sequential semantics: stage 3's hcd/vcd selection+bounding
(1-D dependencies -> two lax.scans) and the hvwt/pmwt neighbour
escalations (row scan), plus its half-index quirks (stage-11 p1+v2 far
taps, calloc-zero cddiffsq at G sites under the Nyquist quincunx).

Documented deviations (border-only):
  * the Nyquist consensus/area pass runs on the whole frame instead of
    the reference's bounding-box optimization (identical result inside
    the box; the >4-of-8 consensus suppresses isolated outliers
    everywhere, which the bbox short-cut only does outside it);
  * borders mirror via reflect padding instead of the reference's
    hand-rolled 16px tile aprons.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.types import CFAPattern
from ..ops import _bayer
from ..pixel.shifts import PaddedView

EPS = 1e-5
EPSSQ = 1e-10
ARTHRESH = 0.75
NYQTHRESH = 0.5
GAUSSODD = (0.14659727707323927, 0.103592713382435,
            0.0732036125103057, 0.0365543548389495)
GAUSSGRAD = tuple(NYQTHRESH * g for g in (
    0.07384411893421103, 0.06207511968171489, 0.0521818194747806,
    0.03687419286733595, 0.03099732204057846, 0.018413194161458882))
GAUSSEVEN = (0.13719494435797422, 0.05640252782101291)
GQUINC = (0.169917, 0.108947, 0.069855, 0.0287182)


def _ulim(x, y, z):
    """dt ULIM: clamp x into [min(y,z), max(y,z)] (median of three)."""
    lo = jnp.minimum(y, z)
    hi = jnp.maximum(y, z)
    return jnp.clip(x, lo, hi)


def _bound_g(cd, gint, n1, n2, c0, clip_pt):
    """green-site bounding (:618-654): cd = G - X."""
    ulim = -_ulim(gint, n1, n2) + c0
    big = 3.0 * cd > (gint + c0)
    w = 1.0 - 3.0 * cd / (EPS + gint + c0)
    bounded = jnp.where(big, ulim, w * cd + (1.0 - w) * ulim)
    cd = jnp.where(cd > 0, bounded, cd)
    return jnp.where(gint > clip_pt, ulim, cd)


def _bound_rb(cd, gint, n1, n2, c0, clip_pt):
    """R/B-site bounding (:662-698): cd = G - X, X = cfa."""
    ulim = _ulim(gint, n1, n2) - c0
    big = 3.0 * cd < -(gint + c0)
    w = 1.0 + 3.0 * cd / (EPS + gint + c0)
    bounded = jnp.where(big, ulim, w * cd + (1.0 - w) * ulim)
    cd = jnp.where(cd < 0, bounded, cd)
    return jnp.where(gint > clip_pt, ulim, cd)


def _stage3_seq(raw, alt, gmask, c0, n1, n2, clip_pt, axis: int):
    """Reference stage-3 variance selection + bounding with the C's
    in-place sequential semantics (:585-705): the selected-and-bounded
    value 2 steps back along `axis` feeds the next variance.  One
    lax.scan along that axis, vectorized over the other."""
    import jax

    def T(a):
        return a if axis == 0 else a.T

    rawT, altT = T(raw), T(alt)
    N = rawT.shape[0]

    def sh(a, k):  # shift along axis 0 (edge copies; ends masked off)
        if k < 0:
            return jnp.concatenate(
                [jnp.repeat(a[:1], -k, axis=0), a[:k]], axis=0)
        return jnp.concatenate(
            [a[k:], jnp.repeat(a[-1:], k, axis=0)], axis=0)

    xs = (rawT, altT, sh(altT, -2), sh(altT, 2), sh(rawT, 2),
          ((jnp.arange(N) >= 4) & (jnp.arange(N) < N - 4))[:, None],
          T(gmask), T(c0), T(n1), T(n2))

    def step(carry, x):
        u2, u1 = carry
        raw_i, alt_i, a_m2, a_p2, r_p2, m_i, gm, cc, nn1, nn2 = x
        var = (3.0 * (u2 * u2 + raw_i * raw_i + r_p2 * r_p2)
               - (u2 + raw_i + r_p2) ** 2)
        avar = (3.0 * (a_m2 * a_m2 + alt_i * alt_i + a_p2 * a_p2)
                - (a_m2 + alt_i + a_p2) ** 2)
        sel = jnp.where(avar < var, alt_i, raw_i)
        upd = jnp.where(
            gm, _bound_g(sel, -sel + cc, nn1, nn2, cc, clip_pt),
            _bound_rb(sel, sel + cc, nn1, nn2, cc, clip_pt))
        upd = jnp.where(m_i, upd, raw_i)
        return (u1, upd), upd

    _, out = jax.lax.scan(step, (rawT[0], rawT[0]), xs)
    return out if axis == 0 else out.T


def _escalate_rows(w, start_row: int, margin: int):
    """The reference's neighbour escalation (hvwt :899-905, pmwt
    :1113-1119) updates IN PLACE while scanning rows, so row r's
    alt-average reads the already-escalated row r-1 and the raw row
    r+1.  A lax.scan over rows reproduces that sequential semantics
    exactly; rows < start_row and columns outside [margin, W-margin)
    stay raw like the reference's loop bounds (caught by
    tests/mirrors/amaze_ref.py — the Jacobi version diverges on ~4% of
    pixels through decision cascades)."""
    import jax

    H, W = w.shape
    colm = (jnp.arange(W) >= margin) & (jnp.arange(W) < W - margin)
    w_next = jnp.concatenate([w[1:], w[-2:-1]], axis=0)  # raw row r+1

    def step(carry, inp):
        row, nxt, r = inp
        prev = carry
        pl = jnp.concatenate([prev[1:2], prev[:-1]])   # (r-1, c-1)
        pr = jnp.concatenate([prev[1:], prev[-2:-1]])  # (r-1, c+1)
        nl = jnp.concatenate([nxt[1:2], nxt[:-1]])     # (r+1, c-1)
        nr = jnp.concatenate([nxt[1:], nxt[-2:-1]])    # (r+1, c+1)
        alt = 0.25 * (pl + pr + nl + nr)
        esc = jnp.where(jnp.abs(0.5 - row) < jnp.abs(0.5 - alt),
                        alt, row)
        out = jnp.where((r >= start_row) & (r < H - start_row) & colm,
                        esc, row)
        return out, out

    _, rows = jax.lax.scan(
        step, w[0], (w, w_next, jnp.arange(H)))
    return rows


def amaze_demosaic(x: jnp.ndarray, cfa: CFAPattern,
                   scaler=None) -> jnp.ndarray:
    """(H, W) Bayer mosaic -> (3, H, W).  `scaler` = max processed
    maximum (values normalized to ~[0,1] like the reference's input;
    clip_pt = min/max processed maximum after that normalization is
    approximated by 1.0 — dt feeds AMaZE 0..1 data, amaze.cc:191)."""
    H, W = x.shape
    dt = x.dtype
    if scaler is not None:
        x = x / jnp.asarray(scaler, dt)
    clip_pt = 1.0
    clip_pt8 = 0.8 * clip_pt

    rmask, gmaskf, bmask = _bayer.color_masks(cfa, H, W, dt)
    gmask = gmaskf > 0
    rb_mask = ~gmask

    c = PaddedView(x, 8, mode="reflect")
    c0 = x

    # ---- 1. gradients (:464-474)
    delh = jnp.abs(c.at(0, 1) - c.at(0, -1))
    delv = jnp.abs(c.at(1, 0) - c.at(-1, 0))
    dirwts0 = EPS + jnp.abs(c.at(2, 0) - c0) + jnp.abs(c0 - c.at(-2, 0)) \
        + delv
    dirwts1 = EPS + jnp.abs(c.at(0, 2) - c0) + jnp.abs(c0 - c.at(0, -2)) \
        + delh
    delhvsqsum = delh * delh + delv * delv
    d0 = PaddedView(dirwts0, 4, mode="reflect")
    d1 = PaddedView(dirwts1, 4, mode="reflect")

    # ---- 2. H/V colour differences (:476-582)
    def ratio(num_nb, w_far, w_self, far_nb):
        return num_nb * (w_far + w_self) \
            / (w_far * (EPS + c0) + w_self * (EPS + far_nb))

    cru = ratio(c.at(-1, 0), d0.at(-2, 0), dirwts0, c.at(-2, 0))
    crd = ratio(c.at(1, 0), d0.at(2, 0), dirwts0, c.at(2, 0))
    crl = ratio(c.at(0, -1), d1.at(0, -2), dirwts1, c.at(0, -2))
    crr = ratio(c.at(0, 1), d1.at(0, 2), dirwts1, c.at(0, 2))

    guha = c.at(-1, 0) + 0.5 * (c0 - c.at(-2, 0))
    gdha = c.at(1, 0) + 0.5 * (c0 - c.at(2, 0))
    glha = c.at(0, -1) + 0.5 * (c0 - c.at(0, -2))
    grha = c.at(0, 1) + 0.5 * (c0 - c.at(0, 2))

    def adaptive(cr, ha):
        return jnp.where(jnp.abs(1.0 - cr) < ARTHRESH, c0 * cr, ha)

    guar, gdar = adaptive(cru, guha), adaptive(crd, gdha)
    glar, grar = adaptive(crl, glha), adaptive(crr, grha)

    hwt = d1.at(0, -1) / (d1.at(0, -1) + d1.at(0, 1))
    vwt = d0.at(-1, 0) / (d0.at(1, 0) + d0.at(-1, 0))

    gintv_ha = vwt * gdha + (1.0 - vwt) * guha
    ginth_ha = hwt * grha + (1.0 - hwt) * glha
    gintv_ar = vwt * gdar + (1.0 - vwt) * guar
    ginth_ar = hwt * grar + (1.0 - hwt) * glar

    sgn = jnp.where(gmask, 1.0, -1.0).astype(dt)
    vcd = sgn * (c0 - gintv_ar)
    hcd = sgn * (c0 - ginth_ar)
    vcdalt = sgn * (c0 - gintv_ha)
    hcdalt = sgn * (c0 - ginth_ha)

    hi_clip = (c0 > clip_pt8) | (gintv_ha > clip_pt8) \
        | (ginth_ha > clip_pt8)
    vcd = jnp.where(hi_clip, vcdalt, vcd)
    hcd = jnp.where(hi_clip, hcdalt, hcd)
    sq_v_ha = (guha - gdha) ** 2
    sq_h_ha = (glha - grha) ** 2
    dgintv = jnp.minimum(sq_v_ha, jnp.where(hi_clip, sq_v_ha,
                                            (guar - gdar) ** 2))
    dginth = jnp.minimum(sq_h_ha, jnp.where(hi_clip, sq_h_ha,
                                            (glar - grar) ** 2))

    # ---- 3. variance selection + saturation bounding (:585-705)
    # The reference updates hcd/vcd IN PLACE while scanning row-major,
    # so each pixel's 3-tap variance reads the already-selected-and-
    # bounded value 2 columns back (hcd) / 2 rows up (vcd).  The two
    # dependencies are each one-dimensional, so two lax.scans reproduce
    # the sequential semantics exactly — vectorized over the other axis
    # (caught by tests/mirrors/amaze_ref.py; the former Jacobi
    # evaluation was a documented deviation, now gone).
    cN, cS = c.at(-1, 0), c.at(1, 0)
    cW, cE = c.at(0, -1), c.at(0, 1)
    hcd = _stage3_seq(hcd, hcdalt, gmask, c0, cW, cE, clip_pt, axis=1)
    vcd = _stage3_seq(vcd, vcdalt, gmask, c0, cN, cS, clip_pt, axis=0)
    # the reference writes cddiffsq ONLY in the R/B branch (:699), so
    # the G sites stay calloc-ZERO and the Nyquist quincunx taps at
    # (+-1, +-1) sum zeros — zero the G sites to match exactly
    # (caught by tests/mirrors/amaze_ref.py)
    cddiffsq = jnp.where(rb_mask, (vcd - hcd) ** 2, 0.0)

    # ---- 4. hvwt at R/B sites (:707-760)
    vp = PaddedView(vcd, 4, mode="reflect")
    hp = PaddedView(hcd, 4, mode="reflect")
    uave = vcd + vp.at(-1, 0) + vp.at(-2, 0) + vp.at(-3, 0)
    dave = vcd + vp.at(1, 0) + vp.at(2, 0) + vp.at(3, 0)
    lave = hcd + hp.at(0, -1) + hp.at(0, -2) + hp.at(0, -3)
    rave = hcd + hp.at(0, 1) + hp.at(0, 2) + hp.at(0, 3)

    def var4(v0, v1_, v2_, v3_, ave):
        return ((v0 - ave) ** 2 + (v1_ - ave) ** 2 + (v2_ - ave) ** 2
                + (v3_ - ave) ** 2)

    dgvu = var4(vcd, vp.at(-1, 0), vp.at(-2, 0), vp.at(-3, 0), uave)
    dgvd = var4(vcd, vp.at(1, 0), vp.at(2, 0), vp.at(3, 0), dave)
    dghl = var4(hcd, hp.at(0, -1), hp.at(0, -2), hp.at(0, -3), lave)
    dghr = var4(hcd, hp.at(0, 1), hp.at(0, 2), hp.at(0, 3), rave)
    vcdvar2 = EPSSQ + vwt * dgvd + (1.0 - vwt) * dgvu
    hcdvar2 = EPSSQ + hwt * dghr + (1.0 - hwt) * dghl

    gi_v = PaddedView(dgintv, 2, mode="reflect")
    gi_h = PaddedView(dginth, 2, mode="reflect")
    fvu = dgintv + gi_v.at(-1, 0) + gi_v.at(-2, 0)
    fvd = dgintv + gi_v.at(1, 0) + gi_v.at(2, 0)
    fhl = dginth + gi_h.at(0, -1) + gi_h.at(0, -2)
    fhr = dginth + gi_h.at(0, 1) + gi_h.at(0, 2)
    vcdvar1 = EPSSQ + vwt * fvd + (1.0 - vwt) * fvu
    hcdvar1 = EPSSQ + hwt * fhr + (1.0 - hwt) * fhl

    varwt = hcdvar2 / (vcdvar2 + hcdvar2)
    diffwt = hcdvar1 / (vcdvar1 + hcdvar1)
    agree = ((0.5 - varwt) * (0.5 - diffwt) > 0) \
        & (jnp.abs(0.5 - diffwt) < jnp.abs(0.5 - varwt))
    hvwt = jnp.where(agree, varwt, diffwt)

    # ---- 5. Nyquist test (:762-890)
    cd = PaddedView(cddiffsq, 4, mode="reflect")
    dh = PaddedView(delhvsqsum, 4, mode="reflect")
    nyqutest = (
        GAUSSODD[0] * cddiffsq
        + GAUSSODD[1] * (cd.at(-1, -1) + cd.at(-1, 1)
                         + cd.at(1, -1) + cd.at(1, 1))
        + GAUSSODD[2] * (cd.at(-2, 0) + cd.at(0, -2)
                         + cd.at(0, 2) + cd.at(2, 0))
        + GAUSSODD[3] * (cd.at(-2, -2) + cd.at(-2, 2)
                         + cd.at(2, -2) + cd.at(2, 2))
    ) - (
        GAUSSGRAD[0] * delhvsqsum
        + GAUSSGRAD[1] * (dh.at(-1, 0) + dh.at(0, 1)
                          + dh.at(0, -1) + dh.at(1, 0))
        + GAUSSGRAD[2] * (dh.at(-1, -1) + dh.at(-1, 1)
                          + dh.at(1, -1) + dh.at(1, 1))
        + GAUSSGRAD[3] * (dh.at(-2, 0) + dh.at(0, -2)
                          + dh.at(0, 2) + dh.at(2, 0))
        + GAUSSGRAD[4] * (dh.at(-2, -1) + dh.at(-2, 1)
                          + dh.at(-1, -2) + dh.at(-1, 2)
                          + dh.at(1, -2) + dh.at(1, 2)
                          + dh.at(2, -1) + dh.at(2, 1))
        + GAUSSGRAD[5] * (dh.at(-2, -2) + dh.at(-2, 2)
                          + dh.at(2, -2) + dh.at(2, 2))
    )
    nyquist = ((nyqutest > 0.0) & rb_mask).astype(dt)
    ny = PaddedView(nyquist, 2, mode="reflect")
    consensus = (ny.at(-2, 0) + ny.at(-1, -1) + ny.at(-1, 1)
                 + ny.at(0, -2) + ny.at(0, 2) + ny.at(1, -1)
                 + ny.at(1, 1) + ny.at(2, 0))
    nyquist2 = jnp.where(
        consensus > 4, 1.0,
        jnp.where(consensus < 4, 0.0, nyquist)) * rb_mask

    # area interpolation over the 7x7 same-coset window (:856-885)
    n2 = PaddedView(nyquist2, 6, mode="reflect")
    sumcfa = jnp.zeros_like(c0)
    sumh = jnp.zeros_like(c0)
    sumv = jnp.zeros_like(c0)
    sumsqh = jnp.zeros_like(c0)
    sumsqv = jnp.zeros_like(c0)
    areawt = jnp.zeros_like(c0)
    cpad = PaddedView(x, 8, mode="reflect")
    for i in range(-6, 7, 2):
        for j in range(-6, 7, 2):
            sel = n2.at(i, j)
            cc_ = cpad.at(i, j)
            chl = cpad.at(i, j - 1)
            chr_ = cpad.at(i, j + 1)
            cvu = cpad.at(i - 1, j)
            cvd = cpad.at(i + 1, j)
            sumcfa += sel * cc_
            sumh += sel * (chl + chr_)
            sumv += sel * (cvu + cvd)
            sumsqh += sel * ((cc_ - chl) ** 2 + (cc_ - chr_) ** 2)
            sumsqv += sel * ((cc_ - cvu) ** 2 + (cc_ - cvd) ** 2)
            areawt += sel
    sumh = sumcfa - 0.5 * sumh
    sumv = sumcfa - 0.5 * sumv
    areawt = 0.5 * areawt
    hcdvar_a = EPSSQ + jnp.abs(areawt * sumsqh - sumh * sumh)
    vcdvar_a = EPSSQ + jnp.abs(areawt * sumsqv - sumv * sumv)
    hvwt = jnp.where(nyquist2 > 0, hcdvar_a / (vcdvar_a + hcdvar_a),
                     hvwt)

    # ---- 6. G at R/B sites (+ Nyquist curvature refinement, :893-955)
    # sequential (scan) escalation: the reference updates hvwt in place
    hvwt = _escalate_rows(hvwt, 8, 8)
    dgrb0 = hvwt * vcd + (1.0 - hvwt) * hcd
    rgbgreen = jnp.where(rb_mask, c0 + dgrb0, c0)

    g = PaddedView(rgbgreen, 2, mode="reflect")
    dgrb2h = jnp.where(
        nyquist2 > 0,
        (rgbgreen - 0.5 * (g.at(0, -1) + g.at(0, 1))) ** 2, 0.0)
    dgrb2v = jnp.where(
        nyquist2 > 0,
        (rgbgreen - 0.5 * (g.at(-1, 0) + g.at(1, 0))) ** 2, 0.0)
    d2h = PaddedView(dgrb2h, 4, mode="reflect")
    d2v = PaddedView(dgrb2v, 4, mode="reflect")

    def gquinc_sum(p):
        return (GQUINC[0] * p.at(0, 0)
                + GQUINC[1] * (p.at(-1, -1) + p.at(-1, 1)
                               + p.at(1, -1) + p.at(1, 1))
                + GQUINC[2] * (p.at(-2, 0) + p.at(0, -2)
                               + p.at(0, 2) + p.at(2, 0))
                + GQUINC[3] * (p.at(-2, -2) + p.at(-2, 2)
                               + p.at(2, -2) + p.at(2, 2)))

    gvarh = EPSSQ + gquinc_sum(d2h)
    gvarv = EPSSQ + gquinc_sum(d2v)
    dgrb0_ny = (hcd * gvarv + vcd * gvarh) / (gvarv + gvarh)
    dgrb0 = jnp.where(nyquist2 > 0, dgrb0_ny, dgrb0)
    rgbgreen = jnp.where(rb_mask, c0 + dgrb0, c0)

    # ---- 7. diagonal gradients (:957-981)
    delp = jnp.abs(c.at(-1, 1) - c.at(1, -1))        # at R/B sites
    delm = jnp.abs(c.at(1, 1) - c.at(-1, -1))
    dgrbsq1p = (c0 - c.at(1, -1)) ** 2 + (c0 - c.at(-1, 1)) ** 2  # at G
    dgrbsq1m = (c0 - c.at(-1, -1)) ** 2 + (c0 - c.at(1, 1)) ** 2

    # ---- 8. diagonal R/B interpolation at R/B sites (:983-1107)
    crse = 2.0 * c.at(1, 1) / (EPS + c0 + c.at(2, 2))
    crnw = 2.0 * c.at(-1, -1) / (EPS + c0 + c.at(-2, -2))
    crne = 2.0 * c.at(-1, 1) / (EPS + c0 + c.at(-2, 2))
    crsw = 2.0 * c.at(1, -1) / (EPS + c0 + c.at(2, -2))
    rbse = jnp.where(jnp.abs(1.0 - crse) < ARTHRESH, c0 * crse,
                     c.at(1, 1) + 0.5 * (c0 - c.at(2, 2)))
    rbnw = jnp.where(jnp.abs(1.0 - crnw) < ARTHRESH, c0 * crnw,
                     c.at(-1, -1) + 0.5 * (c0 - c.at(-2, -2)))
    rbne = jnp.where(jnp.abs(1.0 - crne) < ARTHRESH, c0 * crne,
                     c.at(-1, 1) + 0.5 * (c0 - c.at(-2, 2)))
    rbsw = jnp.where(jnp.abs(1.0 - crsw) < ARTHRESH, c0 * crsw,
                     c.at(1, -1) + 0.5 * (c0 - c.at(2, -2)))

    dp = PaddedView(delp, 2, mode="reflect")
    dm = PaddedView(delm, 2, mode="reflect")
    wtse = EPS + delm + dm.at(1, 1) + dm.at(2, 2)
    wtnw = EPS + delm + dm.at(-1, -1) + dm.at(-2, -2)
    wtne = EPS + delp + dp.at(-1, 1) + dp.at(-2, 2)
    wtsw = EPS + delp + dp.at(1, -1) + dp.at(2, -2)
    rbm_ = (wtse * rbnw + wtnw * rbse) / (wtse + wtnw)
    rbp_ = (wtne * rbsw + wtsw * rbne) / (wtne + wtsw)

    q1p = PaddedView(dgrbsq1p, 3, mode="reflect")
    q1m = PaddedView(dgrbsq1m, 3, mode="reflect")

    def diagvar(q):
        return (GAUSSEVEN[0] * (q.at(-1, 0) + q.at(0, -1)
                                + q.at(0, 1) + q.at(1, 0))
                + GAUSSEVEN[1] * (q.at(-2, -1) + q.at(-2, 1)
                                  + q.at(-1, -2) + q.at(-1, 2)
                                  + q.at(1, -2) + q.at(1, 2)
                                  + q.at(2, -1) + q.at(2, 1)))

    rbvarm = EPSSQ + diagvar(q1m)
    pmwt = rbvarm / ((EPSSQ + diagvar(q1p)) + rbvarm)

    def bound_diag(rb, n1, n2):
        """(:1069-1105): only lowers estimates below cfa / above clip."""
        ulim = _ulim(rb, n1, n2)
        w = 2.0 * (c0 - rb) / (EPS + rb + c0)
        low = jnp.where(2.0 * rb < c0, ulim, w * rb + (1.0 - w) * ulim)
        rb = jnp.where(rb < c0, low, rb)
        return jnp.where(rb > clip_pt, ulim, rb)

    rbp_ = bound_diag(rbp_, c.at(-1, 1), c.at(1, -1))
    rbm_ = bound_diag(rbm_, c.at(-1, -1), c.at(1, 1))

    # ---- 9. pmwt escalation + rbint (:1109-1126)
    # sequential (scan) escalation like hvwt's (:1113-1119)
    pmwt = _escalate_rows(pmwt, 10, 10)
    rbint = 0.5 * (c0 + rbm_ * (1.0 - pmwt) + rbp_ * pmwt)

    # ---- 10. G re-interpolation from R+B (:1129-1233)
    ri = PaddedView(rbint, 2, mode="reflect")
    cru2 = cN * 2.0 / (EPS + rbint + ri.at(-2, 0))
    crd2 = cS * 2.0 / (EPS + rbint + ri.at(2, 0))
    crl2 = cW * 2.0 / (EPS + rbint + ri.at(0, -2))
    crr2 = cE * 2.0 / (EPS + rbint + ri.at(0, 2))
    gu2 = jnp.where(jnp.abs(1.0 - cru2) < ARTHRESH, rbint * cru2,
                    cN + 0.5 * (rbint - ri.at(-2, 0)))
    gd2 = jnp.where(jnp.abs(1.0 - crd2) < ARTHRESH, rbint * crd2,
                    cS + 0.5 * (rbint - ri.at(2, 0)))
    gl2 = jnp.where(jnp.abs(1.0 - crl2) < ARTHRESH, rbint * crl2,
                    cW + 0.5 * (rbint - ri.at(0, -2)))
    gr2 = jnp.where(jnp.abs(1.0 - crr2) < ARTHRESH, rbint * crr2,
                    cE + 0.5 * (rbint - ri.at(0, 2)))
    gintv2 = (d0.at(-1, 0) * gd2 + d0.at(1, 0) * gu2) \
        / (d0.at(1, 0) + d0.at(-1, 0))
    ginth2 = (d1.at(0, -1) * gr2 + d1.at(0, 1) * gl2) \
        / (d1.at(0, -1) + d1.at(0, 1))

    def bound_g2(gint, n1, n2):
        ulim = _ulim(gint, n1, n2)
        w = 2.0 * (rbint - gint) / (EPS + gint + rbint)
        low = jnp.where(2.0 * gint < rbint, ulim,
                        w * gint + (1.0 - w) * ulim)
        gint = jnp.where(gint < rbint, low, gint)
        return jnp.where(gint > clip_pt, ulim, gint)

    gintv2 = bound_g2(gintv2, cN, cS)
    ginth2 = bound_g2(ginth2, cW, cE)
    g_diag = ginth2 * (1.0 - hvwt) + gintv2 * hvwt
    use_diag = (jnp.abs(0.5 - pmwt) >= jnp.abs(0.5 - hvwt)) & rb_mask
    rgbgreen = jnp.where(use_diag, g_diag, rgbgreen)
    dgrb0 = jnp.where(use_diag, rgbgreen - c0, dgrb0)

    # ---- 11. fancy chrominance interpolation (:1237-1276)
    # split: dgrb0 = G-R (valid at R), dgrb1 = G-B (valid at B)
    dgrb1 = jnp.where(bmask > 0, dgrb0, 0.0)
    dgrb0 = jnp.where(rmask > 0, dgrb0, 0.0)

    def fancy(dsrc):
        """Interpolate a colour difference at the opposite coset from
        its 4 diagonal neighbours (all on the source coset)."""
        d = PaddedView(dsrc, 5, mode="reflect")
        nw1, ne1 = d.at(-1, -1), d.at(-1, 1)
        sw1, se1 = d.at(1, -1), d.at(1, 1)
        nw3, ne3 = d.at(-3, -3), d.at(-3, 3)
        sw3, se3 = d.at(3, -3), d.at(3, 3)
        wtnw = 1.0 / (EPS + jnp.abs(nw1 - se1) + jnp.abs(nw1 - nw3)
                      + jnp.abs(se1 - nw3))
        wtne = 1.0 / (EPS + jnp.abs(ne1 - sw1) + jnp.abs(ne1 - ne3)
                      + jnp.abs(sw1 - ne3))
        # sw/se arms cross-reference the opposite far taps (amaze.cc
        # :1256-1261 — kept exactly, quirk and all)
        wtsw = 1.0 / (EPS + jnp.abs(sw1 - ne1) + jnp.abs(sw1 - se3)
                      + jnp.abs(ne1 - sw3))
        wtse = 1.0 / (EPS + jnp.abs(se1 - nw1) + jnp.abs(se1 - sw3)
                      + jnp.abs(nw1 - se3))
        # NB the reference's NE/SW 4th taps are (indx+p1+v2)>>1 and
        # (indx-p1-v2)>>1 = the 1-away SE/NW neighbours (p1+v2 == m1),
        # NOT the symmetric (-3,+1)/(+3,-1) — upstream RT quirk, kept
        # verbatim (caught by tests/mirrors/amaze_ref.py)
        est = (wtnw * (1.325 * nw1 - 0.175 * nw3
                       - 0.075 * d.at(-1, -3) - 0.075 * d.at(-3, -1))
               + wtne * (1.325 * ne1 - 0.175 * ne3
                         - 0.075 * d.at(-1, 3) - 0.075 * se1)
               + wtsw * (1.325 * sw1 - 0.175 * sw3
                         - 0.075 * d.at(1, -3) - 0.075 * nw1)
               + wtse * (1.325 * se1 - 0.175 * se3
                         - 0.075 * d.at(1, 3) - 0.075 * d.at(3, 1))) \
            / (wtnw + wtne + wtsw + wtse)
        return est

    dgrb1 = jnp.where(rmask > 0, fancy(dgrb1), dgrb1)   # G-B at R sites
    dgrb0 = jnp.where(bmask > 0, fancy(dgrb0), dgrb0)   # G-R at B sites

    # ---- 12. final R/B at G sites (:1278-1410)
    hwp = PaddedView(hvwt, 1, mode="reflect")
    wN, wS = hwp.at(-1, 0), hwp.at(1, 0)
    wE, wW = hwp.at(0, 1), hwp.at(0, -1)
    temp = 1.0 / (wN + 2.0 - wE - wW + wS)

    def at_green(dsrc):
        d = PaddedView(dsrc, 1, mode="reflect")
        return (wN * d.at(-1, 0) + (1.0 - wE) * d.at(0, 1)
                + (1.0 - wW) * d.at(0, -1) + wS * d.at(1, 0)) * temp

    R = jnp.where(gmask, rgbgreen - at_green(dgrb0), rgbgreen - dgrb0)
    B = jnp.where(gmask, rgbgreen - at_green(dgrb1), rgbgreen - dgrb1)

    out = jnp.stack([R, rgbgreen, B])
    out = jnp.clip(jnp.nan_to_num(out, nan=0.5 * clip_pt), 0.0, 1.0)
    if scaler is not None:
        out = out * jnp.asarray(scaler, dt)
    return out
