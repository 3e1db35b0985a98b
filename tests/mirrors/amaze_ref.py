"""NumPy mirror of the reference AMaZE demosaic interior math.

Transcribed (structure, not code) from
`/root/reference/src/iop/demosaic/amaze.cc` amaze_demosaic_RT :181-1417
(E. Martinec / I. Weyrich via RawTherapee): the full 12-stage pipeline —
gradients, H/V colour differences (Hamilton-Adams + adaptive ratios),
variance selection + saturation bounding, hvwt, Nyquist test/consensus/
area interpolation, G at R/B + curvature refinement, diagonal R/B
(rbp/rbm/pmwt) + G re-interpolation from R+B, fancy chrominance, and the
final hvwt-weighted R/B at G sites.

Whole image as ONE tile, no 16px aprons (the reference reflects image
borders into them; here borders are simply invalid — compare interiors
>= 18 px).  Scalar loops on purpose — unambiguous, test-only.

`sequential=True` reproduces the reference's in-place stage-3 update
(later pixels read already-bounded hcd/vcd of the same row);
`sequential=False` evaluates it Jacobi-style from the pre-update values,
which is kernels/amaze.py's documented deviation — comparing both
quantifies that deviation directly.
"""

import numpy as np

EPS = np.float32(1e-5)
EPSSQ = np.float32(1e-10)
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
    lo, hi = (y, z) if y < z else (z, y)
    return min(max(x, lo), hi)


def _intp(a, b, c):
    return a * (b - c) + c


def amaze_ref(cfa_in, fc, clip_pt=1.0, sequential=True,
              return_stages=False):
    """cfa_in: (H, W) mosaic scaled to [0, 1]; fc(r, c) -> 0/1/2.
    -> (3, H, W) float32 (or (rgb, stages) with return_stages)."""
    H, W = cfa_in.shape
    f32 = np.float32
    cfa = np.clip(cfa_in, 0.0, None).astype(np.float32)
    clip_pt = f32(clip_pt)
    clip_pt8 = f32(0.8) * clip_pt
    green = cfa.copy()

    dirwts0 = np.zeros((H, W), f32)
    dirwts1 = np.zeros((H, W), f32)
    delhvsqsum = np.zeros((H, W), f32)
    # stage 1: gradients (:464-474)
    for r in range(2, H - 2):
        for c in range(2, W - 2):
            delh = abs(cfa[r, c + 1] - cfa[r, c - 1])
            delv = abs(cfa[r + 1, c] - cfa[r - 1, c])
            dirwts0[r, c] = (EPS + abs(cfa[r + 2, c] - cfa[r, c])
                             + abs(cfa[r, c] - cfa[r - 2, c]) + delv)
            dirwts1[r, c] = (EPS + abs(cfa[r, c + 2] - cfa[r, c])
                             + abs(cfa[r, c] - cfa[r, c - 2]) + delh)
            delhvsqsum[r, c] = delh * delh + delv * delv

    vcd = np.zeros((H, W), f32)
    hcd = np.zeros((H, W), f32)
    vcdalt = np.zeros((H, W), f32)
    hcdalt = np.zeros((H, W), f32)
    dgintv = np.zeros((H, W), f32)
    dginth = np.zeros((H, W), f32)
    # stage 2: H/V colour differences (:476-582)
    for r in range(4, H - 4):
        for c in range(4, W - 4):
            x = cfa[r, c]
            cru = cfa[r - 1, c] * (dirwts0[r - 2, c] + dirwts0[r, c]) / (
                dirwts0[r - 2, c] * (EPS + x)
                + dirwts0[r, c] * (EPS + cfa[r - 2, c]))
            crd = cfa[r + 1, c] * (dirwts0[r + 2, c] + dirwts0[r, c]) / (
                dirwts0[r + 2, c] * (EPS + x)
                + dirwts0[r, c] * (EPS + cfa[r + 2, c]))
            crl = cfa[r, c - 1] * (dirwts1[r, c - 2] + dirwts1[r, c]) / (
                dirwts1[r, c - 2] * (EPS + x)
                + dirwts1[r, c] * (EPS + cfa[r, c - 2]))
            crr = cfa[r, c + 1] * (dirwts1[r, c + 2] + dirwts1[r, c]) / (
                dirwts1[r, c + 2] * (EPS + x)
                + dirwts1[r, c] * (EPS + cfa[r, c + 2]))

            guha = cfa[r - 1, c] + f32(0.5) * (x - cfa[r - 2, c])
            gdha = cfa[r + 1, c] + f32(0.5) * (x - cfa[r + 2, c])
            glha = cfa[r, c - 1] + f32(0.5) * (x - cfa[r, c - 2])
            grha = cfa[r, c + 1] + f32(0.5) * (x - cfa[r, c + 2])

            guar = x * cru if abs(1.0 - cru) < ARTHRESH else guha
            gdar = x * crd if abs(1.0 - crd) < ARTHRESH else gdha
            glar = x * crl if abs(1.0 - crl) < ARTHRESH else glha
            grar = x * crr if abs(1.0 - crr) < ARTHRESH else grha

            hwt = dirwts1[r, c - 1] / (dirwts1[r, c - 1]
                                       + dirwts1[r, c + 1])
            vwt = dirwts0[r - 1, c] / (dirwts0[r + 1, c]
                                       + dirwts0[r - 1, c])

            Gintvha = vwt * gdha + (f32(1.0) - vwt) * guha
            Ginthha = hwt * grha + (f32(1.0) - hwt) * glha

            if fc(r, c) & 1:  # G site
                vcd[r, c] = x - (vwt * gdar + (f32(1.0) - vwt) * guar)
                hcd[r, c] = x - (hwt * grar + (f32(1.0) - hwt) * glar)
                vcdalt[r, c] = x - Gintvha
                hcdalt[r, c] = x - Ginthha
            else:
                vcd[r, c] = (vwt * gdar + (f32(1.0) - vwt) * guar) - x
                hcd[r, c] = (hwt * grar + (f32(1.0) - hwt) * glar) - x
                vcdalt[r, c] = Gintvha - x
                hcdalt[r, c] = Ginthha - x

            if x > clip_pt8 or Gintvha > clip_pt8 or Ginthha > clip_pt8:
                guar, gdar, glar, grar = guha, gdha, glha, grha
                vcd[r, c] = vcdalt[r, c]
                hcd[r, c] = hcdalt[r, c]

            dgintv[r, c] = min((guha - gdha) ** 2, (guar - gdar) ** 2)
            dginth[r, c] = min((glha - grha) ** 2, (glar - grar) ** 2)

    # stage 3: variance-based HA/AR selection + bounding (:585-705)
    cddiffsq = np.zeros((H, W), f32)
    hcd_src = hcd if sequential else hcd.copy()
    vcd_src = vcd if sequential else vcd.copy()
    for r in range(4, H - 4):
        for c in range(4, W - 4):
            hv = (f32(3.0) * (hcd_src[r, c - 2] ** 2 + hcd_src[r, c] ** 2
                              + hcd_src[r, c + 2] ** 2)
                  - (hcd_src[r, c - 2] + hcd_src[r, c]
                     + hcd_src[r, c + 2]) ** 2)
            hav = (f32(3.0) * (hcdalt[r, c - 2] ** 2 + hcdalt[r, c] ** 2
                               + hcdalt[r, c + 2] ** 2)
                   - (hcdalt[r, c - 2] + hcdalt[r, c]
                      + hcdalt[r, c + 2]) ** 2)
            vv = (f32(3.0) * (vcd_src[r - 2, c] ** 2 + vcd_src[r, c] ** 2
                              + vcd_src[r + 2, c] ** 2)
                  - (vcd_src[r - 2, c] + vcd_src[r, c]
                     + vcd_src[r + 2, c]) ** 2)
            vav = (f32(3.0) * (vcdalt[r - 2, c] ** 2 + vcdalt[r, c] ** 2
                               + vcdalt[r + 2, c] ** 2)
                   - (vcdalt[r - 2, c] + vcdalt[r, c]
                      + vcdalt[r + 2, c]) ** 2)
            if hav < hv:
                hcd[r, c] = hcdalt[r, c]
            if vav < vv:
                vcd[r, c] = vcdalt[r, c]

            x = cfa[r, c]
            if fc(r, c) & 1:  # G site
                Ginth = -hcd[r, c] + x
                Gintv = -vcd[r, c] + x
                if hcd[r, c] > 0:
                    if f32(3.0) * hcd[r, c] > (Ginth + x):
                        hcd[r, c] = -_ulim(Ginth, cfa[r, c - 1],
                                           cfa[r, c + 1]) + x
                    else:
                        hwt = (f32(1.0) - f32(3.0) * hcd[r, c]
                               / (EPS + Ginth + x))
                        hcd[r, c] = (hwt * hcd[r, c] + (f32(1.0) - hwt)
                                     * (-_ulim(Ginth, cfa[r, c - 1],
                                               cfa[r, c + 1]) + x))
                if vcd[r, c] > 0:
                    if f32(3.0) * vcd[r, c] > (Gintv + x):
                        vcd[r, c] = -_ulim(Gintv, cfa[r - 1, c],
                                           cfa[r + 1, c]) + x
                    else:
                        vwt = (f32(1.0) - f32(3.0) * vcd[r, c]
                               / (EPS + Gintv + x))
                        vcd[r, c] = (vwt * vcd[r, c] + (f32(1.0) - vwt)
                                     * (-_ulim(Gintv, cfa[r - 1, c],
                                               cfa[r + 1, c]) + x))
                if Ginth > clip_pt:
                    hcd[r, c] = -_ulim(Ginth, cfa[r, c - 1],
                                       cfa[r, c + 1]) + x
                if Gintv > clip_pt:
                    vcd[r, c] = -_ulim(Gintv, cfa[r - 1, c],
                                       cfa[r + 1, c]) + x
            else:  # R/B site
                Ginth = hcd[r, c] + x
                Gintv = vcd[r, c] + x
                if hcd[r, c] < 0:
                    if f32(3.0) * hcd[r, c] < -(Ginth + x):
                        hcd[r, c] = _ulim(Ginth, cfa[r, c - 1],
                                          cfa[r, c + 1]) - x
                    else:
                        hwt = (f32(1.0) + f32(3.0) * hcd[r, c]
                               / (EPS + Ginth + x))
                        hcd[r, c] = (hwt * hcd[r, c] + (f32(1.0) - hwt)
                                     * (_ulim(Ginth, cfa[r, c - 1],
                                              cfa[r, c + 1]) - x))
                if vcd[r, c] < 0:
                    if f32(3.0) * vcd[r, c] < -(Gintv + x):
                        vcd[r, c] = _ulim(Gintv, cfa[r - 1, c],
                                          cfa[r + 1, c]) - x
                    else:
                        vwt = (f32(1.0) + f32(3.0) * vcd[r, c]
                               / (EPS + Gintv + x))
                        vcd[r, c] = (vwt * vcd[r, c] + (f32(1.0) - vwt)
                                     * (_ulim(Gintv, cfa[r - 1, c],
                                              cfa[r + 1, c]) - x))
                if Ginth > clip_pt:
                    hcd[r, c] = _ulim(Ginth, cfa[r, c - 1],
                                      cfa[r, c + 1]) - x
                if Gintv > clip_pt:
                    vcd[r, c] = _ulim(Gintv, cfa[r - 1, c],
                                      cfa[r + 1, c]) - x
                cddiffsq[r, c] = (vcd[r, c] - hcd[r, c]) ** 2

    # stage 4: directional colour-difference variances -> hvwt (:707-760)
    hvwt = np.zeros((H, W), f32)   # R/B coset only
    for r in range(6, H - 6):
        c0 = 6 + (fc(r, 2) & 1)
        for c in range(c0, W - 6, 2):
            uave = vcd[r, c] + vcd[r - 1, c] + vcd[r - 2, c] + vcd[r - 3, c]
            dave = vcd[r, c] + vcd[r + 1, c] + vcd[r + 2, c] + vcd[r + 3, c]
            lave = hcd[r, c] + hcd[r, c - 1] + hcd[r, c - 2] + hcd[r, c - 3]
            rave = hcd[r, c] + hcd[r, c + 1] + hcd[r, c + 2] + hcd[r, c + 3]
            vvu = ((vcd[r, c] - uave) ** 2 + (vcd[r - 1, c] - uave) ** 2
                   + (vcd[r - 2, c] - uave) ** 2
                   + (vcd[r - 3, c] - uave) ** 2)
            vvd = ((vcd[r, c] - dave) ** 2 + (vcd[r + 1, c] - dave) ** 2
                   + (vcd[r + 2, c] - dave) ** 2
                   + (vcd[r + 3, c] - dave) ** 2)
            hvl = ((hcd[r, c] - lave) ** 2 + (hcd[r, c - 1] - lave) ** 2
                   + (hcd[r, c - 2] - lave) ** 2
                   + (hcd[r, c - 3] - lave) ** 2)
            hvr = ((hcd[r, c] - rave) ** 2 + (hcd[r, c + 1] - rave) ** 2
                   + (hcd[r, c + 2] - rave) ** 2
                   + (hcd[r, c + 3] - rave) ** 2)
            hwt = dirwts1[r, c - 1] / (dirwts1[r, c - 1]
                                       + dirwts1[r, c + 1])
            vwt = dirwts0[r - 1, c] / (dirwts0[r + 1, c]
                                       + dirwts0[r - 1, c])
            vcdvar = EPSSQ + vwt * vvd + (f32(1.0) - vwt) * vvu
            hcdvar = EPSSQ + hwt * hvr + (f32(1.0) - hwt) * hvl
            vvu = dgintv[r, c] + dgintv[r - 1, c] + dgintv[r - 2, c]
            vvd = dgintv[r, c] + dgintv[r + 1, c] + dgintv[r + 2, c]
            hvl = dginth[r, c] + dginth[r, c - 1] + dginth[r, c - 2]
            hvr = dginth[r, c] + dginth[r, c + 1] + dginth[r, c + 2]
            vcdvar1 = EPSSQ + vwt * vvd + (f32(1.0) - vwt) * vvu
            hcdvar1 = EPSSQ + hwt * hvr + (f32(1.0) - hwt) * hvl
            varwt = hcdvar / (vcdvar + hcdvar)
            diffwt = hcdvar1 / (vcdvar1 + hcdvar1)
            if ((0.5 - varwt) * (0.5 - diffwt) > 0
                    and abs(0.5 - diffwt) < abs(0.5 - varwt)):
                hvwt[r, c] = varwt
            else:
                hvwt[r, c] = diffwt

    # stage 5: Nyquist test (:762-890)
    nyqutest = np.zeros((H, W), f32)
    for r in range(6, H - 6):
        c0 = 6 + (fc(r, 2) & 1)
        for c in range(c0, W - 6, 2):
            nyqutest[r, c] = (
                GAUSSODD[0] * cddiffsq[r, c]
                + GAUSSODD[1] * (cddiffsq[r - 1, c - 1]
                                 + cddiffsq[r - 1, c + 1]
                                 + cddiffsq[r + 1, c - 1]
                                 + cddiffsq[r + 1, c + 1])
                + GAUSSODD[2] * (cddiffsq[r - 2, c] + cddiffsq[r, c - 2]
                                 + cddiffsq[r, c + 2]
                                 + cddiffsq[r + 2, c])
                + GAUSSODD[3] * (cddiffsq[r - 2, c - 2]
                                 + cddiffsq[r - 2, c + 2]
                                 + cddiffsq[r + 2, c - 2]
                                 + cddiffsq[r + 2, c + 2])
            ) - (
                GAUSSGRAD[0] * delhvsqsum[r, c]
                + GAUSSGRAD[1] * (delhvsqsum[r - 1, c]
                                  + delhvsqsum[r, c + 1]
                                  + delhvsqsum[r, c - 1]
                                  + delhvsqsum[r + 1, c])
                + GAUSSGRAD[2] * (delhvsqsum[r - 1, c - 1]
                                  + delhvsqsum[r - 1, c + 1]
                                  + delhvsqsum[r + 1, c - 1]
                                  + delhvsqsum[r + 1, c + 1])
                + GAUSSGRAD[3] * (delhvsqsum[r - 2, c]
                                  + delhvsqsum[r, c - 2]
                                  + delhvsqsum[r, c + 2]
                                  + delhvsqsum[r + 2, c])
                + GAUSSGRAD[4] * (delhvsqsum[r - 2, c - 1]
                                  + delhvsqsum[r - 2, c + 1]
                                  + delhvsqsum[r - 1, c - 2]
                                  + delhvsqsum[r - 1, c + 2]
                                  + delhvsqsum[r + 1, c - 2]
                                  + delhvsqsum[r + 1, c + 2]
                                  + delhvsqsum[r + 2, c - 1]
                                  + delhvsqsum[r + 2, c + 1])
                + GAUSSGRAD[5] * (delhvsqsum[r - 2, c - 2]
                                  + delhvsqsum[r - 2, c + 2]
                                  + delhvsqsum[r + 2, c - 2]
                                  + delhvsqsum[r + 2, c + 2]))

    nyquist = np.zeros((H, W), np.uint8)
    nystartrow = 0
    nyendrow = 0
    nystartcol = W + 1
    nyendcol = 0
    for r in range(6, H - 6):
        c0 = 6 + (fc(r, 2) & 1)
        for c in range(c0, W - 6, 2):
            if nyqutest[r, c] > 0.0:
                nyquist[r, c] = 1
                nystartrow = nystartrow if nystartrow else r
                nyendrow = r
                nystartcol = min(nystartcol, c)
                nyendcol = max(nyendcol, c)

    do_nyquist = nystartrow != nyendrow and nystartcol != nyendcol
    nyquist2 = np.zeros((H, W), np.uint8)
    if do_nyquist:
        nyendrow += 1
        nyendcol += 1
        nystartcol -= nystartcol & 1
        nystartrow = max(8, nystartrow)
        nyendrow = min(H - 8, nyendrow)
        nystartcol = max(8, nystartcol)
        nyendcol = min(W - 8, nyendcol)
        for r in range(nystartrow, nyendrow):
            c0 = nystartcol + (fc(r, 2) & 1)
            for c in range(c0, nyendcol, 2):
                t = (int(nyquist[r - 2, c]) + nyquist[r - 1, c - 1]
                     + nyquist[r - 1, c + 1] + nyquist[r, c - 2]
                     + nyquist[r, c + 2] + nyquist[r + 1, c - 1]
                     + nyquist[r + 1, c + 1] + nyquist[r + 2, c])
                nyquist2[r, c] = 1 if t > 4 else (
                    0 if t < 4 else nyquist[r, c])
        # area interpolation
        for r in range(nystartrow, nyendrow):
            c0 = nystartcol + (fc(r, 2) & 1)
            for c in range(c0, nyendcol, 2):
                if not nyquist2[r, c]:
                    continue
                sumcfa = sumh = sumv = sumsqh = sumsqv = areawt = f32(0.0)
                for i in range(-6, 7, 2):
                    for j in range(-6, 7, 2):
                        if nyquist2[r + i, c + j]:
                            v = cfa[r + i, c + j]
                            sumcfa += v
                            sumh += cfa[r + i, c + j - 1] \
                                + cfa[r + i, c + j + 1]
                            sumv += cfa[r + i - 1, c + j] \
                                + cfa[r + i + 1, c + j]
                            sumsqh += ((v - cfa[r + i, c + j - 1]) ** 2
                                       + (v - cfa[r + i, c + j + 1]) ** 2)
                            sumsqv += ((v - cfa[r + i - 1, c + j]) ** 2
                                       + (v - cfa[r + i + 1, c + j]) ** 2)
                            areawt += 1
                sumh = sumcfa - f32(0.5) * sumh
                sumv = sumcfa - f32(0.5) * sumv
                areawt = f32(0.5) * areawt
                hcdvar = EPSSQ + abs(areawt * sumsqh - sumh * sumh)
                vcdvar = EPSSQ + abs(areawt * sumsqv - sumv * sumv)
                hvwt[r, c] = hcdvar / (vcdvar + hcdvar)

    # stage 6: G at R/B sites (:893-955)
    Dgrb0 = np.zeros((H, W), f32)
    Dgrb2h = np.zeros((H, W), f32)
    Dgrb2v = np.zeros((H, W), f32)
    for r in range(8, H - 8):
        c0 = 8 + (fc(r, 2) & 1)
        for c in range(c0, W - 8, 2):
            hvwtalt = f32(0.25) * (hvwt[r - 1, c - 1] + hvwt[r - 1, c + 1]
                                   + hvwt[r + 1, c - 1]
                                   + hvwt[r + 1, c + 1])
            if abs(0.5 - hvwt[r, c]) < abs(0.5 - hvwtalt):
                hvwt[r, c] = hvwtalt
            Dgrb0[r, c] = _intp(hvwt[r, c], vcd[r, c], hcd[r, c])
            green[r, c] = cfa[r, c] + Dgrb0[r, c]
            if nyquist2[r, c]:
                Dgrb2h[r, c] = (green[r, c] - f32(0.5)
                                * (green[r, c - 1] + green[r, c + 1])) ** 2
                Dgrb2v[r, c] = (green[r, c] - f32(0.5)
                                * (green[r - 1, c] + green[r + 1, c])) ** 2

    # Nyquist curvature refinement
    if do_nyquist:
        for r in range(nystartrow, nyendrow):
            c0 = nystartcol + (fc(r, 2) & 1)
            for c in range(c0, nyendcol, 2):
                if not nyquist2[r, c]:
                    continue
                gvarh = EPSSQ + (
                    GQUINC[0] * Dgrb2h[r, c]
                    + GQUINC[1] * (Dgrb2h[r - 1, c - 1]
                                   + Dgrb2h[r - 1, c + 1]
                                   + Dgrb2h[r + 1, c - 1]
                                   + Dgrb2h[r + 1, c + 1])
                    + GQUINC[2] * (Dgrb2h[r - 2, c] + Dgrb2h[r, c - 2]
                                   + Dgrb2h[r, c + 2] + Dgrb2h[r + 2, c])
                    + GQUINC[3] * (Dgrb2h[r - 2, c - 2]
                                   + Dgrb2h[r - 2, c + 2]
                                   + Dgrb2h[r + 2, c - 2]
                                   + Dgrb2h[r + 2, c + 2]))
                gvarv = EPSSQ + (
                    GQUINC[0] * Dgrb2v[r, c]
                    + GQUINC[1] * (Dgrb2v[r - 1, c - 1]
                                   + Dgrb2v[r - 1, c + 1]
                                   + Dgrb2v[r + 1, c - 1]
                                   + Dgrb2v[r + 1, c + 1])
                    + GQUINC[2] * (Dgrb2v[r - 2, c] + Dgrb2v[r, c - 2]
                                   + Dgrb2v[r, c + 2] + Dgrb2v[r + 2, c])
                    + GQUINC[3] * (Dgrb2v[r - 2, c - 2]
                                   + Dgrb2v[r - 2, c + 2]
                                   + Dgrb2v[r + 2, c - 2]
                                   + Dgrb2v[r + 2, c + 2]))
                Dgrb0[r, c] = (hcd[r, c] * gvarv + vcd[r, c] * gvarh) \
                    / (gvarv + gvarh)
                green[r, c] = cfa[r, c] + Dgrb0[r, c]

    # stage 7: diagonal gradients (:957-981)
    delp = np.zeros((H, W), f32)
    delm = np.zeros((H, W), f32)
    Dgrbsq1p = np.zeros((H, W), f32)
    Dgrbsq1m = np.zeros((H, W), f32)
    # The reference packs these by indx>>1 (even-column slots); odd-
    # column reads floor to the even slot, so each slot effectively
    # holds the value of the row's R/B site (delp/delm) or G site
    # (Dgrbsq1p/m).  The full-res mirror stores each value AT its true
    # site, which makes every downstream half-index read land naturally.
    for r in range(6, H - 6):
        if (fc(r, 2) & 1) == 0:
            for c in range(6, W - 6, 2):
                # (r, c) is R/B; (r, c+1) is G
                delp[r, c] = abs(cfa[r - 1, c + 1] - cfa[r + 1, c - 1])
                delm[r, c] = abs(cfa[r + 1, c + 1] - cfa[r - 1, c - 1])
                Dgrbsq1p[r, c + 1] = ((cfa[r, c + 1]
                                       - cfa[r + 1, c]) ** 2
                                      + (cfa[r, c + 1]
                                         - cfa[r - 1, c + 2]) ** 2)
                Dgrbsq1m[r, c + 1] = ((cfa[r, c + 1]
                                       - cfa[r - 1, c]) ** 2
                                      + (cfa[r, c + 1]
                                         - cfa[r + 1, c + 2]) ** 2)
        else:
            for c in range(6, W - 6, 2):
                # (r, c) is G; (r, c+1) is R/B
                Dgrbsq1p[r, c] = ((cfa[r, c] - cfa[r + 1, c - 1]) ** 2
                                  + (cfa[r, c] - cfa[r - 1, c + 1]) ** 2)
                Dgrbsq1m[r, c] = ((cfa[r, c] - cfa[r - 1, c - 1]) ** 2
                                  + (cfa[r, c] - cfa[r + 1, c + 1]) ** 2)
                delp[r, c + 1] = abs(cfa[r - 1, c + 2]
                                     - cfa[r + 1, c])
                delm[r, c + 1] = abs(cfa[r + 1, c + 2]
                                     - cfa[r - 1, c])

    # stage 8: diagonal R/B interpolation + pmwt (:983-1107)
    rbp = np.zeros((H, W), f32)
    rbm = np.zeros((H, W), f32)
    pmwt = np.zeros((H, W), f32)
    for r in range(8, H - 8):
        c0 = 8 + (fc(r, 2) & 1)
        for c in range(c0, W - 8, 2):
            x = cfa[r, c]
            crse = f32(2.0) * cfa[r + 1, c + 1] / (
                EPS + x + cfa[r + 2, c + 2])
            crnw = f32(2.0) * cfa[r - 1, c - 1] / (
                EPS + x + cfa[r - 2, c - 2])
            crne = f32(2.0) * cfa[r - 1, c + 1] / (
                EPS + x + cfa[r - 2, c + 2])
            crsw = f32(2.0) * cfa[r + 1, c - 1] / (
                EPS + x + cfa[r + 2, c - 2])
            rbse = (x * crse if abs(1.0 - crse) < ARTHRESH
                    else cfa[r + 1, c + 1]
                    + f32(0.5) * (x - cfa[r + 2, c + 2]))
            rbnw = (x * crnw if abs(1.0 - crnw) < ARTHRESH
                    else cfa[r - 1, c - 1]
                    + f32(0.5) * (x - cfa[r - 2, c - 2]))
            rbne = (x * crne if abs(1.0 - crne) < ARTHRESH
                    else cfa[r - 1, c + 1]
                    + f32(0.5) * (x - cfa[r - 2, c + 2]))
            rbsw = (x * crsw if abs(1.0 - crsw) < ARTHRESH
                    else cfa[r + 1, c - 1]
                    + f32(0.5) * (x - cfa[r + 2, c - 2]))
            wtse = (EPS + delm[r, c] + delm[r + 1, c + 1]
                    + delm[r + 2, c + 2])
            wtnw = (EPS + delm[r, c] + delm[r - 1, c - 1]
                    + delm[r - 2, c - 2])
            wtne = (EPS + delp[r, c] + delp[r - 1, c + 1]
                    + delp[r - 2, c + 2])
            wtsw = (EPS + delp[r, c] + delp[r + 1, c - 1]
                    + delp[r + 2, c - 2])
            rbm[r, c] = (wtse * rbnw + wtnw * rbse) / (wtse + wtnw)
            rbp[r, c] = (wtne * rbsw + wtsw * rbne) / (wtne + wtsw)

            rbvarm = EPSSQ + (
                GAUSSEVEN[0] * (Dgrbsq1m[r - 1, c] + Dgrbsq1m[r, c - 1]
                                + Dgrbsq1m[r, c + 1] + Dgrbsq1m[r + 1, c])
                + GAUSSEVEN[1] * (Dgrbsq1m[r - 2, c - 1]
                                  + Dgrbsq1m[r - 2, c + 1]
                                  + Dgrbsq1m[r - 1, c - 2]
                                  + Dgrbsq1m[r - 1, c + 2]
                                  + Dgrbsq1m[r + 1, c - 2]
                                  + Dgrbsq1m[r + 1, c + 2]
                                  + Dgrbsq1m[r + 2, c - 1]
                                  + Dgrbsq1m[r + 2, c + 1]))
            pmwt[r, c] = rbvarm / ((EPSSQ + (
                GAUSSEVEN[0] * (Dgrbsq1p[r - 1, c] + Dgrbsq1p[r, c - 1]
                                + Dgrbsq1p[r, c + 1] + Dgrbsq1p[r + 1, c])
                + GAUSSEVEN[1] * (Dgrbsq1p[r - 2, c - 1]
                                  + Dgrbsq1p[r - 2, c + 1]
                                  + Dgrbsq1p[r - 1, c - 2]
                                  + Dgrbsq1p[r - 1, c + 2]
                                  + Dgrbsq1p[r + 1, c - 2]
                                  + Dgrbsq1p[r + 1, c + 2]
                                  + Dgrbsq1p[r + 2, c - 1]
                                  + Dgrbsq1p[r + 2, c + 1]))) + rbvarm)

            if rbp[r, c] < x:
                if f32(2.0) * rbp[r, c] < x:
                    rbp[r, c] = _ulim(rbp[r, c], cfa[r + 1, c - 1],
                                      cfa[r - 1, c + 1])
                else:
                    pwt = f32(2.0) * (x - rbp[r, c]) / (
                        EPS + rbp[r, c] + x)
                    rbp[r, c] = (pwt * rbp[r, c] + (f32(1.0) - pwt)
                                 * _ulim(rbp[r, c], cfa[r + 1, c - 1],
                                         cfa[r - 1, c + 1]))
            if rbm[r, c] < x:
                if f32(2.0) * rbm[r, c] < x:
                    rbm[r, c] = _ulim(rbm[r, c], cfa[r - 1, c - 1],
                                      cfa[r + 1, c + 1])
                else:
                    mwt = f32(2.0) * (x - rbm[r, c]) / (
                        EPS + rbm[r, c] + x)
                    rbm[r, c] = (mwt * rbm[r, c] + (f32(1.0) - mwt)
                                 * _ulim(rbm[r, c], cfa[r - 1, c - 1],
                                         cfa[r + 1, c + 1]))
            if rbp[r, c] > clip_pt:
                rbp[r, c] = _ulim(rbp[r, c], cfa[r + 1, c - 1],
                                  cfa[r - 1, c + 1])
            if rbm[r, c] > clip_pt:
                rbm[r, c] = _ulim(rbm[r, c], cfa[r - 1, c - 1],
                                  cfa[r + 1, c + 1])

    # stage 9: pmwt escalation + rbint (:1109-1126)
    rbint = np.zeros((H, W), f32)
    for r in range(10, H - 10):
        c0 = 10 + (fc(r, 2) & 1)
        for c in range(c0, W - 10, 2):
            pmwtalt = f32(0.25) * (pmwt[r - 1, c - 1] + pmwt[r - 1, c + 1]
                                   + pmwt[r + 1, c - 1]
                                   + pmwt[r + 1, c + 1])
            if abs(0.5 - pmwt[r, c]) < abs(0.5 - pmwtalt):
                pmwt[r, c] = pmwtalt
            rbint[r, c] = f32(0.5) * (
                cfa[r, c] + rbm[r, c] * (f32(1.0) - pmwt[r, c])
                + rbp[r, c] * pmwt[r, c])

    # stage 10: G re-interpolation from R+B (:1129-1233)
    for r in range(12, H - 12):
        c0 = 12 + (fc(r, 2) & 1)
        for c in range(c0, W - 12, 2):
            if abs(0.5 - pmwt[r, c]) < abs(0.5 - hvwt[r, c]):
                continue
            cru = cfa[r - 1, c] * 2.0 / (EPS + rbint[r, c]
                                         + rbint[r - 2, c])
            crd = cfa[r + 1, c] * 2.0 / (EPS + rbint[r, c]
                                         + rbint[r + 2, c])
            crl = cfa[r, c - 1] * 2.0 / (EPS + rbint[r, c]
                                         + rbint[r, c - 2])
            crr = cfa[r, c + 1] * 2.0 / (EPS + rbint[r, c]
                                         + rbint[r, c + 2])
            gu = (rbint[r, c] * cru if abs(1.0 - cru) < ARTHRESH
                  else cfa[r - 1, c] + f32(0.5) * (rbint[r, c]
                                                   - rbint[r - 2, c]))
            gd = (rbint[r, c] * crd if abs(1.0 - crd) < ARTHRESH
                  else cfa[r + 1, c] + f32(0.5) * (rbint[r, c]
                                                   - rbint[r + 2, c]))
            gl = (rbint[r, c] * crl if abs(1.0 - crl) < ARTHRESH
                  else cfa[r, c - 1] + f32(0.5) * (rbint[r, c]
                                                   - rbint[r, c - 2]))
            gr = (rbint[r, c] * crr if abs(1.0 - crr) < ARTHRESH
                  else cfa[r, c + 1] + f32(0.5) * (rbint[r, c]
                                                   - rbint[r, c + 2]))
            Gintv = (dirwts0[r - 1, c] * gd + dirwts0[r + 1, c] * gu) \
                / (dirwts0[r + 1, c] + dirwts0[r - 1, c])
            Ginth = (dirwts1[r, c - 1] * gr + dirwts1[r, c + 1] * gl) \
                / (dirwts1[r, c - 1] + dirwts1[r, c + 1])
            if Gintv < rbint[r, c]:
                if 2 * Gintv < rbint[r, c]:
                    Gintv = _ulim(Gintv, cfa[r - 1, c], cfa[r + 1, c])
                else:
                    vwt = 2.0 * (rbint[r, c] - Gintv) / (
                        EPS + Gintv + rbint[r, c])
                    Gintv = vwt * Gintv + (1.0 - vwt) * _ulim(
                        Gintv, cfa[r - 1, c], cfa[r + 1, c])
            if Ginth < rbint[r, c]:
                if 2 * Ginth < rbint[r, c]:
                    Ginth = _ulim(Ginth, cfa[r, c - 1], cfa[r, c + 1])
                else:
                    hwt = 2.0 * (rbint[r, c] - Ginth) / (
                        EPS + Ginth + rbint[r, c])
                    Ginth = hwt * Ginth + (1.0 - hwt) * _ulim(
                        Ginth, cfa[r, c - 1], cfa[r, c + 1])
            if Ginth > clip_pt:
                Ginth = _ulim(Ginth, cfa[r, c - 1], cfa[r, c + 1])
            if Gintv > clip_pt:
                Gintv = _ulim(Gintv, cfa[r - 1, c], cfa[r + 1, c])
            green[r, c] = f32(Ginth * (1.0 - hvwt[r, c])
                              + Gintv * hvwt[r, c])
            Dgrb0[r, c] = green[r, c] - cfa[r, c]

    # stage 11: fancy chrominance (:1237-1276)
    # split G-B out of G-R on the B coset
    Dgrb1 = np.zeros((H, W), f32)
    # (ey, ex) = offset of the R subarray
    if fc(0, 0) == 1:
        ey, ex = (0, 1) if fc(0, 1) == 0 else (1, 0)
    else:
        ey, ex = (0, 0) if fc(0, 0) == 0 else (1, 1)
    for r in range(13 - ey, H - 12, 2):
        for c in range(13 - ex, W - 12, 2):
            Dgrb1[r, c] = Dgrb0[r, c]
            Dgrb0[r, c] = 0.0
    Dgrb = [Dgrb0, Dgrb1]
    for r in range(14, H - 14):
        c0 = 14 + (fc(r, 2) & 1)
        for c in range(c0, W - 14, 2):
            ch = 1 - fc(r, c) // 2  # interpolate the OTHER difference
            D = Dgrb[ch]
            wtnw = f32(1.0) / (EPS + abs(D[r - 1, c - 1] - D[r + 1, c + 1])
                               + abs(D[r - 1, c - 1] - D[r - 3, c - 3])
                               + abs(D[r + 1, c + 1] - D[r - 3, c - 3]))
            wtne = f32(1.0) / (EPS + abs(D[r - 1, c + 1] - D[r + 1, c - 1])
                               + abs(D[r - 1, c + 1] - D[r - 3, c + 3])
                               + abs(D[r + 1, c - 1] - D[r - 3, c + 3]))
            wtsw = f32(1.0) / (EPS + abs(D[r + 1, c - 1] - D[r - 1, c + 1])
                               + abs(D[r + 1, c - 1] - D[r + 3, c + 3])
                               + abs(D[r - 1, c + 1] - D[r + 3, c - 3]))
            wtse = f32(1.0) / (EPS + abs(D[r + 1, c + 1] - D[r - 1, c - 1])
                               + abs(D[r + 1, c + 1] - D[r + 3, c - 3])
                               + abs(D[r - 1, c - 1] - D[r + 3, c + 3]))
            D[r, c] = (
                wtnw * (f32(1.325) * D[r - 1, c - 1]
                        - f32(0.175) * D[r - 3, c - 3]
                        - f32(0.075) * D[r - 1, c - 3]
                        - f32(0.075) * D[r - 3, c - 1])
                # NB the reference's 4th NE/SW taps are p1+v2 = m1 and
                # -p1-v2 = -m1 — i.e. they point back to the SE/NW
                # 1-away neighbours (upstream RT quirk, kept verbatim)
                + wtne * (f32(1.325) * D[r - 1, c + 1]
                          - f32(0.175) * D[r - 3, c + 3]
                          - f32(0.075) * D[r - 1, c + 3]
                          - f32(0.075) * D[r + 1, c + 1])
                + wtsw * (f32(1.325) * D[r + 1, c - 1]
                          - f32(0.175) * D[r + 3, c - 3]
                          - f32(0.075) * D[r + 1, c - 3]
                          - f32(0.075) * D[r - 1, c - 1])
                + wtse * (f32(1.325) * D[r + 1, c + 1]
                          - f32(0.175) * D[r + 3, c + 3]
                          - f32(0.075) * D[r + 1, c + 3]
                          - f32(0.075) * D[r + 3, c + 1])
            ) / (wtnw + wtne + wtsw + wtse)

    # stage 12: output assembly (:1278-1410)
    rgb = np.zeros((3, H, W), f32)
    rgb[1] = np.clip(green, 0.0, 1.0)
    for r in range(16, H - 16):
        for c in range(16, W - 16):
            if fc(r, c) & 1:  # G site: weighted neighbour differences
                temp = f32(1.0) / (hvwt[r - 1, c] + f32(2.0)
                                   - hvwt[r, c + 1] - hvwt[r, c - 1]
                                   + hvwt[r + 1, c])
                rgb[0, r, c] = np.clip(
                    green[r, c] - (hvwt[r - 1, c] * Dgrb0[r - 1, c]
                                   + (f32(1.0) - hvwt[r, c + 1])
                                   * Dgrb0[r, c + 1]
                                   + (f32(1.0) - hvwt[r, c - 1])
                                   * Dgrb0[r, c - 1]
                                   + hvwt[r + 1, c] * Dgrb0[r + 1, c])
                    * temp, 0.0, 1.0)
                rgb[2, r, c] = np.clip(
                    green[r, c] - (hvwt[r - 1, c] * Dgrb1[r - 1, c]
                                   + (f32(1.0) - hvwt[r, c + 1])
                                   * Dgrb1[r, c + 1]
                                   + (f32(1.0) - hvwt[r, c - 1])
                                   * Dgrb1[r, c - 1]
                                   + hvwt[r + 1, c] * Dgrb1[r + 1, c])
                    * temp, 0.0, 1.0)
            else:
                rgb[0, r, c] = np.clip(green[r, c] - Dgrb0[r, c], 0.0, 1.0)
                rgb[2, r, c] = np.clip(green[r, c] - Dgrb1[r, c], 0.0, 1.0)

    if return_stages:
        stages = dict(dirwts0=dirwts0, dirwts1=dirwts1,
                      delhvsqsum=delhvsqsum, vcd=vcd, hcd=hcd,
                      dgintv=dgintv, dginth=dginth,
                      Dgrbsq1p=Dgrbsq1p, Dgrbsq1m=Dgrbsq1m,
                      cddiffsq=cddiffsq, hvwt=hvwt, nyquist2=nyquist2,
                      green=green, delp=delp, delm=delm, rbp=rbp,
                      rbm=rbm, pmwt=pmwt, rbint=rbint, Dgrb0=Dgrb0,
                      Dgrb1=Dgrb1)
        return rgb, stages
    return rgb
