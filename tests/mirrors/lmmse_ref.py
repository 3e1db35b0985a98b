"""NumPy mirror of the reference LMMSE demosaic interior math.

Transcribed (structure, not code) from
`/root/reference/src/iop/demosaic/lmmse.c` lmmse_demosaic :129-576
(Zhang & Wu via RawTherapee/librtprocess) and the gamma-table build in
`/root/reference/src/iop/demosaic.c:1160-1165`: gamma-domain CFA, the
directional G-R/G-B estimates (:208-241), the 9-tap exponential
low-pass (:142-151, :244-255), the per-direction LMMSE variance blend
(:257-318), plane assembly + bilinear R/B (:320-363), the in-place
median passes (:372-483), CFA re-pin (:486-494), and the EECI
refinement steps (:496-549).

Whole image as ONE tile (the reference tiles at 136 px with 8 px
overlap purely for cache locality; interior math is identical), with
the C's BORDER_AROUND=4 zero pad, so borders match the reference's
outermost-tile behavior.  The reference's gamma LUT (65536 entries,
linear interpolation — calc_gamma :117-128) is transcribed exactly;
the shipped kernel evaluates the analytic curve instead, a documented
~1e-5 deviation.  Scalar loops on purpose — unambiguous, test-only.
"""

import numpy as np

LMMSE_GRP = None  # whole-image: no internal tiling
BORDER = 4

_gamma_in_tab = None
_gamma_out_tab = None


def _tables():
    global _gamma_in_tab, _gamma_out_tab
    if _gamma_in_tab is None:
        x = np.arange(65536, dtype=np.float64) / 65535.0
        _gamma_in_tab = np.where(
            x <= 0.001867, x * 17.0,
            1.044445 * np.exp(np.log(np.maximum(x, 1e-30)) / 2.4)
            - 0.044445).astype(np.float32)
        _gamma_out_tab = np.where(
            x <= 0.031746, x / 17.0,
            np.exp(np.log((x + 0.044445) / 1.044445) * 2.4)
        ).astype(np.float32)
    return _gamma_in_tab, _gamma_out_tab


def calc_gamma(val, table):
    """lmmse.c:117-128 — LUT with linear interpolation, float32."""
    index = np.float32(val) * np.float32(65535.0)
    if index < 0.0:
        return np.float32(0.0)
    if index > 65534.99:
        return np.float32(1.0)
    idx = int(index)
    diff = np.float32(index - np.float32(idx))
    p1 = table[idx]
    p2 = np.float32(table[idx + 1] - p1)
    return np.float32(p1 + p2 * diff)


def _limf(x, lo, hi):
    return max(lo, min(x, hi))


def _median3(a, b, c):
    return max(min(a, b), min(c, max(a, b)))


def _median9(a):
    """lmmse.c:74-115 — the exact (buggy-looking but shipped) network."""
    a = [np.float32(v) for v in a]

    def mm(i, j):
        a[i], a[j] = min(a[i], a[j]), max(a[i], a[j])

    mm(1, 2); mm(4, 5); mm(7, 8); mm(0, 1); mm(3, 4); mm(6, 7)
    mm(1, 2)
    # :98-100 — tmp=min(a4,a5); a5=min(a4,a5); a4=tmp  (sic, both mins)
    tmp45 = min(a[4], a[5])
    a[5] = min(a[4], a[5])
    a[4] = tmp45
    tmp = min(a[7], a[8])
    a[8] = max(a[7], a[8])
    a[3] = max(a[0], a[3])
    a[5] = min(a[5], a[8])
    a7 = max(a[4], tmp)
    tmp = min(a[4], tmp)
    a[6] = max(a[3], a[6])
    a[4] = max(a[1], tmp)
    a[2] = min(a[2], a[5])
    a[4] = min(a[4], a7)
    tmp = min(a[4], a[2])
    a[2] = max(a[4], a[2])
    a[4] = max(a[6], tmp)
    return min(a[4], a[2])


def lmmse_ref(cfa_in, fc, scaler=1.0, mode=1):
    """cfa_in: (H, W) mosaic (absolute values, will be * 1/scaler);
    fc(r, c) -> 0/1/2 in IMAGE coords; mode = lmmse_refine 0..4.
    -> (3, H, W) float32.  Whole image = one tile."""
    gin, gout = _tables()
    H, W = cfa_in.shape
    f32 = np.float32

    h = [f32(1.0), f32(np.exp(-1.0 / 8.0)), f32(np.exp(-4.0 / 8.0)),
         f32(np.exp(-9.0 / 8.0)), f32(np.exp(-16.0 / 8.0))]
    hs = h[0] + f32(2.0) * (h[1] + h[2] + h[3] + h[4])
    h = [f32(v / hs) for v in h]

    medians = mode if mode < 2 else 3
    refine = mode - 2 if mode > 2 else 0
    revscaler = f32(1.0 / scaler)

    GRP_H, GRP_W = H + 2 * BORDER, W + 2 * BORDER
    last_rr, last_cc = GRP_H, GRP_W

    # qix[0]=R/hdiff, 1=G/vdiff, 2=B/hlp, 3=vlp/corr_r, 4=interp/corr_b,
    # 5=gamma cfa — same storage aliasing as the C
    qix = [np.zeros((GRP_H, GRP_W), f32) for _ in range(6)]

    def FC(rr, cc):
        # tile coords are image coords + BORDER; Bayer period 2 and
        # BORDER=4 even, so parity matches fc directly
        return fc(rr % 2, cc % 2)

    # fill gamma cfa (:197-205)
    for row in range(H):
        for col in range(W):
            qix[5][row + BORDER, col + BORDER] = calc_gamma(
                revscaler * f32(cfa_in[row, col]), gin)

    cfa = qix[5]
    hdiff, vdiff = qix[0], qix[1]
    hlp, vlp = qix[2], qix[3]
    interp = qix[4]

    # ---- G-R(B) directional estimates (:207-241) ----
    for rr in range(2, last_rr - 2):
        # at R/B sites
        cc0 = 2 + (FC(rr, 2) & 1)
        for cc in range(cc0, last_cc - 2, 2):
            v0 = f32(0.0625) * (cfa[rr - 1, cc - 1] + cfa[rr - 1, cc + 1]
                                + cfa[rr + 1, cc - 1]
                                + cfa[rr + 1, cc + 1]) \
                + f32(0.25) * cfa[rr, cc]
            hd = f32(-0.25) * (cfa[rr, cc - 2] + cfa[rr, cc + 2]) \
                + f32(0.5) * (cfa[rr, cc - 1] + cfa[rr, cc]
                              + cfa[rr, cc + 1])
            y0 = v0 + f32(0.5) * hd
            hd = _median3(hd, cfa[rr, cc - 1], cfa[rr, cc + 1]) \
                if cfa[rr, cc] > f32(1.75) * y0 else _limf(hd, 0.0, 1.0)
            hdiff[rr, cc] = hd - cfa[rr, cc]

            vd = f32(-0.25) * (cfa[rr - 2, cc] + cfa[rr + 2, cc]) \
                + f32(0.5) * (cfa[rr - 1, cc] + cfa[rr, cc]
                              + cfa[rr + 1, cc])
            y1 = v0 + f32(0.5) * vd
            vd = _median3(vd, cfa[rr - 1, cc], cfa[rr + 1, cc]) \
                if cfa[rr, cc] > f32(1.75) * y1 else _limf(vd, 0.0, 1.0)
            vdiff[rr, cc] = vd - cfa[rr, cc]
        # at G sites (:230-240)
        ccc0 = 2 + (FC(rr, 3) & 1)
        for cc in range(ccc0, last_cc - 2, 2):
            hd = f32(0.25) * (cfa[rr, cc - 2] + cfa[rr, cc + 2]) \
                - f32(0.5) * (cfa[rr, cc - 1] + cfa[rr, cc]
                              + cfa[rr, cc + 1])
            vd = f32(0.25) * (cfa[rr - 2, cc] + cfa[rr + 2, cc]) \
                - f32(0.5) * (cfa[rr - 1, cc] + cfa[rr, cc]
                              + cfa[rr + 1, cc])
            hdiff[rr, cc] = _limf(hd, -1.0, 0.0) + cfa[rr, cc]
            vdiff[rr, cc] = _limf(vd, -1.0, 0.0) + cfa[rr, cc]

    # ---- 9-tap exponential low pass (:243-255) ----
    for rr in range(4, last_rr - 4):
        for cc in range(4, last_cc - 4):
            hlp[rr, cc] = (h[0] * hdiff[rr, cc]
                           + h[1] * (hdiff[rr, cc - 1] + hdiff[rr, cc + 1])
                           + h[2] * (hdiff[rr, cc - 2] + hdiff[rr, cc + 2])
                           + h[3] * (hdiff[rr, cc - 3] + hdiff[rr, cc + 3])
                           + h[4] * (hdiff[rr, cc - 4]
                                     + hdiff[rr, cc + 4]))
            vlp[rr, cc] = (h[0] * vdiff[rr, cc]
                           + h[1] * (vdiff[rr - 1, cc] + vdiff[rr + 1, cc])
                           + h[2] * (vdiff[rr - 2, cc] + vdiff[rr + 2, cc])
                           + h[3] * (vdiff[rr - 3, cc] + vdiff[rr + 3, cc])
                           + h[4] * (vdiff[rr - 4, cc]
                                     + vdiff[rr + 4, cc]))

    # ---- LMMSE variance blend at R/B sites (:257-318) ----
    for rr in range(4, last_rr - 4):
        cc0 = 4 + (FC(rr, 4) & 1)
        for cc in range(cc0, last_cc - 4, 2):
            p = [hlp[rr, cc + k] for k in range(-4, 5)]
            mu = np.float32(sum(p) / f32(9.0))
            vx = f32(1e-7) + np.float32(sum((t - mu) ** 2 for t in p))
            d = [p[k + 4] - hdiff[rr, cc + k] for k in range(-4, 5)]
            vn = f32(1e-7) + np.float32(sum(t * t for t in d))
            xh = (hdiff[rr, cc] * vx + hlp[rr, cc] * vn) / (vx + vn)
            vh = vx * vn / (vx + vn)

            p = [vlp[rr + k, cc] for k in range(-4, 5)]
            mu = np.float32(sum(p) / f32(9.0))
            vx = f32(1e-7) + np.float32(sum((t - mu) ** 2 for t in p))
            d = [p[k + 4] - vdiff[rr + k, cc] for k in range(-4, 5)]
            vn = f32(1e-7) + np.float32(sum(t * t for t in d))
            xv = (vdiff[rr, cc] * vx + vlp[rr, cc] * vn) / (vx + vn)
            vv = vx * vn / (vx + vn)
            interp[rr, cc] = (xh * vv + xv * vh) / (vh + vv)

    # ---- copy CFA values (:320-336); qix 0/1/2 become R/G/B ----
    cfa_copy = cfa.copy()
    interp_copy = interp.copy()
    rgb = [np.zeros((GRP_H, GRP_W), f32) for _ in range(3)]
    for rr in range(last_rr):
        row_in = rr - BORDER
        for cc in range(last_cc):
            col_in = cc - BORDER
            c = FC(rr, cc)
            inside = 0 <= row_in < H and 0 <= col_in < W
            rgb[c][rr, cc] = cfa_copy[rr, cc] if inside else 0.0
            if c != 1:
                rgb[1][rr, cc] = (rgb[c][rr, cc] + interp_copy[rr, cc]
                                  if inside else 0.0)
    R, G, B = rgb

    # ---- bilinear R/B at G sites (:338-352) ----
    for rr in range(1, last_rr - 1):
        cc0 = 1 + (FC(rr, 2) & 1)
        c = FC(rr, cc0 + 1)
        for cc in range(cc0, last_cc - 1, 2):
            colc = rgb[c]
            colc[rr, cc] = G[rr, cc] + f32(0.5) * (
                colc[rr, cc - 1] - G[rr, cc - 1]
                + colc[rr, cc + 1] - G[rr, cc + 1])
            c = 2 - c
            colc = rgb[c]
            colc[rr, cc] = G[rr, cc] + f32(0.5) * (
                colc[rr - 1, cc] - G[rr - 1, cc]
                + colc[rr + 1, cc] - G[rr + 1, cc])
            c = 2 - c

    # ---- R/B at B/R sites (:354-363) ----
    for rr in range(1, last_rr - 1):
        cc0 = 1 + (FC(rr, 1) & 1)
        c = 2 - FC(rr, cc0)
        for cc in range(cc0, last_cc - 1, 2):
            colc = rgb[c]
            colc[rr, cc] = G[rr, cc] + f32(0.25) * (
                colc[rr - 1, cc] - G[rr - 1, cc]
                + colc[rr, cc - 1] - G[rr, cc - 1]
                + colc[rr, cc + 1] - G[rr, cc + 1]
                + colc[rr + 1, cc] - G[rr + 1, cc])

    # single tile: both outermost flags true (:365-370)
    ccmin, ccmax = 6, last_cc - 6
    rrmin, rrmax = 6, last_rr - 6

    corr_r, corr_b = qix[3], qix[4]  # aliases d=3 (c=0), d=4 (c=2)

    # ---- median passes (:372-483), in-place sequential ----
    for _ in range(medians):
        for rr in range(1, last_rr - 1):
            for c, d in ((0, 3), (2, 4)):
                corr = corr_r if d == 3 else corr_b
                colc = rgb[c]
                for cc in range(1, last_cc - 1):
                    corr[rr, cc] = _median9(
                        [colc[rr + dy, cc + dx] - G[rr + dy, cc + dx]
                         for dy in (-1, 0, 1) for dx in (-1, 0, 1)])
        for rr in range(rrmin, rrmax - 1):
            c0 = FC(rr, 0)
            c1 = FC(rr, 1)
            if c0 == 1:
                c1 = 2 - c1
                d_corr = corr_r if c1 == 0 else corr_b
                cc = ccmin
                while cc < ccmax - 1:
                    # G site
                    R[rr, cc] = G[rr, cc] + corr_r[rr, cc]
                    B[rr, cc] = G[rr, cc] + corr_b[rr, cc]
                    cc += 1
                    # R/B site: opposite color, then G
                    rgb[c1][rr, cc] = G[rr, cc] + d_corr[rr, cc]
                    G[rr, cc] = f32(0.5) * (
                        R[rr, cc] - corr_r[rr, cc]
                        + B[rr, cc] - corr_b[rr, cc])
                    cc += 1
                if cc < ccmax:
                    R[rr, cc] = G[rr, cc] + corr_r[rr, cc]
                    B[rr, cc] = G[rr, cc] + corr_b[rr, cc]
            else:
                c0 = 2 - c0
                d_corr = corr_r if c0 == 0 else corr_b
                cc = ccmin
                while cc < ccmax - 1:
                    # R/B site
                    rgb[c0][rr, cc] = G[rr, cc] + d_corr[rr, cc]
                    G[rr, cc] = f32(0.5) * (
                        R[rr, cc] - corr_r[rr, cc]
                        + B[rr, cc] - corr_b[rr, cc])
                    cc += 1
                    # G site
                    R[rr, cc] = G[rr, cc] + corr_r[rr, cc]
                    B[rr, cc] = G[rr, cc] + corr_b[rr, cc]
                    cc += 1
                if cc < ccmax:
                    rgb[c0][rr, cc] = G[rr, cc] + d_corr[rr, cc]
                    G[rr, cc] = f32(0.5) * (
                        R[rr, cc] - corr_r[rr, cc]
                        + B[rr, cc] - corr_b[rr, cc])

    # ---- re-pin measured channel from gamma cfa (:485-494) ----
    for rr in range(4, last_rr - 4):
        for cc in range(4, last_cc - 4):
            rgb[FC(rr, cc)][rr, cc] = cfa_copy[rr, cc]

    # ---- EECI refinement (:496-549), in-place sequential ----
    for _ in range(refine):
        # G at R/B sites (:499-513)
        for rr in range(rrmin + 2, rrmax - 2):
            cc0 = ccmin + 2 + (FC(rr, 2) & 1)
            c = FC(rr, cc0)
            for cc in range(cc0, ccmax - 2, 2):
                C = rgb[c]
                dh = abs(G[rr, cc + 1] - G[rr, cc - 1])
                dv = abs(G[rr + 1, cc] - G[rr - 1, cc])
                dL = f32(1.0) / (f32(1.0) + abs(C[rr, cc - 2]
                                                - C[rr, cc]) + dh)
                dR = f32(1.0) / (f32(1.0) + abs(C[rr, cc + 2]
                                                - C[rr, cc]) + dh)
                dU = f32(1.0) / (f32(1.0) + abs(C[rr - 2, cc]
                                                - C[rr, cc]) + dv)
                dD = f32(1.0) / (f32(1.0) + abs(C[rr + 2, cc]
                                                - C[rr, cc]) + dv)
                G[rr, cc] = C[rr, cc] + (
                    (G[rr, cc - 1] - C[rr, cc - 1]) * dL
                    + (G[rr, cc + 1] - C[rr, cc + 1]) * dR
                    + (G[rr - 1, cc] - C[rr - 1, cc]) * dU
                    + (G[rr + 1, cc] - C[rr + 1, cc]) * dD) \
                    / (dL + dR + dU + dD)
        # R and B at G sites (:514-531)
        for rr in range(rrmin + 2, rrmax - 2):
            cc0 = ccmin + 2 + (FC(rr, 3) & 1)
            c = FC(rr, cc0 + 1)
            for cc in range(cc0, ccmax - 2, 2):
                for _i in range(2):
                    C = rgb[c]
                    dch = abs(C[rr, cc + 1] - C[rr, cc - 1])
                    dcv = abs(C[rr + 1, cc] - C[rr - 1, cc])
                    dL = f32(1.0) / (f32(1.0) + abs(G[rr, cc - 2]
                                                    - G[rr, cc]) + dch)
                    dR = f32(1.0) / (f32(1.0) + abs(G[rr, cc + 2]
                                                    - G[rr, cc]) + dch)
                    dU = f32(1.0) / (f32(1.0) + abs(G[rr - 2, cc]
                                                    - G[rr, cc]) + dcv)
                    dD = f32(1.0) / (f32(1.0) + abs(G[rr + 2, cc]
                                                    - G[rr, cc]) + dcv)
                    C[rr, cc] = G[rr, cc] - (
                        (G[rr, cc - 1] - C[rr, cc - 1]) * dL
                        + (G[rr, cc + 1] - C[rr, cc + 1]) * dR
                        + (G[rr - 1, cc] - C[rr - 1, cc]) * dU
                        + (G[rr + 1, cc] - C[rr + 1, cc]) * dD) \
                        / (dL + dR + dU + dD)
                    c = 2 - c
        # R at B sites / B at R sites (:532-548)
        for rr in range(rrmin + 2, rrmax - 2):
            cc0 = ccmin + 2 + (FC(rr, 2) & 1)
            c = 2 - FC(rr, cc0)
            for cc in range(cc0, ccmax - 2, 2):
                d = 2 - c
                C, D = rgb[c], rgb[d]
                gh = abs(G[rr, cc + 1] - G[rr, cc - 1])
                gv = abs(G[rr + 1, cc] - G[rr - 1, cc])
                dL = f32(1.0) / (f32(1.0) + abs(D[rr, cc - 2]
                                                - D[rr, cc]) + gh)
                dR = f32(1.0) / (f32(1.0) + abs(D[rr, cc + 2]
                                                - D[rr, cc]) + gh)
                dU = f32(1.0) / (f32(1.0) + abs(D[rr - 2, cc]
                                                - D[rr, cc]) + gv)
                dD = f32(1.0) / (f32(1.0) + abs(D[rr + 2, cc]
                                                - D[rr, cc]) + gv)
                C[rr, cc] = G[rr, cc] - (
                    (G[rr, cc - 1] - C[rr, cc - 1]) * dL
                    + (G[rr, cc + 1] - C[rr, cc + 1]) * dR
                    + (G[rr - 1, cc] - C[rr - 1, cc]) * dU
                    + (G[rr + 1, cc] - C[rr + 1, cc]) * dD) \
                    / (dL + dR + dU + dD)

    # ---- gamma out + rescale (:551-571) ----
    out = np.zeros((3, H, W), f32)
    scaler = f32(scaler)
    for row in range(H):
        rr = row + BORDER
        for col in range(W):
            cc = col + BORDER
            out[0, row, col] = scaler * calc_gamma(R[rr, cc], gout)
            out[1, row, col] = scaler * calc_gamma(G[rr, cc], gout)
            out[2, row, col] = scaler * calc_gamma(B[rr, cc], gout)
    return out
