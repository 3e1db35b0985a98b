"""NumPy mirror of the reference RCD demosaic interior math.

Transcribed (structure, not code) from
`/root/reference/src/iop/demosaic/rcd.c` rcd_demosaic :274-560:
  step 1 V/H discrimination, step 2 low-pass, step 3 green at R/B,
  step 4.0-4.2 P/Q diagonals + R/B at R/B, step 4.3 R/B at green.

Whole-image, no tiling (the production tiles exist for cache locality,
not math), valid only in the >=4px interior — compare interiors.
Scalar loops on purpose — unambiguous, test-only.
"""

import numpy as np

EPS = 1e-5
EPSSQ = 1e-10


def _intp(a, b, c):
    return a * b + (1.0 - a) * c


def rcd_ref(cfa_in, fc, scaler=1.0):
    """cfa_in: (H, W) mosaic; fc(r, c) -> color index 0/1/2.
    -> (3, H, W); only rows/cols in [6, H-6) are reference-valid."""
    H, W = cfa_in.shape
    cfa = np.clip(cfa_in / scaler, 0.0, None).astype(np.float64)
    rgb = np.stack([cfa.copy(), cfa.copy(), cfa.copy()])

    # step 1: V/H colour-difference high-pass + discrimination
    V = np.zeros((H, W))
    Hh = np.zeros((H, W))
    for r in range(3, H - 3):
        for c in range(3, W - 3):
            V[r, c] = ((cfa[r - 3, c] - cfa[r - 1, c] - cfa[r + 1, c]
                        + cfa[r + 3, c])
                       - 3.0 * (cfa[r - 2, c] + cfa[r + 2, c])
                       + 6.0 * cfa[r, c]) ** 2
            Hh[r, c] = ((cfa[r, c - 3] - cfa[r, c - 1] - cfa[r, c + 1]
                         + cfa[r, c + 3])
                        - 3.0 * (cfa[r, c - 2] + cfa[r, c + 2])
                        + 6.0 * cfa[r, c]) ** 2
    VH = np.zeros((H, W))
    for r in range(4, H - 4):
        for c in range(4, W - 4):
            vs = max(EPSSQ, V[r - 1, c] + V[r, c] + V[r + 1, c])
            hs = max(EPSSQ, Hh[r, c - 1] + Hh[r, c] + Hh[r, c + 1])
            VH[r, c] = vs / (vs + hs)

    # step 2: low pass at R/B sites
    lpf = np.zeros((H, W))
    for r in range(2, H - 2):
        for c in range(2, W - 2):
            if fc(r, c) != 1:
                lpf[r, c] = (cfa[r, c]
                             + 0.5 * (cfa[r - 1, c] + cfa[r + 1, c]
                                      + cfa[r, c - 1] + cfa[r, c + 1])
                             + 0.25 * (cfa[r - 1, c - 1] + cfa[r - 1, c + 1]
                                       + cfa[r + 1, c - 1] + cfa[r + 1, c + 1]))

    # step 3: green at R/B
    for r in range(4, H - 4):
        for c in range(4, W - 4):
            if fc(r, c) == 1:
                continue
            v = cfa[r, c]
            ng = EPS + abs(cfa[r - 1, c] - cfa[r + 1, c]) \
                + abs(v - cfa[r - 2, c]) \
                + abs(cfa[r - 1, c] - cfa[r - 3, c]) \
                + abs(cfa[r - 2, c] - cfa[r - 4, c])
            sg = EPS + abs(cfa[r - 1, c] - cfa[r + 1, c]) \
                + abs(v - cfa[r + 2, c]) \
                + abs(cfa[r + 1, c] - cfa[r + 3, c]) \
                + abs(cfa[r + 2, c] - cfa[r + 4, c])
            wg = EPS + abs(cfa[r, c - 1] - cfa[r, c + 1]) \
                + abs(v - cfa[r, c - 2]) \
                + abs(cfa[r, c - 1] - cfa[r, c - 3]) \
                + abs(cfa[r, c - 2] - cfa[r, c - 4])
            eg = EPS + abs(cfa[r, c - 1] - cfa[r, c + 1]) \
                + abs(v - cfa[r, c + 2]) \
                + abs(cfa[r, c + 1] - cfa[r, c + 3]) \
                + abs(cfa[r, c + 2] - cfa[r, c + 4])
            lp = lpf[r, c]
            n_est = cfa[r - 1, c] * 2.0 * lp / (EPS + lp + lpf[r - 2, c])
            s_est = cfa[r + 1, c] * 2.0 * lp / (EPS + lp + lpf[r + 2, c])
            w_est = cfa[r, c - 1] * 2.0 * lp / (EPS + lp + lpf[r, c - 2])
            e_est = cfa[r, c + 1] * 2.0 * lp / (EPS + lp + lpf[r, c + 2])
            v_est = (sg * n_est + ng * s_est) / (ng + sg)
            h_est = (wg * e_est + eg * w_est) / (eg + wg)
            ctr = VH[r, c]
            nbh = 0.25 * (VH[r - 1, c - 1] + VH[r - 1, c + 1]
                          + VH[r + 1, c - 1] + VH[r + 1, c + 1])
            disc = nbh if abs(0.5 - ctr) < abs(0.5 - nbh) else ctr
            rgb[1, r, c] = _intp(disc, h_est, v_est)

    # step 4.0: P/Q diagonal high-pass (at R/B columns)
    P = np.zeros((H, W))
    Q = np.zeros((H, W))
    for r in range(3, H - 3):
        for c in range(3, W - 3):
            P[r, c] = ((cfa[r - 3, c - 3] - cfa[r - 1, c - 1]
                        - cfa[r + 1, c + 1] + cfa[r + 3, c + 3])
                       - 3.0 * (cfa[r - 2, c - 2] + cfa[r + 2, c + 2])
                       + 6.0 * cfa[r, c]) ** 2
            Q[r, c] = ((cfa[r - 3, c + 3] - cfa[r - 1, c + 1]
                        - cfa[r + 1, c - 1] + cfa[r + 3, c - 3])
                       - 3.0 * (cfa[r - 2, c + 2] + cfa[r + 2, c - 2])
                       + 6.0 * cfa[r, c]) ** 2
    PQ = np.zeros((H, W))
    for r in range(4, H - 4):
        for c in range(4, W - 4):
            if fc(r, c) == 1:
                continue
            ps = max(EPSSQ, P[r - 1, c - 1] + P[r, c] + P[r + 1, c + 1])
            qs = max(EPSSQ, Q[r - 1, c + 1] + Q[r, c] + Q[r + 1, c - 1])
            PQ[r, c] = ps / (ps + qs)

    # step 4.2: R/B at B/R sites
    for r in range(4, H - 4):
        for c in range(4, W - 4):
            f = fc(r, c)
            if f == 1:
                continue
            ch = 2 - f
            ctr = PQ[r, c]
            nbh = 0.25 * (PQ[r - 1, c - 1] + PQ[r - 1, c + 1]
                          + PQ[r + 1, c - 1] + PQ[r + 1, c + 1])
            disc = nbh if abs(0.5 - ctr) < abs(0.5 - nbh) else ctr
            nw_g = EPS + abs(rgb[ch, r - 1, c - 1] - rgb[ch, r + 1, c + 1]) \
                + abs(rgb[ch, r - 1, c - 1] - rgb[ch, r - 3, c - 3]) \
                + abs(rgb[1, r, c] - rgb[1, r - 2, c - 2])
            ne_g = EPS + abs(rgb[ch, r - 1, c + 1] - rgb[ch, r + 1, c - 1]) \
                + abs(rgb[ch, r - 1, c + 1] - rgb[ch, r - 3, c + 3]) \
                + abs(rgb[1, r, c] - rgb[1, r - 2, c + 2])
            sw_g = EPS + abs(rgb[ch, r - 1, c + 1] - rgb[ch, r + 1, c - 1]) \
                + abs(rgb[ch, r + 1, c - 1] - rgb[ch, r + 3, c - 3]) \
                + abs(rgb[1, r, c] - rgb[1, r + 2, c - 2])
            se_g = EPS + abs(rgb[ch, r - 1, c - 1] - rgb[ch, r + 1, c + 1]) \
                + abs(rgb[ch, r + 1, c + 1] - rgb[ch, r + 3, c + 3]) \
                + abs(rgb[1, r, c] - rgb[1, r + 2, c + 2])
            nw_e = rgb[ch, r - 1, c - 1] - rgb[1, r - 1, c - 1]
            ne_e = rgb[ch, r - 1, c + 1] - rgb[1, r - 1, c + 1]
            sw_e = rgb[ch, r + 1, c - 1] - rgb[1, r + 1, c - 1]
            se_e = rgb[ch, r + 1, c + 1] - rgb[1, r + 1, c + 1]
            p_est = (nw_g * se_e + se_g * nw_e) / (nw_g + se_g)
            q_est = (ne_g * sw_e + sw_g * ne_e) / (ne_g + sw_g)
            rgb[ch, r, c] = rgb[1, r, c] + _intp(disc, q_est, p_est)

    # step 4.3: R/B at green sites
    out = rgb.copy()
    for r in range(4, H - 4):
        for c in range(4, W - 4):
            if fc(r, c) != 1:
                continue
            ctr = VH[r, c]
            nbh = 0.25 * (VH[r - 1, c - 1] + VH[r - 1, c + 1]
                          + VH[r + 1, c - 1] + VH[r + 1, c + 1])
            disc = nbh if abs(0.5 - ctr) < abs(0.5 - nbh) else ctr
            g = rgb[1, r, c]
            n1 = EPS + abs(g - rgb[1, r - 2, c])
            s1 = EPS + abs(g - rgb[1, r + 2, c])
            w1 = EPS + abs(g - rgb[1, r, c - 2])
            e1 = EPS + abs(g - rgb[1, r, c + 2])
            for ch in (0, 2):
                sn = abs(rgb[ch, r - 1, c] - rgb[ch, r + 1, c])
                ew = abs(rgb[ch, r, c - 1] - rgb[ch, r, c + 1])
                ng = n1 + sn + abs(rgb[ch, r - 1, c] - rgb[ch, r - 3, c])
                sg = s1 + sn + abs(rgb[ch, r + 1, c] - rgb[ch, r + 3, c])
                wg = w1 + ew + abs(rgb[ch, r, c - 1] - rgb[ch, r, c - 3])
                eg = e1 + ew + abs(rgb[ch, r, c + 1] - rgb[ch, r, c + 3])
                n_e = rgb[ch, r - 1, c] - rgb[1, r - 1, c]
                s_e = rgb[ch, r + 1, c] - rgb[1, r + 1, c]
                w_e = rgb[ch, r, c - 1] - rgb[1, r, c - 1]
                e_e = rgb[ch, r, c + 1] - rgb[1, r, c + 1]
                v_est = (ng * s_e + sg * n_e) / (ng + sg)
                h_est = (eg * w_e + wg * e_e) / (eg + wg)
                out[ch, r, c] = g + _intp(disc, h_est, v_est)
    return np.maximum(out, 0.0) * scaler
