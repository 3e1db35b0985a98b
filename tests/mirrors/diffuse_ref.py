"""NumPy mirror of the reference diffuse PDE update.

Transcribed (structure, not code) from
`/root/reference/src/iop/diffuse.c`:
  find_gradients :627-635, rotation_matrix_isophote :648-662,
  rotation_matrix_gradient :663-678, build_matrix :679-708,
  isotrope_laplacian :709-726, compute_kernel :727-758,
  heat_PDE_diffusion :760-955.

Exact libm exp/hypot is used where the C uses dt_fast_expf /
dt_fast_hypotf (documented deviation shared by the production op);
the mirror therefore validates the *structure* of the math against
ansel_tpu's implementation, not the C's fast-approx ULPs.

Scalar per-pixel loops on purpose — slow, unambiguous, test-only.
"""

import numpy as np

ISO_ISOTROPE, ISO_ISOPHOTE, ISO_GRADIENT = 0, 1, 2


def _kernel(c2, cs, c2t, s2t, mode):
    if mode == ISO_ISOTROPE:
        return np.array([0.25, 0.5, 0.25, 0.5, -3.0, 0.5, 0.25, 0.5, 0.25])
    if mode == ISO_ISOPHOTE:
        a11 = c2t + c2 * s2t
        a22 = c2 * c2t + s2t
        a12 = (c2 - 1.0) * cs
    else:
        a11 = c2 * c2t + s2t
        a22 = c2t + c2 * s2t
        a12 = (1.0 - c2) * cs
    b11 = a12 * 0.5
    return np.array([b11, a22, -b11, a11, -2.0 * (a11 + a22), a11,
                     -b11, a22, b11])


def _direction(gx, gy):
    mag = np.hypot(gx, gy)
    if mag != 0.0:
        cx, sy = gx / mag, gy / mag
    else:
        cx, sy = 1.0, 0.0
    return cx * cx, sy * sy, cx * sy, mag


def heat_pde_diffusion(HF, LF, aniso, modes, variance_threshold, mult,
                       normalized_regularization, ABCD, strength):
    """One reference PDE update on one scale.

    HF, LF: (C, H, W); aniso/ABCD: 4-vectors; modes: 4 isotropy enums.
    -> max(HF*strength + update/energy + LF, 0), diffuse.c:929-938."""
    C, H, W = HF.shape
    out = np.empty_like(HF)
    flt_min = 1e-8
    for c in range(C):
        for i in range(H):
            iN = [max(i - mult, 0), i, min(i + mult, H - 1)]
            for j in range(W):
                jN = [max(j - mult, 0), j, min(j + mult, W - 1)]
                nHF = np.array([HF[c, ii, jj] for ii in iN for jj in jN])
                nLF = np.array([LF[c, ii, jj] for ii in iN for jj in jN])
                safe_lf = np.maximum(nLF - flt_min, 0.0) + flt_min
                energy = np.sum((nHF / safe_lf) ** 2)
                energy = max(variance_threshold
                             + energy * normalized_regularization
                             - flt_min, 0.0) + flt_min

                # gradients (x = vertical, y = horizontal)
                gx_lf, gy_lf = (nLF[7] - nLF[1]) * 0.5, (nLF[5] - nLF[3]) * 0.5
                gx_hf, gy_hf = (nHF[7] - nHF[1]) * 0.5, (nHF[5] - nHF[3]) * 0.5
                c2g, s2g, csg, mg = _direction(gx_lf, gy_lf)
                c2l, s2l, csl, ml = _direction(gx_hf, gy_hf)
                c2 = [np.exp(-mg * aniso[0]), np.exp(-ml * aniso[1]),
                      np.exp(-mg * aniso[2]), np.exp(-ml * aniso[3])]
                kerns = [
                    _kernel(c2[0], csg, c2g, s2g, modes[0]),
                    _kernel(c2[1], csl, c2l, s2l, modes[1]),
                    _kernel(c2[2], csg, c2g, s2g, modes[2]),
                    _kernel(c2[3], csl, c2l, s2l, modes[3]),
                ]
                update = (ABCD[0] * np.dot(kerns[0], nLF)
                          + ABCD[1] * np.dot(kerns[1], nLF)
                          + ABCD[2] * np.dot(kerns[2], nHF)
                          + ABCD[3] * np.dot(kerns[3], nHF))
                acc = nHF[4] * strength + update / energy
                out[c, i, j] = max(acc + nLF[4], 0.0)
    return out
