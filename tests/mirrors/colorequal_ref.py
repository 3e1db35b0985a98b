"""Independent scalar transcription of the colorequal CLUT local field,
used as the oracle for ansel_tpu/color/colorrings.py's vectorized fill.

Transcribed from `/root/reference/src/pixel/colorequal_shared.c`:
  * dt_colorrings_rgb_to_gray_cyl / gray_basis_to_rgb   :440-480
  * wendland_c2 / wrap_pi                               :492-506
  * distance_to_cube_shell / project_to_cube_shell      :365-398
  * eval_local_field (weighting loop, smoothstep alpha,
    cube-shell projection)                              :507-594
  * fill_lut_local_field (lattice + LUT layout)         :595-620
plus the trilinear CLUT sampler semantics of the lut3d kernel used by
`/root/reference/src/iop/colorequal.c:839`.

Scalar Python loops on purpose — slow, unambiguous, test-only.
"""

from __future__ import annotations

import math

import numpy as np

E_L = (0.5773502691896258,) * 3
E_U = (0.7071067811865475, -0.7071067811865475, 0.0)
E_V = (0.4082482904638630, 0.4082482904638630, -0.8164965809277260)


def rgb_to_gray_cyl(rgb):
    L = sum(rgb[i] * E_L[i] for i in range(3))
    u = sum(rgb[i] * E_U[i] for i in range(3))
    v = sum(rgb[i] * E_V[i] for i in range(3))
    return L, math.hypot(u, v), math.atan2(v, u)


def gray_basis_to_rgb(L, u, v):
    return [L * E_L[i] + u * E_U[i] + v * E_V[i] for i in range(3)]


def wendland_c2(d):
    if d >= 1.0:
        return 0.0
    t = 1.0 - d
    return t * t * t * t * (4.0 * d + 1.0)


def wrap_pi(x):
    while x <= -math.pi:
        x += 2.0 * math.pi
    while x > math.pi:
        x -= 2.0 * math.pi
    return x


def distance_to_cube_shell(axis, direction):
    distance = math.inf
    for c in range(3):
        if abs(direction[c]) < 1e-6:
            continue
        bound = 1.0 if direction[c] > 0.0 else 0.0
        cand = (bound - axis[c]) / direction[c]
        if 0.0 < cand < distance:
            distance = cand
    return distance if math.isfinite(distance) else 0.0


def project_to_cube_shell(axis, rgb):
    vec = [rgb[i] - axis[i] for i in range(3)]
    if math.sqrt(sum(v * v for v in vec)) >= 1e-6:
        s = distance_to_cube_shell(axis, vec)
        if s < 1.0:
            rgb = [axis[i] + s * vec[i] for i in range(3)]
    return [min(max(rgb[i], 0.0), 1.0) for i in range(3)]


def eval_local_field(x, anchors, inv_sigma_L, inv_sigma_rho,
                     inv_sigma_theta, rho0):
    """x: rgb triple; anchors: list of dicts with L/rho/theta/delta_L/
    chroma_scale/delta_theta/weight -> displacement triple."""
    Lx, rhox, thetax = rgb_to_gray_cyl(x)
    if rhox <= 1e-6:
        return [0.0, 0.0, 0.0]
    sw = sdl = ssc = sdt = 0.0
    for a in anchors:
        dL = (Lx - a["L"]) * inv_sigma_L
        dr = (rhox - a["rho"]) * inv_sigma_rho
        dh = wrap_pi(thetax - a["theta"]) * inv_sigma_theta
        d2 = dL * dL + dr * dr + dh * dh
        if d2 >= 1.0:
            continue
        w = a["weight"] * wendland_c2(math.sqrt(d2))
        if w <= np.finfo(np.float32).tiny:
            continue
        sw += w
        sdl += w * a["delta_L"]
        ssc += w * a["chroma_scale"]
        sdt += w * a["delta_theta"]
    if sw <= np.finfo(np.float32).tiny:
        return [0.0, 0.0, 0.0]
    tgt_dL = sdl / sw
    scale = ssc / sw
    tgt_dth = sdt / sw
    if (abs(tgt_dL) <= 1e-6 and abs(scale - 1.0) <= 1e-6
            and abs(tgt_dth) <= 1e-6):
        return [0.0, 0.0, 0.0]
    t = min(max(rhox / rho0, 0.0), 1.0) if rho0 > 0 else 1.0
    alpha = t * t * (3.0 - 2.0 * t)
    tL = Lx + alpha * tgt_dL
    trho = rhox * max(1.0 + alpha * (scale - 1.0), 0.0)
    tth = thetax + alpha * tgt_dth
    target = gray_basis_to_rgb(tL, trho * math.cos(tth),
                               trho * math.sin(tth))
    axis = [tL * E_L[0]] * 3
    target = project_to_cube_shell(axis, target)
    return [target[i] - x[i] for i in range(3)]


def fill_lut(anchors, sigma_L, sigma_rho, sigma_theta, rho0, level):
    """-> (level^3, 3) float32, idx = r + g*level + b*level^2."""
    lut = np.zeros((level ** 3, 3), np.float32)
    for b in range(level):
        for g in range(level):
            for r in range(level):
                x = [r / (level - 1.0), g / (level - 1.0),
                     b / (level - 1.0)]
                d = eval_local_field(x, anchors, 1.0 / sigma_L,
                                     1.0 / sigma_rho, 1.0 / sigma_theta,
                                     rho0)
                idx = (b * level + g) * level + r
                for c in range(3):
                    lut[idx, c] = min(max(x[c] + d[c], 0.0), 1.0)
    return lut


def trilinear_sample(lut, level, rgb):
    """Standard lut3d trilinear: rgb in [0,1] -> lut value."""
    out = [0.0, 0.0, 0.0]
    f = [min(max(v, 0.0), 1.0) * (level - 1) for v in rgb]
    i0 = [min(int(v), level - 2) for v in f]
    fr = [f[c] - i0[c] for c in range(3)]

    def at(r, g, b):
        return lut[(b * level + g) * level + r]

    for dz in (0, 1):
        wz = fr[2] if dz else 1.0 - fr[2]
        for dy in (0, 1):
            wy = fr[1] if dy else 1.0 - fr[1]
            for dx in (0, 1):
                wx = fr[0] if dx else 1.0 - fr[0]
                val = at(i0[0] + dx, i0[1] + dy, i0[2] + dz)
                for c in range(3):
                    out[c] += wz * wy * wx * val[c]
    return out
