"""JAX-side color transforms over planar (3, H, W) images.

These are the in-graph counterparts of the reference's per-node colorspace
conversions (`/root/reference/src/develop/pixelpipe_cpu.c:54-77`,
`src/pixel/iop_profile.c`) — except there is no per-node conversion pass:
ops declare their working space and the planner inserts matrix transforms
only where spaces actually change, and XLA fuses them into neighbours.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def apply_matrix(img: jnp.ndarray, M) -> jnp.ndarray:
    """(3,H,W) x (3,3) channel mix.

    Given a Python nested list/tuple, unrolls to 9 scalar multiply-adds —
    required inside Pallas kernels (captured array constants are rejected)
    and equally fusible under plain XLA.  Given an array, uses einsum.
    """
    if isinstance(M, (list, tuple)):
        rows = []
        for r in range(3):
            acc = None
            for c in range(3):
                m = M[r][c]
                if isinstance(m, (int, float)):
                    m = float(m)  # keep weak-typed: no upcast, no capture
                term = m * img[c]
                acc = term if acc is None else acc + term
            rows.append(acc)
        return jnp.stack(rows)
    M = jnp.asarray(M, dtype=img.dtype)
    return jnp.einsum("dc,chw->dhw", M, img, precision=jax.lax.Precision.HIGHEST)


def srgb_encode(x: jnp.ndarray) -> jnp.ndarray:
    """Linear -> sRGB transfer (IEC 61966-2-1)."""
    a = 0.055
    safe = jnp.maximum(x, 1e-9)
    return jnp.where(x <= 0.0031308, 12.92 * x, (1 + a) * safe ** (1.0 / 2.4) - a)


def srgb_decode(x: jnp.ndarray) -> jnp.ndarray:
    a = 0.055
    safe = jnp.maximum(x, 1e-9)
    return jnp.where(x <= 0.04045, x / 12.92, ((safe + a) / (1 + a)) ** 2.4)


def gamma_encode(x: jnp.ndarray, g: float) -> jnp.ndarray:
    return jnp.maximum(x, 1e-9) ** jnp.asarray(1.0 / g, x.dtype)


def luminance(img: jnp.ndarray, y_weights) -> jnp.ndarray:
    """(3,H,W) -> (H,W) luminance with the working profile's Y row."""
    w = jnp.asarray(y_weights, dtype=img.dtype)
    return jnp.tensordot(w, img, axes=(0, 0))


# --- CIE Lab (D65 reference white in pipeline XYZ) ---------------------------

_LAB_EPS = 216.0 / 24389.0
_LAB_KAPPA = 24389.0 / 27.0


def xyz_to_lab(xyz: jnp.ndarray, white_XYZ) -> jnp.ndarray:
    # per-channel white divide (no (3,1,1) reshape-broadcast: Pallas-safe)
    w = [float(v) for v in np.asarray(white_XYZ).reshape(-1)]
    r = jnp.stack([xyz[i] / w[i] for i in range(3)])
    # cbrt via exp/log: r is clamped positive, and jnp.cbrt has no
    # Pallas TPU lowering (these transforms run inside the fused chain).
    croot = jnp.exp(jnp.log(jnp.maximum(r, 1e-12)) * (1.0 / 3.0))
    f = jnp.where(r > _LAB_EPS, croot, (_LAB_KAPPA * r + 16.0) / 116.0)
    L = 116.0 * f[1] - 16.0
    a = 500.0 * (f[0] - f[1])
    b = 200.0 * (f[1] - f[2])
    return jnp.stack([L, a, b])


def lab_to_xyz(lab: jnp.ndarray, white_XYZ) -> jnp.ndarray:
    w = [float(v) for v in np.asarray(white_XYZ).reshape(-1)]
    fy = (lab[0] + 16.0) / 116.0
    fx = fy + lab[1] / 500.0
    fz = fy - lab[2] / 200.0
    f = jnp.stack([fx, fy, fz])
    r = jnp.where(f**3 > _LAB_EPS, f**3, (116.0 * f - 16.0) / _LAB_KAPPA)
    return jnp.stack([r[i] * w[i] for i in range(3)])


def delta_e_76(lab1: jnp.ndarray, lab2: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.sum((lab1 - lab2) ** 2, axis=0))
