"""RCD (Ratio Corrected Demosaicing) — TPU whole-image formulation.

Behavioral reference: `/root/reference/src/iop/demosaic/rcd.c` (Luis Sanz
Rodríguez's algorithm; steps 1-4 at rcd.c:355-540).  The reference runs
112x112 CPU-cache tiles with 9px overlap; that exists purely for cache
locality and OpenMP scheduling, so it is deliberately absent here: the TPU
version is ONE fused dataflow over shifted whole-image views that XLA tiles
onto the VPU — every step is elementwise over (H, W) planes, no gathers.

Algorithm (all computed at every site, selected by CFA parity masks):
  1. directional discrimination VH = V/(V+H) from squared 1-D color-diff
     high-pass filters, 3-row/3-col aggregated (rcd.c:355-390)
  2. ratio-correcting low-pass (binomial 3x3) (rcd.c:393-403)
  3. green at non-green sites: cardinal gradients + LPF-ratio-corrected
     estimates, blended by refined VH (rcd.c:405-437)
  4. R/B at the opposite chroma site via P/Q diagonal discrimination, then
     R/B at green sites via cardinal color differences (rcd.c:439-540)

Borders: the reference patches a PPG-computed margin (rcd_ppg_border); here
the mosaic is edge-replicated into the pad region so rolls read replicated
data, and results within ~4px of the true border are approximate (same
contract as the reference's MARGIN region).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.types import CFAPattern
from ..ops import _bayer

EPS = 1e-5
EPSSQ = 1e-10


def _sh(a, dy, dx):
    """Shifted view: value at (y+dy, x+dx). jnp.roll wraps; pad region
    absorbs the wrap within the analysis footprint (<=4 px)."""
    return jnp.roll(a, (-dy, -dx), axis=(0, 1))


def rcd_demosaic(x: jnp.ndarray, cfa: CFAPattern, scaler=None) -> jnp.ndarray:
    """(H, W) mosaic -> (3, H, W) camera RGB.

    `scaler` (traced scalar or None): max processed_maximum used to
    normalize into [0,1] like the reference (rcd.c:283-284) so the EPS
    constants act at the same amplitude.

    Rows are edge-padded by 8 (even — CFA phase kept) before the rolled
    dataflow: without it the top-border rolls wrap onto the BOTTOM image
    rows, making border values depend on the image height — which broke
    the row-sharded pipe's exactness (parallel/spatial.py) and matched
    nothing.  Column wrap is row-local and stays (same documented ~4 px
    approximate-border contract as rcd_pallas' edge-padded halo).
    """
    xp = jnp.pad(x, ((8, 8), (0, 0)), mode="edge")
    return _rcd_body(xp, cfa, scaler)[:, 8:-8, :]


def _rcd_body(x: jnp.ndarray, cfa: CFAPattern, scaler=None) -> jnp.ndarray:
    h, w = x.shape
    if scaler is None:
        scaler = jnp.asarray(1.0, x.dtype)
    else:
        scaler = jnp.asarray(scaler, x.dtype)
    inv = 1.0 / jnp.maximum(scaler, 1e-9)
    cfa_v = jnp.maximum(x, 0.0) * inv

    masks = _bayer.color_masks(cfa, h, w, x.dtype)
    is_r, is_g, is_b = masks[0], masks[1], masks[2]

    c = cfa_v

    # --- Step 1: V/H discrimination -----------------------------------------
    hpf_v = (
        _sh(c, -3, 0) - _sh(c, -1, 0) - _sh(c, 1, 0) + _sh(c, 3, 0)
        - 3.0 * (_sh(c, -2, 0) + _sh(c, 2, 0))
        + 6.0 * c
    ) ** 2
    hpf_h = (
        _sh(c, 0, -3) - _sh(c, 0, -1) - _sh(c, 0, 1) + _sh(c, 0, 3)
        - 3.0 * (_sh(c, 0, -2) + _sh(c, 0, 2))
        + 6.0 * c
    ) ** 2
    v_stat = jnp.maximum(EPSSQ, _sh(hpf_v, -1, 0) + hpf_v + _sh(hpf_v, 1, 0))
    h_stat = jnp.maximum(EPSSQ, _sh(hpf_h, 0, -1) + hpf_h + _sh(hpf_h, 0, 1))
    vh_dir = v_stat / (v_stat + h_stat)

    def refine(d):
        nbh = 0.25 * (_sh(d, -1, -1) + _sh(d, -1, 1) + _sh(d, 1, -1) + _sh(d, 1, 1))
        return jnp.where(jnp.abs(0.5 - d) < jnp.abs(0.5 - nbh), nbh, d)

    vh_disc = refine(vh_dir)

    # --- Step 2: ratio-correcting low-pass (binomial 3x3) --------------------
    lpf = (
        c
        + 0.5 * (_sh(c, -1, 0) + _sh(c, 1, 0) + _sh(c, 0, -1) + _sh(c, 0, 1))
        + 0.25 * (_sh(c, -1, -1) + _sh(c, -1, 1) + _sh(c, 1, -1) + _sh(c, 1, 1))
    )

    # --- Step 3: green at non-green sites ------------------------------------
    def grad(d1, d2, d3, d4, dm1):
        # cardinal gradient, e.g. North: |c(-1)-c(+1)| + |c - c(-2)|
        #                               + |c(-1)-c(-3)| + |c(-2)-c(-4)|
        return EPS + jnp.abs(dm1) + jnp.abs(c - d2) + jnp.abs(d1 - d3) + jnp.abs(d2 - d4)

    cn1, cs1 = _sh(c, -1, 0), _sh(c, 1, 0)
    cw1, ce1 = _sh(c, 0, -1), _sh(c, 0, 1)
    ns_abs = cn1 - cs1
    we_abs = cw1 - ce1
    n_grad = grad(cn1, _sh(c, -2, 0), _sh(c, -3, 0), _sh(c, -4, 0), ns_abs)
    s_grad = grad(cs1, _sh(c, 2, 0), _sh(c, 3, 0), _sh(c, 4, 0), ns_abs)
    w_grad = grad(cw1, _sh(c, 0, -2), _sh(c, 0, -3), _sh(c, 0, -4), we_abs)
    e_grad = grad(ce1, _sh(c, 0, 2), _sh(c, 0, 3), _sh(c, 0, 4), we_abs)

    two_lpf = lpf + lpf
    n_est = cn1 * two_lpf / (EPS + lpf + _sh(lpf, -2, 0))
    s_est = cs1 * two_lpf / (EPS + lpf + _sh(lpf, 2, 0))
    w_est = cw1 * two_lpf / (EPS + lpf + _sh(lpf, 0, -2))
    e_est = ce1 * two_lpf / (EPS + lpf + _sh(lpf, 0, 2))

    v_est = (s_grad * n_est + n_grad * s_est) / (n_grad + s_grad)
    h_est = (w_grad * e_est + e_grad * w_est) / (e_grad + w_grad)
    g_interp = vh_disc * h_est + (1.0 - vh_disc) * v_est
    g_full = jnp.where(is_g > 0, c, g_interp)

    # --- Step 4.0/4.1: P/Q diagonal discrimination ---------------------------
    hpf_p = (
        _sh(c, -3, -3) - _sh(c, -1, -1) - _sh(c, 1, 1) + _sh(c, 3, 3)
        - 3.0 * (_sh(c, -2, -2) + _sh(c, 2, 2))
        + 6.0 * c
    ) ** 2
    hpf_q = (
        _sh(c, -3, 3) - _sh(c, -1, 1) - _sh(c, 1, -1) + _sh(c, 3, -3)
        - 3.0 * (_sh(c, -2, 2) + _sh(c, 2, -2))
        + 6.0 * c
    ) ** 2
    p_stat = jnp.maximum(EPSSQ, _sh(hpf_p, -1, -1) + hpf_p + _sh(hpf_p, 1, 1))
    q_stat = jnp.maximum(EPSSQ, _sh(hpf_q, -1, 1) + hpf_q + _sh(hpf_q, 1, -1))
    pq_dir = p_stat / (p_stat + q_stat)
    pq_disc = refine(pq_dir)

    # --- Step 4.2: opposite chroma at non-green sites ------------------------
    # at a non-green site, the 4 diagonal neighbours carry the *other*
    # chroma; color differences vs interpolated green
    def diag(dy, dx):
        return _sh(c, dy, dx) - _sh(g_full, dy, dx)

    nw_g = (EPS + jnp.abs(_sh(c, -1, -1) - _sh(c, 1, 1))
            + jnp.abs(_sh(c, -1, -1) - _sh(c, -3, -3))
            + jnp.abs(g_full - _sh(g_full, -2, -2)))
    ne_g = (EPS + jnp.abs(_sh(c, -1, 1) - _sh(c, 1, -1))
            + jnp.abs(_sh(c, -1, 1) - _sh(c, -3, 3))
            + jnp.abs(g_full - _sh(g_full, -2, 2)))
    sw_g = (EPS + jnp.abs(_sh(c, -1, 1) - _sh(c, 1, -1))
            + jnp.abs(_sh(c, 1, -1) - _sh(c, 3, -3))
            + jnp.abs(g_full - _sh(g_full, 2, -2)))
    se_g = (EPS + jnp.abs(_sh(c, -1, -1) - _sh(c, 1, 1))
            + jnp.abs(_sh(c, 1, 1) - _sh(c, 3, 3))
            + jnp.abs(g_full - _sh(g_full, 2, 2)))

    p_est = (nw_g * diag(1, 1) + se_g * diag(-1, -1)) / (nw_g + se_g)
    q_est = (ne_g * diag(1, -1) + sw_g * diag(-1, 1)) / (ne_g + sw_g)
    opp = g_full + (pq_disc * q_est + (1.0 - pq_disc) * p_est)

    # intermediate chroma planes: raw at own sites, step-4.2 at opposite
    r_nb = jnp.where(is_r > 0, c, jnp.where(is_b > 0, opp, 0.0))
    b_nb = jnp.where(is_b > 0, c, jnp.where(is_r > 0, opp, 0.0))

    # --- Step 4.3: chroma at green sites --------------------------------------
    def chroma_at_green(plane):
        n1 = EPS + jnp.abs(g_full - _sh(g_full, -2, 0))
        s1 = EPS + jnp.abs(g_full - _sh(g_full, 2, 0))
        w1 = EPS + jnp.abs(g_full - _sh(g_full, 0, -2))
        e1 = EPS + jnp.abs(g_full - _sh(g_full, 0, 2))
        sn = jnp.abs(_sh(plane, -1, 0) - _sh(plane, 1, 0))
        ew = jnp.abs(_sh(plane, 0, -1) - _sh(plane, 0, 1))
        ng = n1 + sn + jnp.abs(_sh(plane, -1, 0) - _sh(plane, -3, 0))
        sg = s1 + sn + jnp.abs(_sh(plane, 1, 0) - _sh(plane, 3, 0))
        wg = w1 + ew + jnp.abs(_sh(plane, 0, -1) - _sh(plane, 0, -3))
        eg = e1 + ew + jnp.abs(_sh(plane, 0, 1) - _sh(plane, 0, 3))
        n_e = _sh(plane, -1, 0) - _sh(g_full, -1, 0)
        s_e = _sh(plane, 1, 0) - _sh(g_full, 1, 0)
        w_e = _sh(plane, 0, -1) - _sh(g_full, 0, -1)
        e_e = _sh(plane, 0, 1) - _sh(g_full, 0, 1)
        v_e = (ng * s_e + sg * n_e) / (ng + sg)
        h_e = (eg * w_e + wg * e_e) / (eg + wg)
        return g_full + (vh_disc * h_e + (1.0 - vh_disc) * v_e)

    r_at_g = chroma_at_green(r_nb)
    b_at_g = chroma_at_green(b_nb)

    r_full = jnp.where(is_g > 0, r_at_g, r_nb)
    b_full = jnp.where(is_g > 0, b_at_g, b_nb)

    out = jnp.stack([r_full, g_full, b_full])
    return jnp.maximum(out, 0.0) * scaler
