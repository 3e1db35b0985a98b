"""Blocked dual-direction Deriche IIR vs a naive sequential reference.

Gates pixel/blur's _iir_axis_dual (native-axis blocking, mirrored
Toeplitz backward stream, steady-state pad drive) against a scalar
per-row transcription of dt_gaussian_blur's recurrences
(src/pixel/gaussian.c:150-320) — forward/backward priming included.
"""

import numpy as np

import jax.numpy as jnp

from ansel_tpu.pixel import blur as blur_mod


def naive_deriche(x, sigma, order=0):
    a0, a1, a2, a3, b1, b2, coefp, coefn = blur_mod._deriche_coeffs(
        sigma, order)
    v = x.astype(np.float64)
    for axis in (-2, -1):
        v = np.moveaxis(v, axis, -1)
        n = v.shape[-1]
        flat = v.reshape(-1, n)
        res = np.zeros_like(flat)
        for row in range(flat.shape[0]):
            xr = flat[row]
            y = np.zeros(n)
            xp = xr[0]
            y1p = y2p = coefp * xr[0]
            for i in range(n):
                f = a0 * xr[i] + a1 * xp
                yy = f - b1 * y1p - b2 * y2p
                y[i] = yy
                xp = xr[i]
                y2p, y1p = y1p, yy
            z = np.zeros(n)
            xn1 = xn2 = xr[-1]
            z1p = z2p = coefn * xr[-1]
            for i in range(n - 1, -1, -1):
                f = a2 * xn1 + a3 * xn2
                zz = f - b1 * z1p - b2 * z2p
                z[i] = zz
                xn2, xn1 = xn1, xr[i]
                z2p, z1p = z1p, zz
            res[row] = y + z
        v = np.moveaxis(res.reshape(v.shape), -1, axis)
    return v


def test_iir_matches_sequential_deriche():
    rng = np.random.RandomState(4)
    x = rng.rand(3, 37, 53).astype(np.float32)
    for sigma in (2.5, 8.0, 30.0):
        ref = naive_deriche(x, sigma)
        got = np.asarray(blur_mod.gaussian_iir(jnp.asarray(x), sigma))
        assert np.abs(ref - got).max() < 5e-6, sigma


def test_iir_multi_block():
    """Sizes crossing several _IIR_BLOCK boundaries + a non-multiple."""
    rng = np.random.RandomState(9)
    x = rng.rand(700, 1100).astype(np.float32)
    ref = naive_deriche(x[None], 8.0)[0]
    got = np.asarray(blur_mod.gaussian_iir(jnp.asarray(x), 8.0))
    assert np.abs(ref - got).max() < 5e-6


def test_iir_order1_order2():
    """Derivative orders (used by toneequal/defringe paths)."""
    rng = np.random.RandomState(2)
    x = rng.rand(48, 64).astype(np.float32)
    for order in (1, 2):
        ref = naive_deriche(x[None], 4.0, order=order)[0]
        got = np.asarray(blur_mod.gaussian_iir(jnp.asarray(x), 4.0,
                                               order=order))
        assert np.abs(ref - got).max() < 5e-6, order


def test_iir_pallas_interpret_parity():
    """The Pallas dual-direction kernel (interpret mode) vs the
    sequential reference — the TPU dispatch path's arithmetic."""
    from ansel_tpu.kernels.iir_pallas import gaussian_iir_pallas

    rng = np.random.RandomState(5)
    x = rng.rand(3, 45, 70).astype(np.float32)
    for sigma in (2.5, 8.0):
        ref = naive_deriche(x, sigma)
        got = np.asarray(gaussian_iir_pallas(jnp.asarray(x), sigma,
                                             interpret=True))
        assert np.abs(ref - got).max() < 5e-6, sigma
    for order in (1, 2):
        ref = naive_deriche(x, 4.0, order=order)
        got = np.asarray(gaussian_iir_pallas(jnp.asarray(x), 4.0,
                                             order=order, interpret=True))
        assert np.abs(ref - got).max() < 5e-6, order
