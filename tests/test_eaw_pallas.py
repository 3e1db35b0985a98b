"""EAW Pallas kernels vs the XLA PaddedView reference (interpret mode).

Covers both variants (denoiseprofile dn_weight, atrous per-channel
photometric weight) and the scale-dependent halo sizes up to the new
MAX_SCALE = 6 (halo 128).
"""

import numpy as np
import pytest

from ansel_tpu.kernels.eaw_pallas import (MAX_SCALE,
                                          eaw_atrous_coarse_pallas,
                                          eaw_dn_coarse_pallas)


@pytest.fixture(scope="module")
def img():
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    base = rng.random((3, 160, 640)).astype(np.float32)
    base[:, 40:80, 100:400] += 1.5  # an edge so weights differ from B3
    return jnp.asarray(base)


def _dn_xla(x, scale, inv_sigma2):
    import jax.numpy as jnp

    from ansel_tpu.pixel.shifts import PaddedView
    from ansel_tpu.pixel.wavelets import B3

    d = 1 << scale
    k = np.asarray(B3, np.float32)
    num = jnp.zeros_like(x)
    den = jnp.zeros_like(x[0])
    pv = PaddedView(x, 2 * d)
    for iy in range(5):
        for ix in range(5):
            sh = pv.at((iy - 2) * d, (ix - 2) * d)
            dist2 = jnp.sum((sh - x) ** 2, axis=0)
            # dn_weight: fast_mexp2f (eaw.c:194), bit-exact
            from ansel_tpu.pixel.fastmath import fast_mexp2f
            wp = fast_mexp2f(
                jnp.maximum(0.0, dist2 * inv_sigma2 * 0.02 - 9.0))
            w = float(k[iy] * k[ix]) * wp
            num = num + w[None] * sh
            den = den + w
    return num / jnp.maximum(den, 1e-12)[None]


def _atrous_xla(x, scale, sharpen):
    import jax.numpy as jnp

    from ansel_tpu.pixel.shifts import PaddedView
    from ansel_tpu.pixel.wavelets import B3

    d = 1 << scale
    from ansel_tpu.pixel.fastmath import dt_fast_expf

    k = np.asarray(B3, np.float32)
    num = jnp.zeros_like(x)
    den = jnp.zeros_like(x)
    pv = PaddedView(x, 2 * d)
    for iy in range(5):
        for ix in range(5):
            sh = pv.at((iy - 2) * d, (ix - 2) * d)
            sq = (sh - x) ** 2
            # eaw.c:29-42 weight(): dt_fast_expf, shared chroma weight
            w0 = dt_fast_expf(-sharpen * sq[0])
            wc = dt_fast_expf(-sharpen * (sq[1] + sq[2]))
            w = float(k[iy] * k[ix]) * jnp.stack([w0, wc, wc])
            num = num + w * sh
            den = den + w
    return num / jnp.maximum(den, 1e-9)


@pytest.mark.parametrize("scale", [0, 2, 4, 5])
def test_dn_variant_matches_xla(img, scale):
    inv = 4.0
    ref = np.asarray(_dn_xla(img, scale, inv))
    coarse, detail = eaw_dn_coarse_pallas(img, scale, inv, interpret=True)
    out = np.asarray(coarse)
    np.testing.assert_allclose(np.asarray(detail), np.asarray(img) - out,
                               atol=1e-6)
    d = 1 << scale
    m = 2 * d  # interior: the halo ring sees edge-pad vs roll-garbage
    if 2 * m >= min(img.shape[1:]) - 8:
        pytest.skip("image too small for interior at this scale")
    err = np.abs(ref - out)[:, m:-m, m:-m]
    assert err.max() < 1e-5


@pytest.mark.parametrize("scale", [0, 3, 6])
def test_atrous_variant_matches_xla(img, scale):
    sharp = 0.0015
    ref = np.asarray(_atrous_xla(img, scale, sharp))
    coarse, detail = eaw_atrous_coarse_pallas(img, scale, sharp,
                                              interpret=True)
    out = np.asarray(coarse)
    np.testing.assert_allclose(np.asarray(detail), np.asarray(img) - out,
                               atol=1e-6)
    d = 1 << scale
    m = min(2 * d, 60)
    err = np.abs(ref - out)[:, m:-m, m:-m]
    assert err.max() < 1e-5


def test_max_scale_is_six():
    assert MAX_SCALE == 6
