"""Pallas dilated separable FIR vs the XLA shifted-add reference.

pixel/shifts.sep_filter's XLA chain is the behavioral reference; the
halo-tile Pallas kernel (kernels/sepblur_pallas) must reproduce it to
float tolerance on every (taps, dilation, rank) class the ops use:
the a-trous hat ([1,2,1]/4 at 2^lev), the diffuse B-spline
([1,4,6,4,1]/16 at 2^lev), and plain small blurs.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ansel_tpu.pixel import shifts


def _run_both(x, taps, dilation):
    shifts._DISABLE_PALLAS = True
    try:
        ref = shifts.sep_filter(x, taps, dilation)
    finally:
        shifts._DISABLE_PALLAS = False
    shifts._FORCE_PALLAS_INTERPRET = True
    try:
        got = shifts.sep_filter(x, taps, dilation)
    finally:
        shifts._FORCE_PALLAS_INTERPRET = False
    return np.asarray(ref), np.asarray(got)


HAT = [0.25, 0.5, 0.25]
BSPLINE = [1 / 16, 4 / 16, 6 / 16, 4 / 16, 1 / 16]


@pytest.mark.parametrize("taps,dilation", [
    (HAT, 1), (HAT, 4), (HAT, 16),
    (BSPLINE, 1), (BSPLINE, 8),
])
def test_matches_xla_2d(taps, dilation):
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.rand(137, 301).astype(np.float32))
    ref, got = _run_both(x, taps, dilation)
    assert got.shape == ref.shape
    assert np.abs(ref - got).max() < 1e-6


def test_matches_xla_3ch():
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.rand(3, 90, 250).astype(np.float32))
    ref, got = _run_both(x, BSPLINE, 2)
    assert got.shape == ref.shape
    assert np.abs(ref - got).max() < 1e-6


def test_large_dilation_exceeding_tile():
    # dilation * radius > TILE_H: halo rows larger than the tile body
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(260, 520).astype(np.float32))
    ref, got = _run_both(x, HAT, 128)
    assert np.abs(ref - got).max() < 1e-6


def test_long_fir_c2():
    """33-tap FIR on 2 channels — the config-6 defringe-class shape whose
    Mosaic stack temporaries OOM'd the first strip-kernel budget model
    (each unrolled tap holds a strip-sized temp; hardware-calibrated)."""
    rng = np.random.RandomState(3)
    t = np.exp(-0.5 * (np.arange(-16, 17) / 4.0) ** 2)
    taps = list((t / t.sum()).astype(np.float32))
    x = jnp.asarray(rng.rand(2, 240, 384).astype(np.float32))
    ref, got = _run_both(x, taps, 1)
    np.testing.assert_allclose(got, ref, atol=2e-6)
