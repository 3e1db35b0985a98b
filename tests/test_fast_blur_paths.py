"""Subsampled fast paths: fast_guided_filter and gaussian_blur_fast must
track their exact counterparts (reference structure:
`src/pixel/fast_guided_filter.h:280-344` computes the guided-filter
surface 4x-downsampled and upsamples (a, b))."""

import numpy as np

from ansel_tpu.pixel.blur import gaussian_blur, gaussian_blur_fast
from ansel_tpu.pixel.guided import fast_guided_filter, guided_filter


def _scene(h=333, w=517, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = 40.0 + 30.0 * np.sin(xx / 97.0) + 20.0 * np.cos(yy / 61.0)
    base[h // 3:, w // 2:] += 25.0  # an edge
    return (base + rng.normal(0, 2.0, (h, w))).astype(np.float32)


def test_fast_guided_tracks_exact():
    g = _scene()
    src = _scene(seed=1)
    exact = np.asarray(guided_filter(g, src, 48, 64.0))
    fast = np.asarray(fast_guided_filter(g, src, 48, 64.0, scaling=8))
    # the surface is low-frequency; subsampling error stays tiny
    # relative to the signal's dynamic range (~90 units)
    err = np.abs(exact - fast)
    assert err.mean() < 0.35
    assert np.percentile(err, 99) < 2.0


def test_fast_guided_small_radius_is_exact_path():
    g = _scene(64, 64)
    src = _scene(64, 64, seed=2)
    a = np.asarray(fast_guided_filter(g, src, 2, 1.0))
    b = np.asarray(guided_filter(g, src, 2, 1.0))
    assert np.allclose(a, b)


def test_gaussian_fast_tracks_exact_large_sigma():
    x = _scene()
    exact = np.asarray(gaussian_blur(x, 48.0))
    fast = np.asarray(gaussian_blur_fast(x, 48.0))
    err = np.abs(exact - fast)
    # interior agreement (IIR vs downsampled IIR differ most at borders)
    inner = err[16:-16, 16:-16]
    assert inner.mean() < 0.25
    assert np.percentile(inner, 99) < 1.0


def test_gaussian_fast_small_sigma_passthrough():
    x = _scene(96, 128)
    a = np.asarray(gaussian_blur_fast(x, 3.0))
    b = np.asarray(gaussian_blur(x, 3.0))
    assert np.allclose(a, b)


def test_gaussian_fast_multichannel():
    x = np.stack([_scene(120, 160, s) for s in range(3)])
    out = np.asarray(gaussian_blur_fast(x, 40.0))
    assert out.shape == x.shape
    assert np.isfinite(out).all()
