"""Scopes backend (pipeline/histogram.py)."""

import numpy as np

from ansel_tpu.pipeline.histogram import (histogram_rgb, stats, vectorscope,
                                          waveform)


def test_histogram_matches_numpy():
    rng = np.random.default_rng(0)
    img = rng.uniform(0.0, 1.0, (3, 40, 60)).astype(np.float32)
    h = np.asarray(histogram_rgb(img, bins=64))
    assert h.shape == (3, 64)
    for c in range(3):
        want = np.bincount(
            np.clip((img[c] * 63 + 0.5).astype(int), 0, 63).ravel(),
            minlength=64)
        assert np.array_equal(h[c], want)


def test_waveform_shape_and_mass():
    rng = np.random.default_rng(1)
    img = rng.uniform(0.0, 1.0, (3, 32, 100)).astype(np.float32)
    wf = np.asarray(waveform(img, bins=32, out_cols=50))
    assert wf.shape == (3, 32, 50)
    # every column's counts sum to the row count
    assert np.allclose(wf.sum(axis=1), 32.0)


def test_vectorscope_neutral_peaks_center():
    img = np.full((3, 16, 16), 0.4, np.float32)  # neutral grey
    vs = np.asarray(vectorscope(img, size=64))
    assert vs.sum() == 16 * 16
    peak = np.unravel_index(vs.argmax(), vs.shape)
    assert abs(peak[0] - 32) <= 1 and abs(peak[1] - 32) <= 1


def test_stats_clipped_fraction():
    img = np.zeros((3, 10, 10), np.float32)
    img[:, :5] = 1.0
    s = stats(img)
    assert np.allclose(np.asarray(s["clipped"]), 0.5)
