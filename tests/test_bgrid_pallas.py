"""Pallas bilateral-grid slice kernel vs the XLA reference slice.

The XLA path in pixel/bilateralgrid.grid_filter is the behavioral
reference (itself gated against the mirror transcription of
src/pixel/bilateral.c); the Pallas kernel must reproduce it to float
tolerance on every (sigma_s, D, C) shape class the ops use.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ansel_tpu.pixel import bilateralgrid as bg


def _run_both(guide, values, ss, sr, lo, hi, detail=None):
    ref = bg.grid_filter(guide, values, ss, sr, lo, hi, detail=detail)
    bg._FORCE_PALLAS_INTERPRET = True
    try:
        got = bg.grid_filter(guide, values, ss, sr, lo, hi, detail=detail)
    finally:
        bg._FORCE_PALLAS_INTERPRET = False
    return np.asarray(ref), np.asarray(got)


@pytest.mark.parametrize("ss,sr,C", [
    (15, 2.0 / 31.0, 1),   # bilateral op class: D=32 fine range
    (15, 2.0 / 31.0, 3),   # multi-channel values
    (8, 0.2, 1),           # coarse range bins
    (50, 20.0, 1),         # bilat/shadhi class: big cells, D=6
])
def test_slice_matches_xla(ss, sr, C):
    rng = np.random.RandomState(7)
    H, W = 150, 221
    lo, hi = 0.0, 2.0 if sr < 1.0 else 100.0
    guide = jnp.asarray(
        rng.rand(H, W).astype(np.float32) * (hi - lo) + lo)
    values = jnp.asarray(rng.rand(C, H, W).astype(np.float32) * hi)
    ref, got = _run_both(guide, values, ss, sr, lo, hi)
    assert np.isfinite(got).all()
    scale = max(np.abs(ref).max(), 1e-3)
    assert np.abs(ref - got).max() / scale < 2e-5


def test_slice_detail_mode():
    rng = np.random.RandomState(3)
    H, W = 96, 130
    guide = jnp.asarray(rng.rand(H, W).astype(np.float32) * 100.0)
    ref, got = _run_both(guide, guide[None], 20, 12.0, 0.0, 100.0,
                         detail=0.3)
    scale = max(np.abs(ref).max(), 1e-3)
    assert np.abs(ref - got).max() / scale < 2e-5
