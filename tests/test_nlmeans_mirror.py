"""NLM core gated against the nlmeans_core.c transcription
(tests/mirrors/nlmeans_ref.py) — both weight variants, both the XLA
scan path and the Pallas kernel (interpret), scatter lattice included.

Interior-only comparison: the mirror implements the reference's
zero-contribution border semantics, production edge-pads; they agree
exactly beyond max_shift + patch_radius from the frame edge.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mirrors.nlmeans_ref import define_patches, nlmeans_ref, scatter


def _img(h=48, w=72, seed=3):
    rng = np.random.default_rng(seed)
    base = rng.random((3, h, w)).astype(np.float32)
    base[:, 10:20, 12:30] += 0.5  # structure so weights vary
    return base * 0.4


@pytest.mark.parametrize("cw,scat", [(-1.0, 0.0), (0.1, 0.0),
                                     (0.1, 0.5)])
def test_xla_path_matches_mirror(cw, scat):
    from ansel_tpu.pixel.nlmeans import nlmeans

    img = _img()
    P, K, sharp = 1, 3, 0.8
    norm = [1.0, 0.7, 0.7]
    want = nlmeans_ref(img, P, K, sharp, norm, center_weight=cw,
                       scale=1.0, scattering=scat)
    got = np.asarray(nlmeans(jnp.asarray(img), P, K, sharp, norm,
                             center_weight=cw, scattering=scat,
                             scale=1.0, force_xla=True))
    pats = define_patches(K, 1.0, scat)
    m = max(max(abs(a), abs(b)) for a, b in pats) + P + 1
    err = np.abs(want - got)[:, m:-m, m:-m]
    assert err.max() < 2e-6, err.max()


def test_pallas_interpret_matches_mirror():
    from ansel_tpu.kernels.nlm_pallas import nlm_pallas
    from ansel_tpu.pixel.nlmeans import _scatter

    img = _img(h=40, w=64)
    P, K, sharp, cw = 1, 2, 0.6, 0.1
    offsets = tuple(_scatter(1.0, 0.3, dy, dx)
                    for dy in range(-K, K + 1) for dx in range(-K, K + 1))
    n = 2 * P + 1
    got = np.asarray(nlm_pallas(
        jnp.asarray(img), offsets, P, [1.0, 1.0, 1.0], sharp,
        cw * n * n, 1.0 / (1.0 + cw), variant=1, interpret=True,
        tile_h=16, tile_w=128))
    want = nlmeans_ref(img, P, K, sharp, [1.0, 1.0, 1.0],
                       center_weight=cw, scale=1.0, scattering=0.3)
    m = max(max(abs(a), abs(b)) for a, b in offsets) + P + 1
    err = np.abs(want - got)[:, m:-m, m:-m]
    assert err.max() < 2e-6, err.max()


def test_scatter_matches_reference_formula():
    # spot values of the C expression (|i1|^3 + 7|i1|sqrt|i2|, scaled
    # whole): computed by hand from nlmeans_core.c:94-103
    assert scatter(1.0, 0.0, 5, 3) == 5
    assert scatter(2.0, 0.0, 5, 3) == 10       # scale hits base offset
    assert scatter(1.0, 1.0, 2, 4) == int((8 + 7 * 2 * 2.0) / 6.0 + 2)
    assert scatter(1.0, 1.0, -2, 4) == int(-(8 + 28.0) / 6.0 - 2)
    from ansel_tpu.pixel.nlmeans import _scatter

    for a in range(-7, 8):
        for b in range(-7, 8):
            assert _scatter(1.0, 0.73, a, b) == (
                scatter(1.0, 0.73, a, b), scatter(1.0, 0.73, b, a))
