"""NLM Pallas kernel vs the XLA scan reference (interpret mode).

The kernel's only permitted deviation is at the image boundary ring
(width = patch radius): it computes patch distances on the edge-padded
image, the XLA path edge-pads the distance plane itself.
"""

import numpy as np
import pytest

from ansel_tpu.kernels.nlm_pallas import nlm_pallas
from ansel_tpu.pixel.nlmeans import _scatter, nlmeans


@pytest.fixture(scope="module")
def img():
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    return jnp.asarray(rng.random((3, 96, 640), np.float32))


def test_iop_variant_matches_xla(img):
    offs = tuple((dy, dx) for dy in range(-3, 4) for dx in range(-3, 4))
    ref = nlmeans(img, 2, 3, 0.02, [1.0, 0.5, 0.5], center_weight=-1.0,
                  force_xla=True)
    out = nlm_pallas(img, offs, 2, (1.0, 0.5, 0.5), 0.02, 0.0, 1.0,
                     variant=0, interpret=True)
    d = np.abs(np.asarray(ref) - np.asarray(out))
    assert d[:, 8:-8, 8:-8].max() < 1e-5


def test_denoiseprofile_variant_matches_xla(img):
    sc = 0.0964
    offs = tuple(_scatter(1.0, sc, dy, dx)
                 for dy in range(-4, 5) for dx in range(-4, 5))
    cw, n = 0.1, 3
    ref = nlmeans(img, 1, 4, 0.005, [1.0, 1.0, 1.0], center_weight=cw,
                  scattering=sc, force_xla=True)
    out = nlm_pallas(img, offs, 1, (1.0, 1.0, 1.0), 0.005, cw * n * n,
                     1.0 / (1.0 + cw), variant=1, interpret=True)
    d = np.abs(np.asarray(ref) - np.asarray(out))
    assert d[:, 8:-8, 8:-8].max() < 1e-5
