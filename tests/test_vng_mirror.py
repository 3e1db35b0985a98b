"""VNG kernels vs the NumPy transcription oracle (mirrors/vng_ref).

Gates `ansel_tpu/kernels/vng.py` — both the Bayer VNG4 and the 3-color
X-Trans variant — pixel-for-pixel against the reference math
(`vng.c:33-202` + `demosaic/basic.c:22-125`) on a synthetic scene.
Interior margin 6 (the reference's border ring runs a separate
interpolation).  The oracle caught three real parity bugs on first
run: a non-reference output clamp in both variants, and unweighted
3x3 neighbour means in the X-Trans bilinear pre-pass where the
reference weights by adjacency (1/2/4).
"""

import numpy as np
import pytest

from ansel_tpu.core.types import CFAPattern
from ansel_tpu.kernels.vng import (_FILTERS, vng4_demosaic,
                                   xtrans_vng_demosaic)

from mirrors.vng_ref import vng_ref

M = 6

XTRANS6 = ((1, 2, 0, 1, 0, 2),
           (0, 1, 1, 2, 1, 1),
           (2, 1, 1, 0, 1, 1),
           (1, 0, 2, 1, 2, 0),
           (2, 1, 1, 0, 1, 1),
           (0, 1, 1, 2, 1, 1))


def _scene(h=48, w=64, seed=7):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    scene = (0.3 + 0.25 * np.sin(yy / 4.0) + 0.25 * np.cos(xx / 6.0)
             + 0.2 * rng.rand(h, w))
    return np.clip(scene, 0.0, 1.0).astype(np.float32)


@pytest.mark.parametrize("cfa", [CFAPattern.RGGB, CFAPattern.BGGR,
                                 CFAPattern.GRBG, CFAPattern.GBRG])
def test_vng4_matches_reference_math(cfa):
    m = _scene()
    ref = vng_ref(m, filters=_FILTERS[cfa])
    got = np.asarray(vng4_demosaic(m, cfa))
    refc = np.stack([ref[:, :, 0], ref[:, :, 1], ref[:, :, 2]])
    d = np.abs(refc[:, M:-M, M:-M] - got[:, M:-M, M:-M])
    assert d.max() == 0.0, (cfa, float(d.max()))


def test_xtrans_vng_matches_reference_math():
    m = _scene(seed=9)
    flat = tuple(v for row in XTRANS6 for v in row)
    ref = vng_ref(m, xtrans=XTRANS6)
    got = np.asarray(xtrans_vng_demosaic(m, flat))
    refc = np.stack([ref[:, :, 0], ref[:, :, 1], ref[:, :, 2]])
    d = np.abs(refc[:, M:-M, M:-M] - got[:, M:-M, M:-M])
    assert d.max() == 0.0, float(d.max())


def test_vng_keeps_signed_values():
    """The reference does not clamp: a step scene drives some
    interpolated chroma negative and VNG must preserve it."""
    m = _scene(seed=13)
    m[:, 30:] *= 0.05
    got = np.asarray(vng4_demosaic(m.astype(np.float32),
                                   CFAPattern.RGGB))
    ref = vng_ref(m.astype(np.float32), filters=_FILTERS[CFAPattern.RGGB])
    refc = np.stack([ref[:, :, 0], ref[:, :, 1], ref[:, :, 2]])
    d = np.abs(refc[:, M:-M, M:-M] - got[:, M:-M, M:-M])
    assert d.max() == 0.0, float(d.max())
