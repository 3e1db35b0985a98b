"""LMMSE kernel vs the NumPy transcription oracle (mirrors/lmmse_ref).

Gates `ansel_tpu/kernels/lmmse.py` pixel-for-pixel against the
reference math (`lmmse.c:129-576`) on a synthetic scene, per refine
mode.  Interior margin 20: the reference leaves the outer ring of each
(outermost) tile un-refined (rrmin/ccmin = 6 plus stage reach), the
kernel treats borders with edge-replicated pads — a documented
deviation that propagates ~2 px inward per refinement stage.
"""

import numpy as np
import pytest

from ansel_tpu.core.types import CFAPattern
from ansel_tpu.kernels.lmmse import lmmse_demosaic

from mirrors.lmmse_ref import lmmse_ref

M = 20  # interior margin (border treatment is the documented deviation)


def _scene(h=72, w=88, seed=3):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    scene = (0.3 + 0.25 * np.sin(yy / 5.0) + 0.25 * np.cos(xx / 7.0)
             + 0.15 * rng.rand(h, w))
    return np.clip(scene, 0.0, 1.0).astype(np.float32)


@pytest.mark.parametrize("mode", [0, 1, 2, 3, 4])
def test_lmmse_matches_reference_math(mode):
    m = _scene()
    fc = CFAPattern.RGGB.color_at
    ref = lmmse_ref(m, fc, scaler=1.0, mode=mode)
    got = np.asarray(lmmse_demosaic(m, CFAPattern.RGGB, 1.0, refine=mode))
    d = np.abs(ref[:, M:-M, M:-M] - got[:, M:-M, M:-M])
    # float-exact modulo accumulation order (measured <= 4.2e-7) plus
    # the analytic-vs-LUT gamma deviation (< 1e-6 on this scene)
    assert d.max() < 2e-6, (mode, float(d.max()))


def test_lmmse_bggr_phase():
    """CFA phase handling: BGGR runs through the same masks."""
    m = _scene(seed=11)
    fc = CFAPattern.BGGR.color_at
    ref = lmmse_ref(m, fc, scaler=1.0, mode=1)
    got = np.asarray(lmmse_demosaic(m, CFAPattern.BGGR, 1.0, refine=1))
    d = np.abs(ref[:, M:-M, M:-M] - got[:, M:-M, M:-M])
    assert d.max() < 2e-6, float(d.max())


def test_lmmse_scaler_roundtrip():
    """scaler = max(processed_maximum): gamma runs on normalized values
    and the output is rescaled (lmmse.c:158-159, :566-568)."""
    m = _scene(seed=5) * 3.7
    fc = CFAPattern.RGGB.color_at
    ref = lmmse_ref(m, fc, scaler=3.7, mode=1)
    got = np.asarray(lmmse_demosaic(m, CFAPattern.RGGB, 3.7, refine=1))
    d = np.abs(ref[:, M:-M, M:-M] - got[:, M:-M, M:-M])
    assert d.max() < 8e-6, float(d.max())
