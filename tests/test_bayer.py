"""CFA helpers: parity/position/color selection against a numpy mirror."""

import numpy as np

from ansel_tpu.core.types import CFAPattern
from ansel_tpu.ops import _bayer


def _np_position_map(vals, h, w, py, px):
    out = np.empty((h, w), np.float32)
    for y in range(h):
        for x in range(w):
            out[y, x] = vals[((y + py) % 2) * 2 + (x + px) % 2]
    return out


def test_position_select_matches_numpy():
    vals = [1.0, 2.0, 3.0, 4.0]
    for py in (0, 1):
        for px in (0, 1):
            got = np.asarray(_bayer.position_select(vals, 8, 128, py, px))
            assert np.array_equal(got, _np_position_map(vals, 8, 128, py, px))


def test_color_masks_partition():
    for cfa in (CFAPattern.RGGB, CFAPattern.BGGR, CFAPattern.GRBG, CFAPattern.GBRG):
        m = np.asarray(_bayer.color_masks(cfa, 16, 128))
        assert np.array_equal(m.sum(axis=0), np.ones((16, 128)))
        # greens are half the sites
        assert m[1].mean() == 0.5


def test_color_select_uses_g2_on_second_green_row():
    got = np.asarray(_bayer.color_select([1.0, 2.0, 3.0, 4.0],
                                         CFAPattern.RGGB, 4, 128))
    assert got[0, 0] == 1.0   # R
    assert got[0, 1] == 2.0   # G (first green)
    assert got[1, 0] == 4.0   # G2 (second green)
    assert got[1, 1] == 3.0   # B


def test_cfa_shift():
    assert CFAPattern.RGGB.shifted(0, 1) is CFAPattern.GRBG
    assert CFAPattern.RGGB.shifted(1, 0) is CFAPattern.GBRG
    assert CFAPattern.RGGB.shifted(1, 1) is CFAPattern.BGGR
    assert CFAPattern.RGGB.shifted(2, 2) is CFAPattern.RGGB
