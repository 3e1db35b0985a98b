"""Markesteijn X-Trans demosaic vs the scalar reference mirror.

Gates VERDICT r2 weak #4 (no reference gate for Markesteijn).
Reference: `/root/reference/src/iop/demosaic/markesteijn.c` (cites
inside the mirror).
"""

import numpy as np
import pytest

from mirrors import markesteijn_ref as ref

# Fuji X-Trans III pattern (rows of 6)
XTRANS6 = ((1, 2, 0, 1, 0, 2),
           (0, 1, 1, 2, 1, 1),
           (2, 1, 1, 0, 1, 1),
           (1, 0, 2, 1, 2, 0),
           (2, 1, 1, 0, 1, 1),
           (0, 1, 1, 2, 1, 1))


def _mosaic(h=48, w=48, seed=0):
    rng = np.random.default_rng(seed)
    # smooth scene + edges: gradient + a disc, mosaicked by the pattern
    yy, xx = np.mgrid[0:h, 0:w]
    # smooth scene: hard edges make the (discrete) direction selection
    # flip on float rounding, which is not what this gate measures
    bump = np.exp(-(((yy - h / 2) ** 2 + (xx - w / 2) ** 2)
                    / (0.08 * h * w)))
    rgbs = np.stack([
        0.2 + 0.6 * xx / w,
        0.3 + 0.5 * yy / h + 0.3 * bump,
        0.25 + 0.4 * bump,
    ])
    rgbs += 0.01 * rng.random((3, h, w))
    sel = np.asarray(XTRANS6)[yy % 6, xx % 6]
    raw = np.take_along_axis(rgbs, sel[None], axis=0)[0]
    return np.asarray(raw, np.float32)


@pytest.mark.parametrize("passes", [1, 3])
def test_markesteijn_matches_reference(passes):
    import jax.numpy as jnp

    from ansel_tpu.kernels import markesteijn_pallas

    raw = _mosaic()
    want = ref.markesteijn(raw, XTRANS6, passes=passes)

    got = np.asarray(markesteijn_pallas.xtrans_markesteijn_pallas(
        jnp.asarray(raw), tuple(np.asarray(XTRANS6).reshape(-1)),
        passes=passes, interpret=True))
    got = np.moveaxis(got, 0, -1)[:raw.shape[0], :raw.shape[1]]

    # interior only: the mirror's tile borders use the reference's
    # mirrored-edge fill, the production kernel uses its own padding
    m = 16
    gi = got[m:-m, m:-m]
    wi = want[m:-m, m:-m]
    err = np.abs(gi - wi)
    rel = err / np.maximum(np.abs(wi), 0.05)
    assert np.isfinite(gi).all()
    # Structural agreement: identical interpolation stencils up to the
    # blend's discrete direction selection (ties can flip per-pixel)
    assert np.median(rel) < 1e-3, np.median(rel)
    assert np.percentile(rel, 95) < 0.02, np.percentile(rel, 95)
    assert rel.mean() < 5e-3, rel.mean()
