"""ashift auto-fit: Nelder-Mead solver, line detection, homography fit.

Mirrors the reference's structural-analysis semantics
(`ashift.c:1429-1601` line_detect, `:2039-2159` model_fitness,
`:2162-2345` nmsfit).
"""

import math

import numpy as np
import pytest

from ansel_tpu.ops import ashift_fit as af
from ansel_tpu.ops.ashift import AshiftParams, _homography
from ansel_tpu.utils.neldermead import simplex


def test_simplex_rosenbrock():
    def rosen(p):
        return (1 - p[0]) ** 2 + 100.0 * (p[1] - p[0] ** 2) ** 2

    x = [-1.2, 1.0]
    iters = simplex(rosen, x, 2, 1e-12, 1.0, 2000)
    assert iters < 2000
    assert abs(x[0] - 1.0) < 1e-3 and abs(x[1] - 1.0) < 1e-3


def test_simplex_constrained():
    def f(p):
        return (p[0] - 5.0) ** 2

    def clamp(p):
        p[0] = min(p[0], 2.0)

    x = [0.0]
    simplex(f, x, 1, 1e-10, 1.0, 500)
    # unconstrained solve reaches 5; with the projection it rides the bound
    xc = [0.0]
    simplex(f, xc, 1, 1e-10, 1.0, 500, constrain=clamp)
    assert abs(x[0] - 5.0) < 1e-3
    assert xc[0] <= 2.0 + 1e-9


def _grid_image(h=480, w=640, spacing=64, thickness=2):
    """White grid on dark background, (3, h, w)."""
    img = np.full((h, w), 0.05, np.float32)
    for x in range(spacing, w - spacing // 2, spacing):
        img[:, x:x + thickness] = 0.9
    for y in range(spacing, h - spacing // 2, spacing):
        img[y:y + thickness, :] = 0.9
    return np.stack([img] * 3)


def _warp_image(img, p: AshiftParams):
    """Transform content by the forward homography of p (the ashift op's
    own inverse-gather warp)."""
    import jax

    from ansel_tpu.core.types import Colorspace, ImageSpec
    from ansel_tpu.ops.ashift import Ashift
    from ansel_tpu.ops.base import PlanContext

    h, w = img.shape[-2:]
    spec = ImageSpec(width=w, height=h, channels=3,
                     colorspace=Colorspace.CAMERA_RGB)
    op = Ashift()
    ctx = PlanContext(meta=None)
    plan = op.plan(ctx, spec, p)
    out = jax.jit(lambda x: op.apply(x, None, plan, ctx))(img)
    return np.asarray(out)


def test_detect_lines_grid():
    img = _grid_image()
    lines = af.detect_lines(img, max_dim=640)
    vert = [ln for ln in lines if ln.type == af.LINE_VERTICAL_SELECTED]
    hori = [ln for ln in lines if ln.type == af.LINE_HORIZONTAL_SELECTED]
    # 9 vertical and 6 horizontal grid bars (each bar may yield 2 edges)
    assert len(vert) >= 6
    assert len(hori) >= 4
    # detected verticals must actually be vertical
    for ln in vert:
        ang = math.degrees(math.atan2(ln.p2[1] - ln.p1[1],
                                      ln.p2[0] - ln.p1[0]))
        assert abs(abs(ang) - 90) < 5


def _fitness_of(p, lines, w, h,
                linetype=af.LINE_RELEVANT | af.LINE_SELECTED):
    mask = (af.LINE_MASK if linetype & af.LINE_DIRVERT
            else af.LINE_RELEVANT | af.LINE_SELECTED)
    fit = af._Fit(lines=lines, width=w, height=h,
                  f_length_kb=af.DEFAULT_F_LENGTH, orthocorr=0.0,
                  aspect=1.0, rotation=p.rotation,
                  lensshift_v=p.lensshift_v, lensshift_h=p.lensshift_h,
                  shear=p.shear, linetype=linetype, linemask=mask)
    return af.model_fitness([], fit)


def test_autofit_recovers_rotation():
    img = _grid_image()
    tilted = _warp_image(img, AshiftParams(rotation=3.0))
    fitted = af.autofit(tilted, axis=af.FIT_ROTATION_BOTH_LINES)
    # content was rotated +3 deg; the corrective warp applies the forward
    # homography, so the fit must counter-rotate by about -3 deg
    assert abs(fitted.rotation + 3.0) < 0.4
    h, w = img.shape[-2:]
    lines = af.detect_lines(tilted, max_dim=640)
    before = _fitness_of(AshiftParams(), lines, w, h)
    after = _fitness_of(fitted, lines, w, h)
    assert after < 0.2 * before


def test_autofit_straightens_keystone():
    img = _grid_image()
    key = _warp_image(img, AshiftParams(lensshift_v=0.4))
    fitted = af.autofit(key, axis=af.FIT_VERTICALLY)
    assert fitted.lensshift_v < -0.1  # counter-shift
    h, w = img.shape[-2:]
    lines = af.detect_lines(key, max_dim=640)
    # long structural verticals (not the ~5px stair-step artifacts the
    # warp's aliasing produces, which the fitness down-weights)
    vlines = [ln for ln in lines
              if ln.type == af.LINE_VERTICAL_SELECTED and ln.length > 40]
    assert len(vlines) >= 6
    M = _homography(fitted.rotation, fitted.lensshift_v,
                    fitted.lensshift_h, fitted.shear,
                    af.DEFAULT_F_LENGTH, 0.0, 1.0, w, h)
    # fitted homography must map the structural verticals near-vertical
    angs = []
    for ln in vlines:
        P1, P2 = M @ ln.p1, M @ ln.p2
        x1, y1 = P1[:2] / P1[2]
        x2, y2 = P2[:2] / P2[2]
        angs.append(abs(abs(math.degrees(math.atan2(y2 - y1,
                                                    x2 - x1))) - 90))
    assert np.median(angs) < 1.5
    # and the fit's own objective (vertical lines) must collapse vs the
    # identity (short stair-step artifact lines keep the floor non-zero)
    vt = af.LINE_RELEVANT | af.LINE_SELECTED | af.LINE_DIRVERT
    before = _fitness_of(AshiftParams(), lines, w, h, linetype=vt)
    after = _fitness_of(fitted, lines, w, h, linetype=vt)
    assert after < 0.6 * before


def test_fit_raises_without_lines():
    flat = np.full((3, 256, 256), 0.4, np.float32)
    with pytest.raises(af.FitError):
        af.autofit(flat)


def test_fit_not_enough_lines():
    img = _grid_image()
    lines = af.detect_lines(img, max_dim=640)
    only_h = [ln for ln in lines
              if ln.type == af.LINE_HORIZONTAL_SELECTED]
    with pytest.raises(af.FitError):
        af.fit_params(AshiftParams(), only_h, 640, 480,
                      axis=af.FIT_VERTICALLY)
