"""pixel/resample mirror tests against interpolation.c's kernel formulas.

Reference: /root/reference/src/pixel/interpolation.c —
_maketaps_bilinear (:175-193), _maketaps_bicubic (:200-234, Catmull-Rom
a = -0.5), _maketaps_mitchell (:253-290, B = C = 1/3), upsampling tap
placement (:320-342), downsampling output-unit kernel + renorm
(:354-388).  The weight oracle below is an independent transcription of
those piecewise polynomials.
"""

import numpy as np
import pytest

from ansel_tpu.pixel.resample import (METHODS, kernel_weight,
                                      resample_matrix)


def _oracle(method, t):
    """Independent transcription of the reference tap polynomials."""
    t = abs(float(t))
    if method == "bilinear":
        return max(1.0 - t, 0.0)
    if method == "bicubic":
        if t <= 1.0:
            return ((3.0 * t * t - 5.0 * t) * t + 2.0) / 2.0
        if t < 2.0:
            return (t * (5.0 * t - 8.0 - t * t) + 4.0) / 2.0
        return 0.0
    if method == "mitchell":
        if t <= 1.0:
            return (7.0 / 6.0) * t**3 - 2.0 * t * t + 8.0 / 9.0
        if t < 2.0:
            return -(7.0 / 18.0) * t**3 + 2.0 * t * t \
                - (10.0 / 3.0) * t + 16.0 / 9.0
        return 0.0
    raise ValueError(method)


@pytest.mark.parametrize("method", METHODS)
def test_kernel_weights_match_reference(method):
    ts = np.linspace(-2.5, 2.5, 101)
    got = kernel_weight(method, ts)
    want = np.array([_oracle(method, t) for t in ts])
    np.testing.assert_allclose(got, want, atol=1e-12)


@pytest.mark.parametrize("method", METHODS)
def test_partition_of_unity_on_integer_grid(method):
    """Taps at integer-offset grids sum to 1 (the reference's norm-free
    upsampling relies on this)."""
    for phase in (0.0, 0.25, 0.5, 0.9):
        offs = np.arange(-3, 4) + phase
        assert abs(kernel_weight(method, offs).sum() - 1.0) < 1e-6, phase


@pytest.mark.parametrize("method", METHODS)
@pytest.mark.parametrize("n_out,n_in", [(64, 40), (40, 64), (100, 33)])
def test_matrix_rows_normalized(method, n_out, n_in):
    M = resample_matrix(method, n_out, n_in)
    np.testing.assert_allclose(M.sum(axis=1), 1.0, atol=2e-3)


def test_bilinear_upsample_reproduces_linear_ramp():
    n_in, n_out = 16, 40
    M = resample_matrix("bilinear", n_out, n_in)
    x = np.arange(n_in, dtype=np.float32)
    y = M @ x
    # away from the clamped borders the ramp is reproduced exactly
    expect = np.arange(n_out) * (n_in / n_out)
    interior = (expect >= 1) & (expect <= n_in - 2)
    np.testing.assert_allclose(y[interior], expect[interior], atol=1e-4)


def test_methods_differ_and_select_via_params():
    """Sidecar-selected resampler changes the output (VERDICT r3 #10)."""
    import jax

    from ansel_tpu import HistoryItem, compile_pipeline
    from ansel_tpu.io.synthetic import synth_raw

    raw, meta, _ = synth_raw(h=96, w=128)
    outs = []
    for method in (0, 2):
        pipe = compile_pipeline(
            meta,
            [HistoryItem("exposure", {"exposure": 0.4}),
             HistoryItem("finalscale", {"method": method})],
            scale=1.5)
        outs.append(np.asarray(pipe.output_array(raw)))
    a, b = outs
    assert a.shape == b.shape
    assert np.abs(a - b).max() > 1e-5  # bilinear != mitchell
    assert np.isfinite(a).all() and np.isfinite(b).all()


def test_downscale_preserves_constant():
    M = resample_matrix("mitchell", 30, 97)
    x = np.full(97, 0.37, np.float32)
    np.testing.assert_allclose(M @ x, 0.37, atol=1e-3)
