"""Structure-tensor steering of the HARMONIC chroma fill.

Gates kernels/highlights_harmonic's _adaptive_tensor (transcription of
coefficient_field.c:_cf_adaptive_tensor) and _masked_aniso_laplace (the
chroma.h Weickert-stencil fill) at the unit level: tensor regimes on
ramp vs edge guides, edge-respecting diffusion vs the isotropic fill,
the maximum principle, and the obstacle projection.
"""

import numpy as np

import jax.numpy as jnp

from ansel_tpu.kernels.highlights_harmonic import (_adaptive_tensor,
                                                   _masked_aniso_laplace,
                                                   _masked_laplace)


def test_tensor_ramp_prefers_gradient_transport():
    """Clean linear ramp: m -> 0, so D ~ c2*t t^T + 1*g g^T — the
    gradient (radial) eigenvalue dominates the tangent one."""
    xx = np.tile(np.linspace(0.0, 1.0, 64, dtype=np.float32), (64, 1))
    dxx, dxy, dyy = (np.asarray(v) for v in
                     _adaptive_tensor(jnp.asarray(xx)))
    # gradient is +x: D_xx = dg (gradient weight), D_yy = dt (tangent)
    inner = (slice(8, -8), slice(8, -8))
    assert (dxx[inner] > dyy[inner] + 0.05).all(), \
        (dxx[inner].min(), dyy[inner].max())
    assert np.abs(dxy[inner]).max() < 0.05


def test_tensor_hard_edge_prefers_tangent_transport():
    """Hard step edge: residual variance no ramp explains -> m -> 1,
    D ~ 1*t t^T + c2*g g^T — transport along the edge, not across."""
    g = np.zeros((64, 64), np.float32)
    g[:, 32:] = 1.0
    dxx, dxy, dyy = (np.asarray(v) for v in _adaptive_tensor(jnp.asarray(g)))
    band = (slice(8, -8), slice(30, 33))      # the box-window edge zone
    # gradient is +x at the edge: tangent (y) weight must dominate
    assert (dyy[band] > dxx[band] + 0.2).all(), \
        (dyy[band].min(), dxx[band].max())


def _edge_fill_setup():
    """A hole crossed by a hard edge in the guide; anchors colored by
    side (left 1.0, right 0.2)."""
    H = W = 64
    yy, xx = np.mgrid[0:H, 0:W]
    hole = ((yy - 32) ** 2 + (xx - 32) ** 2) < 18 ** 2
    steer = np.where(xx < 32, 1.0, 0.1).astype(np.float32)
    field = np.where(xx < 32, 1.0, 0.2).astype(np.float32)
    # seed holes with the valid mean, as _solve_pyramid's coarsest
    # level does — a zero seed takes ~1e3 sweeps to drain through the
    # deliberately tiny cross-edge conductivity
    u = np.where(hole, 0.6, field).astype(np.float32)
    return (jnp.asarray(u), jnp.asarray(field), jnp.asarray(hole),
            jnp.asarray(steer), hole, xx)


def test_steered_fill_respects_the_edge():
    u, fixed, hole, steer, hole_np, xx = _edge_fill_setup()
    iso = np.asarray(_masked_laplace(u, fixed, hole, 200))
    ani = np.asarray(_masked_aniso_laplace(u, fixed, hole, steer, 400))
    left_core = hole_np & (xx < 26)
    right_core = hole_np & (xx > 38)
    # steered: each side of the core stays near its own anchors
    # (measured: ani 0.947/0.250 vs iso 0.908/0.286 — the residual leak
    # is the Weickert floor + finite c2, which the reference shares)
    assert abs(ani[left_core].mean() - 1.0) < 0.07, ani[left_core].mean()
    assert abs(ani[right_core].mean() - 0.2) < 0.07, ani[right_core].mean()
    # and beats the isotropic fill's cross-edge mixing on both sides
    assert (abs(ani[left_core].mean() - 1.0)
            < abs(iso[left_core].mean() - 1.0) - 0.02)
    assert (abs(ani[right_core].mean() - 0.2)
            < abs(iso[right_core].mean() - 0.2) - 0.02)


def test_steered_fill_maximum_principle_and_anchors():
    u, fixed, hole, steer, hole_np, _ = _edge_fill_setup()
    ani = np.asarray(_masked_aniso_laplace(u, fixed, hole, steer, 300))
    assert ani[hole_np].min() >= 0.2 - 1e-3
    assert ani[hole_np].max() <= 1.0 + 1e-5
    # anchors untouched
    np.testing.assert_array_equal(ani[~hole_np], np.asarray(fixed)[~hole_np])


def test_obstacle_projection_binds():
    u, fixed, hole, steer, hole_np, _ = _edge_fill_setup()
    obs = jnp.full(u.shape, 0.7, u.dtype)
    ani = np.asarray(_masked_aniso_laplace(u, fixed, hole, steer, 300,
                                           obstacle=obs))
    assert ani[hole_np].min() >= 0.7 - 1e-5
