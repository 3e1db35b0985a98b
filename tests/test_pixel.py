"""Shared pixel-algorithm kernels (pixel/)."""


def test_blocked_cumsum_matches_numpy():
    """MXU block-prefix cumsum == jnp.cumsum (reassociation noise only)."""
    import jax.numpy as jnp
    import numpy as np

    from ansel_tpu.pixel.blur import blocked_cumsum

    rng = np.random.default_rng(11)
    x = rng.uniform(-1.0, 1.0, (2, 530, 1200)).astype(np.float32)
    for ax in (-1, -2):
        got = np.asarray(blocked_cumsum(jnp.asarray(x), ax))
        want = np.cumsum(x, axis=ax, dtype=np.float64)
        assert np.abs(got - want).max() < 5e-4


def test_bilateral_upsample_axis_matches_matrix():
    """Phase-decomposed upsample == the dense interp-matrix it replaced."""
    import jax.numpy as jnp
    import numpy as np

    from ansel_tpu.pixel.bilateralgrid import upsample_axis

    rng = np.random.default_rng(7)
    g = rng.uniform(0.0, 1.0, (2, 13, 29)).astype(np.float32)
    for ss, axis in ((4, -1), (3, -2), (1, -1)):
        n_in = g.shape[axis]
        n_out = n_in * ss
        # dense cell-centered bilinear matrix (the old formulation)
        pos = (np.arange(n_out) + 0.5) / ss - 0.5
        i0 = np.clip(np.floor(pos), 0, n_in - 1).astype(int)
        i1 = np.clip(i0 + 1, 0, n_in - 1)
        f = np.clip(pos - i0, 0.0, 1.0)
        M = np.zeros((n_out, n_in), np.float32)
        M[np.arange(n_out), i0] += 1.0 - f
        M[np.arange(n_out), i1] += f
        want = np.moveaxis(
            np.tensordot(M, np.moveaxis(g, axis, 0), axes=1), 0, axis)
        got = np.asarray(upsample_axis(jnp.asarray(g), ss, axis))
        assert np.abs(got - want).max() < 1e-6, (ss, axis)
