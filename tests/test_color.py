"""Color management math invariants."""

import numpy as np

from ansel_tpu.color import matrices as cm


def test_profile_white_maps_to_white():
    for name in cm.PRIMARIES:
        M = cm.profile_matrix(name, to_xyz=True)
        w = M @ np.ones(3)
        ref = cm.xy_to_XYZ(*cm.WP_D65)
        assert np.allclose(w, ref, atol=1e-10), name


def test_srgb_matrix_matches_standard():
    # IEC 61966-2-1 reference values (4 significant digits)
    M = cm.profile_matrix("srgb", to_xyz=True)
    expected = np.array(
        [
            [0.4124, 0.3576, 0.1805],
            [0.2126, 0.7152, 0.0722],
            [0.0193, 0.1192, 0.9505],
        ]
    )
    assert np.allclose(M, expected, atol=2e-4)


def test_rgb_to_rgb_identity():
    M = cm.rgb_to_rgb_matrix("rec2020", "rec2020")
    assert np.allclose(M, np.eye(3), atol=1e-12)


def test_rec2020_to_srgb_roundtrip():
    A = cm.rgb_to_rgb_matrix("rec2020", "srgb")
    B = cm.rgb_to_rgb_matrix("srgb", "rec2020")
    assert np.allclose(A @ B, np.eye(3), atol=1e-10)


def test_bradford_adaptation_identity():
    w = cm.xy_to_XYZ(*cm.WP_D65)
    M = cm.adaptation_matrix(w, w)
    assert np.allclose(M, np.eye(3), atol=1e-12)


def test_normalized_cam_white():
    cam = np.array([[0.5, 0.3, 0.2], [0.2, 0.7, 0.1], [0.1, 0.2, 0.8]])
    M = cm.normalized_cam_to_work(cam)
    assert np.allclose(M @ np.ones(3), np.ones(3), atol=1e-12)


def test_srgb_trc_roundtrip():
    import jax.numpy as jnp

    from ansel_tpu.color.transforms import srgb_decode, srgb_encode

    x = jnp.linspace(0.0, 1.0, 257)
    y = srgb_decode(srgb_encode(x))
    assert np.allclose(np.asarray(y), np.asarray(x), atol=1e-6)
