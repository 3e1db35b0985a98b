"""Two-pass Pallas warp kernel vs the direct-gather reference.

Reference behavior: bilinear warp resampling as in
`/root/reference/src/common/interpolation.c:312` (bilinear path used by
lens/ashift warps).
"""

import jax.numpy as jnp
import numpy as np

from ansel_tpu.kernels import warp_pallas as wp


def _smooth_img(c, h, w, seed=0):
    yy, xx = np.mgrid[0:h, 0:w]
    chans = [np.sin(yy / (19.0 + 5 * i)) * np.cos(xx / (29.0 + 3 * i))
             for i in range(c)]
    return jnp.asarray(np.stack(chans).astype(np.float32))


def test_warp_model_matches_gather_radial():
    h, w = 192, 640
    img = _smooth_img(3, h, w)
    cy, cx = (h - 1) / 2, (w - 1) / 2
    rn = float(np.hypot(cy, cx))
    a = -0.04

    def coord(y, x):
        yn, xn = (y - cy) / rn, (x - cx) / rn
        m = 1.0 + a * (yn * yn + xn * xn)
        return cy + (y - cy) * m, cx + (x - cx) * m

    out = wp.warp_model(img, coord, max_dy=abs(a) * rn * 1.2,
                        max_dx=abs(a) * rn * 1.2, interpret=True)
    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]
    sy, sx = coord(yy, xx)
    ref = wp.warp_gather_ref(img, jnp.broadcast_to(sy, (1, h, w)),
                             jnp.broadcast_to(sx, (1, h, w)))
    err = np.abs(np.asarray(out) - np.asarray(ref))
    assert err.max() < 1e-3, err.max()


def test_warp_model_per_channel_tca():
    h, w = 128, 512
    img = _smooth_img(3, h, w)
    cy, cx = (h - 1) / 2, (w - 1) / 2
    rn = float(np.hypot(cy, cx))
    tcas = [1.004, 1.0, 0.996]

    def coord(y, x, ch):
        m = tcas[ch]
        return cy + (y - cy) * m, cx + (x - cx) * m

    out = wp.warp_model(img, coord, max_dy=0.005 * rn, max_dx=0.005 * rn,
                        per_channel=True, interpret=True)
    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]
    sy = jnp.stack([jnp.broadcast_to(cy + (yy - cy) * t, (h, w))
                    for t in tcas])
    sx = jnp.stack([jnp.broadcast_to(cx + (xx - cx) * t, (h, w))
                    for t in tcas])
    ref = wp.warp_gather_ref(img, sy, sx)
    err = np.abs(np.asarray(out) - np.asarray(ref))
    assert err.max() < 1e-3, err.max()


def test_warp_identity_is_exact():
    h, w = 96, 384
    img = _smooth_img(1, h, w)

    def coord(y, x):
        return y * 1.0, x * 1.0

    out = wp.warp_model(img, coord, max_dy=4, max_dx=4, interpret=True)
    assert np.allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_warp_static_bounds_and_kernel_match_gather():
    """_warpcommon: host bound probing + offset peel + Pallas warp
    (interpret) == direct gather for a small homography."""
    import jax.numpy as jnp
    import numpy as np

    from ansel_tpu.kernels.warp_pallas import warp_gather_ref, warp_model
    from ansel_tpu.ops._warpcommon import _host_bounds

    H, W = 96, 256
    ang = np.deg2rad(2.0)
    ca, sa = np.cos(ang), np.sin(ang)
    cy, cx = H / 2, W / 2

    def coords(y, x):
        return (cy + ca * (y - cy) - sa * (x - cx) + 17.0,
                cx + sa * (y - cy) + ca * (x - cx) - 33.0)

    b = _host_bounds(coords, H, W)
    assert b is not None
    oy, ox, ry, rx = b
    assert abs(oy - 17) <= 1 and abs(ox + 33) <= 1
    yy, xx = np.meshgrid(np.arange(H, dtype=np.float32),
                         np.arange(W, dtype=np.float32), indexing="ij")
    img = (np.sin(yy / 7.0) * np.cos(xx / 11.0) * 0.5
           + 0.5).astype(np.float32)[None]
    got = np.asarray(warp_model(jnp.asarray(img), coords, ry, rx,
                                interpret=True, out_shape=(H, W),
                                src_offset=(oy, ox)))
    sy, sx = coords(yy, xx)
    want = np.asarray(warp_gather_ref(
        jnp.asarray(img), jnp.asarray(sy)[None], jnp.asarray(sx)[None]))
    ok = ((sy > 2) & (sy < H - 3) & (sx > 2) & (sx < W - 3))
    err = np.abs(got[0] - want[0])[ok]
    # two-pass (sheared-lattice) vs direct 2D bilinear differ at
    # O(curvature); on this smooth field they agree tightly
    assert err.max() < 2e-3, err.max()
