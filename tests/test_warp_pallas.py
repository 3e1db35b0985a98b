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
