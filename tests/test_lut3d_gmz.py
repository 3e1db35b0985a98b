"""lut3dgmic parity: compressed-CLUT keypoints -> dense LUT -> pixels.

Reference: /root/reference/src/iop/lut3dgmic.cpp (decompress + gmz read)
wired through lut3d.c calculate_clut_compressed (:245-276).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _corner_keypoints(swap_rb=True):
    """8 cube corners mapped to (optionally R/B-swapped) colors + the
    identity center — a smooth, exactly-known scattered set."""
    kps = []
    for r in (0, 255):
        for g in (0, 255):
            for b in (0, 255):
                out = (b, g, r) if swap_rb else (r, g, b)
                kps.append((r, g, b) + out)
    kps.append((128, 128, 128, 128, 128, 128))
    return np.asarray(kps, np.uint8)


def test_decompress_exact_at_keypoints():
    from ansel_tpu.io.gmz import decompress_clut

    kp = _corner_keypoints()
    clut = decompress_clut(kp, level=16)
    assert clut.shape == (16, 16, 16, 3)
    # corners are grid points at level 16: check exactness (RBF
    # interpolates; -cut clamps to [0,1])
    for r, g, b, vr, vg, vb in kp[:8]:
        ir, ig, ib = (int(v) // 17 for v in (r, g, b))
        got = clut[ib, ig, ir] * 255.0
        np.testing.assert_allclose(got, [vr, vg, vb], atol=0.5)


def test_gmz_roundtrip(tmp_path):
    from ansel_tpu.io.gmz import read_gmz, write_gmz

    kp1 = _corner_keypoints()
    kp2 = _corner_keypoints(swap_rb=False)
    p = tmp_path / "set.gmz"
    write_gmz(str(p), [("swap", kp1), ("identity", kp2)])
    luts = read_gmz(str(p))
    assert [n for n, _ in luts] == ["swap", "identity"]
    np.testing.assert_array_equal(luts[0][1], kp1)
    np.testing.assert_array_equal(luts[1][1], kp2)


def test_lut3d_op_inline_keypoints():
    """A lut3d history item with inline compressed keypoints (the form
    darktable sidecars carry) applies the decompressed LUT."""
    from ansel_tpu.core.params import params_class
    from ansel_tpu.core.types import Colorspace, ImageSpec
    from ansel_tpu.io.synthetic import synth_raw
    from ansel_tpu.ops.base import PlanContext, get_op
    from ansel_tpu.ops.lut3d import CS_LIN_REC709

    kp = _corner_keypoints()           # R/B swap LUT
    p = params_class("lut3d")(
        nb_keypoints=kp.shape[0], c_clut=kp.tobytes(),
        colorspace=CS_LIN_REC709, interpolation=1)
    op = get_op("lut3d")
    _, meta, _ = synth_raw(h=64, w=64)
    spec = ImageSpec(height=64, width=64, channels=3,
                     colorspace=Colorspace.WORK_RGB)
    ctx = PlanContext(meta=meta, scale=1.0)
    plan = op.plan(ctx, spec, p)
    assert plan.static[2] == 48        # DT_IOP_LUT3D_CLUT_LEVEL
    c = jax.tree.map(jnp.asarray, op.coeffs(ctx, plan, p))
    x = np.zeros((3, spec.pad_h, spec.pad_w), np.float32)
    x[0], x[1], x[2] = 0.8, 0.3, 0.1   # reddish input
    y = np.asarray(op.apply(jnp.asarray(x), c, plan, ctx))
    # the swap happens in the linear Rec709 application space; verify
    # in that space: out channels approximately swapped
    assert np.isfinite(y).all()
    r_in, b_in = x[0, 0, 0], x[2, 0, 0]
    r_out, b_out = y[0, 5, 5], y[2, 5, 5]
    assert abs(r_out - b_in) < 0.12 and abs(b_out - r_in) < 0.12, \
        (r_out, b_out)


def test_lut3d_blob_roundtrip_binary_keypoints():
    """v3 params blob encode/decode keeps keypoint BYTES intact
    (binary data must not round-trip through utf-8)."""
    from ansel_tpu.core.params import params_class

    kp = _corner_keypoints()
    cls = params_class("lut3d")
    p = cls(nb_keypoints=kp.shape[0], c_clut=kp.tobytes())
    blob = cls.codec.encode(p)
    q = cls.codec.decode(blob)
    assert bytes(q.c_clut)[: kp.nbytes] == kp.tobytes()
    assert q.nb_keypoints == kp.shape[0]
