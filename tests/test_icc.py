"""ICC profile reader + colorin/colorout FILE-profile paths.

Reference behaviors: `src/common/colorspaces.c` LCMS profile load and
the colorin/colorout DT_COLORSPACE_FILE branches."""

import struct

import numpy as np
import pytest


def _icc_header(pcs=b"XYZ "):
    h = bytearray(128)
    h[16:20] = b"RGB "
    h[20:24] = pcs
    h[36:40] = b"acsp"
    return h


def _tagged(tags):
    """tags: list of (sig, payload) -> full profile bytes."""
    table = b""
    payloads = b""
    off = 132 + 12 * len(tags)
    for sig, payload in tags:
        table += struct.pack(">4sII", sig, off, len(payload))
        payloads += payload
        off += len(payload)
    body = struct.pack(">I", len(tags)) + table + payloads
    prof = _icc_header() + body
    prof[0:4] = struct.pack(">I", len(prof))
    return bytes(prof)


def _xyz_tag(v):
    return b"XYZ \0\0\0\0" + struct.pack(
        ">iii", *(int(round(x * 65536)) for x in v))


def _curv_gamma(g):
    return b"curv\0\0\0\0" + struct.pack(">IH", 1, int(round(g * 256))) \
        + b"\0\0"


def make_matrix_icc(gamma=2.2):
    # sRGB-like primaries in XYZ D50 (columns)
    r = (0.4360, 0.2225, 0.0139)
    g = (0.3851, 0.7169, 0.0971)
    b = (0.1431, 0.0606, 0.7139)
    return _tagged([
        (b"wtpt", _xyz_tag((0.9642, 1.0, 0.8249))),
        (b"rXYZ", _xyz_tag(r)), (b"gXYZ", _xyz_tag(g)),
        (b"bXYZ", _xyz_tag(b)),
        (b"rTRC", _curv_gamma(gamma)), (b"gTRC", _curv_gamma(gamma)),
        (b"bTRC", _curv_gamma(gamma)),
    ])


def make_lut_icc(grid=5):
    """mft2 A2B0: linear in/out curves + CLUT that scales XYZ-encoded
    output to 0.5 * input (identity-ish, PCSXYZ encoding)."""
    n_ent = 2
    head = b"mft2\0\0\0\0" + struct.pack(">BBBB", 3, 3, grid, 0)
    matrix = struct.pack(">9i", *(int(round(v * 65536)) for v in
                                  (1, 0, 0, 0, 1, 0, 0, 0, 1)))
    ent = struct.pack(">HH", n_ent, n_ent)
    curve = struct.pack(">2H", 0, 65535)
    g1 = np.linspace(0.0, 1.0, grid)
    rr, gg, bb = np.meshgrid(g1, g1, g1, indexing="ij")
    clut = np.stack([rr, gg, bb], -1) * 0.5  # halve in PCS encoding
    clut16 = np.round(clut * 65535).astype(">u2").tobytes()
    payload = head + matrix + ent + curve * 3 + clut16 + curve * 3
    return _tagged([(b"wtpt", _xyz_tag((0.9642, 1.0, 0.8249))),
                    (b"A2B0", payload)])


def test_parse_matrix_profile():
    from ansel_tpu.color.icc import parse_icc

    prof = parse_icc(make_matrix_icc())
    assert prof.kind == "matrix"
    assert prof.to_xyz.shape == (3, 3)
    # columns sum approximately to D50 white
    assert np.allclose(prof.to_xyz.sum(1), [0.9642, 1.0, 0.8249],
                       atol=1e-3)
    # gamma 2.2 curve
    assert abs(prof.trc[0][128] - (128 / 255.0) ** 2.2) < 1e-3


def test_parse_lut_profile_and_apply():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ansel_tpu.color.icc import parse_icc, profile_to_xyz_fn

    prof = parse_icc(make_lut_icc())
    assert prof.kind == "lut"
    assert prof.clut.shape == (5, 5, 5, 3)
    f = profile_to_xyz_fn(prof)
    rgb = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (3, 8, 16)).astype(np.float32))
    xyz = np.asarray(f(rgb))
    # CLUT halves, PCSXYZ encoding doubles (1.99997): out ~= in
    assert np.allclose(xyz, np.asarray(rgb), atol=0.02)


def test_colorin_colorout_file_profiles(tmp_path):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ansel_tpu.core.types import Colorspace, ImageSpec, RawMeta
    from ansel_tpu.ops import base as ob
    from ansel_tpu.ops.colorin import Colorin, ColorinParams
    from ansel_tpu.ops.colorout import Colorout, ColoroutParams

    icc_path = str(tmp_path / "custom.icc")
    with open(icc_path, "wb") as fh:
        fh.write(make_matrix_icc(gamma=2.2))

    rng = np.random.default_rng(1)
    x = rng.uniform(0.05, 0.95, (3, 16, 32)).astype(np.float32)
    meta = RawMeta(width=32, height=16)
    ctx = ob.PlanContext(meta=meta, scale=1.0)

    # colorin FILE: gamma-encoded sRGB-ish input -> linear work RGB
    op_in = Colorin()
    spec = ImageSpec(width=32, height=16,
                     colorspace=Colorspace.CAMERA_RGB)
    p_in = ColorinParams(type=0, filename=icc_path)
    plan = op_in.plan(ctx, spec, p_in)
    work = np.asarray(op_in.apply(jnp.asarray(x),
                                  op_in.coeffs(ctx, plan, p_in),
                                  plan, ctx))
    assert np.isfinite(work).all()
    # gray stays gray through profile + work conversion
    gray = np.full((3, 4, 4), 0.5, np.float32)
    wg = np.asarray(op_in.apply(jnp.asarray(gray),
                                op_in.coeffs(ctx, plan, p_in), plan, ctx))
    assert np.abs(wg - wg.mean(axis=0)).max() < 5e-3

    # colorout FILE with the same profile approximately inverts colorin
    op_out = Colorout()
    spec_w = ImageSpec(width=32, height=16,
                       colorspace=Colorspace.WORK_RGB)
    p_out = ColoroutParams(type=0, filename=icc_path)
    plan_o = op_out.plan(ctx, spec_w, p_out)
    back = np.asarray(op_out.apply(jnp.asarray(work),
                                   op_out.coeffs(ctx, plan_o, p_out),
                                   plan_o, ctx))
    assert np.abs(back - x).max() < 0.02


def test_unknown_profile_fails_loudly(tmp_path):
    from ansel_tpu.color.icc import parse_icc

    with pytest.raises(ValueError):
        parse_icc(b"not an icc profile at all" * 10)


def make_b2a_icc(grid=9):
    """mft2 B2A0 only: CLUT 'decodes' PCSXYZ (x2) -> device == XYZ."""
    n_ent = 2
    head = b"mft2\0\0\0\0" + struct.pack(">BBBB", 3, 3, grid, 0)
    matrix = struct.pack(">9i", *(int(round(v * 65536)) for v in
                                  (1, 0, 0, 0, 1, 0, 0, 0, 1)))
    ent = struct.pack(">HH", n_ent, n_ent)
    curve = struct.pack(">2H", 0, 65535)
    g1 = np.linspace(0.0, 1.0, grid)
    rr, gg, bb = np.meshgrid(g1, g1, g1, indexing="ij")
    clut = np.clip(np.stack([rr, gg, bb], -1) * 2.0, 0.0, 1.0)
    clut16 = np.round(clut * 65535).astype(">u2").tobytes()
    payload = head + matrix + ent + curve * 3 + clut16 + curve * 3
    return _tagged([(b"wtpt", _xyz_tag((0.9642, 1.0, 0.8249))),
                    (b"B2A0", payload)])


def test_b2a_lut_roundtrip(tmp_path):
    """xyz_to_device_fn drives the B2A pipeline: with a x2-decoding CLUT
    the device value equals the XYZ input (PCSXYZ encoding inverts)."""
    import jax.numpy as jnp

    from ansel_tpu.color.icc import parse_icc, xyz_to_device_fn

    prof = parse_icc(make_b2a_icc())
    assert prof.b2a is not None
    rng = np.random.default_rng(2)
    xyz = rng.uniform(0.0, 0.9, (3, 8, 12)).astype(np.float32)
    dev = np.asarray(xyz_to_device_fn(prof)(jnp.asarray(xyz)))
    assert np.abs(dev - xyz).max() < 0.02  # CLUT quantization only


def test_colorout_b2a_profile(tmp_path):
    """colorout CS_FILE with a LUT-only profile renders through B2A."""
    import jax.numpy as jnp

    from ansel_tpu.core.types import (Colorspace, ImageSpec, RawMeta)
    from ansel_tpu.ops import base as ob
    from ansel_tpu.ops.colorout import Colorout, ColoroutParams

    path = tmp_path / "b2a.icc"
    path.write_bytes(make_b2a_icc())
    op = Colorout()
    p = ColoroutParams(type=0, filename=str(path))
    ctx = ob.PlanContext(meta=RawMeta(width=16, height=8))
    spec = ImageSpec(width=16, height=8, colorspace=Colorspace.WORK_RGB)
    plan = op.plan(ctx, spec, p)
    rng = np.random.default_rng(3)
    x = rng.uniform(0.0, 1.0, (3, 8, 16)).astype(np.float32)
    y = np.asarray(op.apply(jnp.asarray(x), op.coeffs(ctx, plan, p),
                            plan, ctx))
    assert y.shape == x.shape and np.isfinite(y).all()
    assert 0.0 <= y.min() and y.max() <= 1.0
