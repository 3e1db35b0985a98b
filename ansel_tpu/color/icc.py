"""ICC profile reader: matrix+TRC and LUT (mft2 / mAB) profiles.

Reference behavior: `/root/reference/src/common/colorspaces.c` (LCMS2
profile load `dt_colorspaces_get_profile` :2300-2661 and the fast-path
matrix extraction `dt_ioppr_add_profile_info_to_list`,
`src/develop/iop_profile.c:300-520` — matrix in/out + TRC LUTs +
unbounded linear extrapolation coefficients; LUT-tag profiles fall back
to full LCMS transforms).

This is a pure-python ICC v2/v4 binary parser covering the tags the
pipeline needs:
  * rXYZ/gXYZ/bXYZ + rTRC/gTRC/bTRC ('curv' gamma / sampled, 'para')
    with the D50 chromatic-adaptation 'chad' tag -> 3x3 matrix + TRC
  * 'A2B0'/'B2A0' in 'mft1'/'mft2' (lut8/lut16) and 'mAB '/'mBA '
    forms -> input curves + 3D CLUT + output curves
The in-graph application uses gather-free Hermite fits for 1-D curves
(pixel/curves.curve_coeffs) and the shared tetrahedral sampler
(ops/lut3d.lut3d_sample) for CLUTs.
"""

from __future__ import annotations

import dataclasses
import struct
from typing import List, Optional

import numpy as np

_S15F16 = 65536.0


@dataclasses.dataclass
class ICCProfile:
    kind: str                      # "matrix" | "lut"
    to_xyz: Optional[np.ndarray] = None       # (3,3) RGB->XYZ D50
    trc: Optional[List[np.ndarray]] = None    # 3 x sampled curves [0,1]
    # LUT form (device -> PCS for A2B)
    in_curves: Optional[List[np.ndarray]] = None
    clut: Optional[np.ndarray] = None          # (N,N,N,3)
    out_curves: Optional[List[np.ndarray]] = None
    lut_matrix: Optional[np.ndarray] = None    # (3,3) pre-matrix (mft)
    pcs: str = "XYZ"               # "XYZ" | "Lab"
    white: Optional[np.ndarray] = None
    # B2A LUT (PCS -> device), (in_curves, clut, out_curves, matrix,
    # legacy16) — legacy16 marks mft2's 0xFF00-max Lab encoding
    b2a: Optional[tuple] = None


def _read_tags(buf: bytes):
    (count,) = struct.unpack_from(">I", buf, 128)
    tags = {}
    for k in range(count):
        sig, off, size = struct.unpack_from(">4sII", buf, 132 + 12 * k)
        tags[sig.decode("latin1")] = (off, size)
    return tags


def _xyz_tag(buf, off):
    x, y, z = struct.unpack_from(">iii", buf, off + 8)
    return np.array([x, y, z]) / _S15F16


def _curve_tag(buf, off, size):
    typ = buf[off:off + 4]
    if typ == b"curv":
        (n,) = struct.unpack_from(">I", buf, off + 8)
        if n == 0:
            return np.linspace(0.0, 1.0, 256)
        if n == 1:
            (g,) = struct.unpack_from(">H", buf, off + 12)
            gamma = g / 256.0
            return np.linspace(0.0, 1.0, 256) ** gamma
        vals = np.frombuffer(buf, ">u2", n, off + 12) / 65535.0
        return vals.astype(np.float64)
    if typ == b"para":
        (ft,) = struct.unpack_from(">H", buf, off + 8)
        nparams = {0: 1, 1: 3, 2: 4, 3: 5, 4: 7}[ft]
        prm = [v / _S15F16 for v in struct.unpack_from(
            f">{nparams}i", buf, off + 12)]
        x = np.linspace(0.0, 1.0, 1024)
        g = prm[0]
        if ft == 0:
            y = x ** g
        elif ft == 1:
            a, b = prm[1], prm[2]
            y = np.where(x >= -b / a, (a * x + b) ** g, 0.0)
        elif ft == 2:
            a, b, c = prm[1], prm[2], prm[3]
            y = np.where(x >= -b / a, (a * x + b) ** g + c, c)
        elif ft == 3:
            a, b, c, d = prm[1], prm[2], prm[3], prm[4]
            y = np.where(x >= d, (a * x + b) ** g, c * x)
        else:
            a, b, c, d, e, f = prm[1:7]
            y = np.where(x >= d, (a * x + b) ** g + e, c * x + f)
        return np.clip(y, 0.0, None)
    raise ValueError(f"unsupported curve type {typ!r}")


def _parse_mft(buf, off, size, wide):
    """'mft1'/'mft2' (lut8/lut16) -> (matrix, in_curves, clut, out_curves)."""
    n_in, n_out, n_grid = struct.unpack_from(">BBB", buf, off + 8)
    if n_in != 3 or n_out != 3:
        raise ValueError("only 3->3 LUTs supported")
    m = np.array(struct.unpack_from(">9i", buf, off + 12)) / _S15F16
    matrix = m.reshape(3, 3)
    pos = off + 48
    if wide:
        n_ent_in, n_ent_out = struct.unpack_from(">HH", buf, pos)
        pos += 4
        dt, scale, esize = ">u2", 65535.0, 2
    else:
        n_ent_in, n_ent_out = 256, 256
        dt, scale, esize = ">u1", 255.0, 1
    in_curves = []
    for _ in range(3):
        in_curves.append(np.frombuffer(buf, dt, n_ent_in, pos) / scale)
        pos += n_ent_in * esize
    n_clut = n_grid ** 3 * 3
    clut = (np.frombuffer(buf, dt, n_clut, pos) / scale).reshape(
        n_grid, n_grid, n_grid, 3)
    pos += n_clut * esize
    out_curves = []
    for _ in range(3):
        out_curves.append(np.frombuffer(buf, dt, n_ent_out, pos) / scale)
        pos += n_ent_out * esize
    return matrix, in_curves, clut, out_curves


def _parse_mab(buf, off, size):
    """'mAB ' lutAtoBType -> (in/B curves, clut, out/A curves, matrix)."""
    n_in, n_out = struct.unpack_from(">BB", buf, off + 8)
    if n_in != 3 or n_out != 3:
        raise ValueError("only 3->3 LUTs supported")
    off_b, off_mat, off_m, off_clut, off_a = struct.unpack_from(
        ">IIIII", buf, off + 12)

    def curves_at(o):
        if o == 0:
            return None
        out = []
        pos = off + o
        for _ in range(3):
            c = _curve_tag(buf, pos, size)
            # tag entries are 4-byte aligned
            typ = buf[pos:pos + 4]
            if typ == b"curv":
                (n,) = struct.unpack_from(">I", buf, pos + 8)
                step = 12 + 2 * n
            else:
                (ft,) = struct.unpack_from(">H", buf, pos + 8)
                step = 12 + 4 * {0: 1, 1: 3, 2: 4, 3: 5, 4: 7}[ft]
            pos += (step + 3) & ~3
            out.append(c)
        return out

    clut = None
    if off_clut:
        p0 = off + off_clut
        grid = struct.unpack_from(">16B", buf, p0)[:3]
        (prec,) = struct.unpack_from(">B", buf, p0 + 16)
        n = grid[0] * grid[1] * grid[2] * 3
        if prec == 1:
            clut = np.frombuffer(buf, ">u1", n, p0 + 20) / 255.0
        else:
            clut = np.frombuffer(buf, ">u2", n, p0 + 20) / 65535.0
        clut = clut.reshape(grid[0], grid[1], grid[2], 3)
    matrix = None
    if off_mat:
        m = np.array(struct.unpack_from(">12i", buf, off + off_mat)) \
            / _S15F16
        matrix = m[:9].reshape(3, 3)
    return curves_at(off_a), clut, curves_at(off_b), matrix


def _parse_b2a(data, tags):
    """B2A0/B2A1 (PCS -> device) in mft1/mft2/'mBA ' form, or None."""
    for tag in ("B2A0", "B2A1"):
        if tag not in tags:
            continue
        off, size = tags[tag]
        typ = data[off:off + 4]
        if typ in (b"mft1", b"mft2"):
            matrix, inc, clut, outc = _parse_mft(data, off, size,
                                                 typ == b"mft2")
            return (inc, clut, outc, matrix, typ == b"mft2")
        if typ == b"mBA ":
            # lutBtoAType shares the mAB layout; the 'A' curves sit on
            # the device side and 'B' on the PCS side, so the roles of
            # the parsed curve sets swap relative to A2B
            a_c, clut, b_c, matrix = _parse_mab(data, off, size)
            return (b_c, clut, a_c, matrix, False)
    return None


def parse_icc(data: bytes) -> ICCProfile:
    if len(data) < 132 or data[36:40] != b"acsp":
        raise ValueError("not an ICC profile")
    pcs = data[20:24].decode("latin1").strip()
    tags = _read_tags(data)

    white = None
    if "wtpt" in tags:
        white = _xyz_tag(data, tags["wtpt"][0])

    # chromatic adaptation (absolute -> D50-relative correction)
    chad = None
    if "chad" in tags:
        off = tags["chad"][0]
        m = np.array(struct.unpack_from(">9i", data, off + 8)) / _S15F16
        chad = m.reshape(3, 3)

    if all(t in tags for t in ("rXYZ", "gXYZ", "bXYZ", "rTRC")):
        cols = [_xyz_tag(data, tags[t][0])
                for t in ("rXYZ", "gXYZ", "bXYZ")]
        to_xyz = np.stack(cols, axis=1)
        trc = []
        for t in ("rTRC", "gTRC", "bTRC"):
            off, size = tags.get(t, tags["rTRC"])
            trc.append(_curve_tag(data, off, size))
        return ICCProfile(kind="matrix", to_xyz=to_xyz, trc=trc,
                          pcs=pcs, white=white)

    for tag in ("A2B0", "A2B1"):
        if tag not in tags:
            continue
        off, size = tags[tag]
        typ = data[off:off + 4]
        if typ in (b"mft1", b"mft2"):
            matrix, inc, clut, outc = _parse_mft(data, off, size,
                                                 typ == b"mft2")
            return ICCProfile(kind="lut", in_curves=inc, clut=clut,
                              out_curves=outc, lut_matrix=matrix,
                              pcs=pcs, white=white,
                              b2a=_parse_b2a(data, tags))
        if typ == b"mAB ":
            inc, clut, outc, matrix = _parse_mab(data, off, size)
            return ICCProfile(kind="lut", in_curves=inc, clut=clut,
                              out_curves=outc, lut_matrix=matrix,
                              pcs=pcs, white=white,
                              b2a=_parse_b2a(data, tags))
    b2a = _parse_b2a(data, tags)
    if b2a is not None:
        return ICCProfile(kind="lut", pcs=pcs, white=white, b2a=b2a)
    raise ValueError("profile has neither matrix+TRC nor supported LUT")


def load_icc(path: str) -> ICCProfile:
    with open(path, "rb") as f:
        return parse_icc(f.read())


# --- in-graph application ---------------------------------------------------

def _fit_curve(samples: np.ndarray, nodes: int = 24):
    """Monotone 1-D curve -> gather-free Hermite node fit."""
    from ..pixel.curves import MONOTONE_HERMITE, curve_coeffs

    xs = np.linspace(0.0, 1.0, len(samples))
    pick = np.unique(np.linspace(0, len(samples) - 1,
                                 min(nodes, len(samples))).astype(int))
    return curve_coeffs(xs[pick], samples[pick], MONOTONE_HERMITE)


def profile_to_xyz_fn(prof: ICCProfile):
    """-> f(rgb (3,H,W) in [0,1] device values) -> XYZ D50, in-graph."""
    import jax.numpy as jnp

    from ..pixel.curves import eval_curve

    if prof.kind == "matrix":
        coeffs = [_fit_curve(t) for t in prof.trc]
        M = prof.to_xyz.tolist()

        def f(rgb):
            lin = jnp.stack([
                eval_curve(jnp.clip(rgb[ch], 0.0, 1.0), *coeffs[ch])
                for ch in range(3)])
            from .transforms import apply_matrix

            return apply_matrix(lin, M)
        return f

    in_coeffs = [_fit_curve(t) for t in (prof.in_curves
                                         or [np.linspace(0, 1, 2)] * 3)]
    out_coeffs = [_fit_curve(t) for t in (prof.out_curves
                                          or [np.linspace(0, 1, 2)] * 3)]
    grid = prof.clut.shape[0]
    # lut3d_sample expects idx = r + g*L + b*L^2 with r fastest; ICC CLUT
    # is [in0][in1][in2] C-order (in2 fastest) -> transpose
    flat = prof.clut.transpose(2, 1, 0, 3).reshape(-1, 3).astype(
        np.float32)
    pcs_lab = prof.pcs.startswith("Lab")

    def f(rgb):
        from ..ops.lut3d import lut3d_sample

        t = jnp.stack([eval_curve(jnp.clip(rgb[ch], 0.0, 1.0),
                                  *in_coeffs[ch]) for ch in range(3)])
        out = lut3d_sample(jnp.clip(t, 0.0, 1.0), flat, grid, 0)
        out = jnp.stack([eval_curve(jnp.clip(out[ch], 0.0, 1.0),
                                    *out_coeffs[ch]) for ch in range(3)])
        if pcs_lab:
            from .transforms import lab_to_xyz

            L = out[0] * 100.0
            a = out[1] * 255.0 - 128.0
            b = out[2] * 255.0 - 128.0
            return lab_to_xyz(jnp.stack([L, a, b]),
                              jnp.asarray([0.9642, 1.0, 0.8249]))
        # PCSXYZ encoding: value * (1 + 32767/32768) ~ [0, 1.99997]
        return out * 1.999969482421875
    return f


def xyz_to_device_fn(prof: ICCProfile):
    """jax fn: D50 XYZ (3, H, W) -> device values via the B2A LUT
    (PCS encode -> mft matrix -> input curves -> CLUT -> output curves;
    lut8/lut16Type processing model, ICC.1 spec §10.9/10.10)."""
    import jax.numpy as jnp

    from ..pixel.curves import eval_curve

    if prof.b2a is None:
        raise ValueError("profile has no B2A LUT")
    inc, clut, outc, matrix, legacy16 = prof.b2a
    in_coeffs = [_fit_curve(t) for t in (inc or [np.linspace(0, 1, 2)] * 3)]
    out_coeffs = [_fit_curve(t) for t in (outc
                                          or [np.linspace(0, 1, 2)] * 3)]
    grid = clut.shape[0]
    flat = clut.transpose(2, 1, 0, 3).reshape(-1, 3).astype(np.float32)
    pcs_lab = prof.pcs.startswith("Lab")
    # mft2 keeps the legacy 16-bit Lab encoding whose max code is 0xFF00
    lab_scale = 65280.0 / 65535.0 if legacy16 else 1.0

    def f(xyz):
        from ..ops.lut3d import lut3d_sample

        if pcs_lab:
            from .transforms import xyz_to_lab

            lab = xyz_to_lab(xyz, jnp.asarray([0.9642, 1.0, 0.8249]))
            enc = jnp.stack([lab[0] / 100.0,
                             (lab[1] + 128.0) / 255.0,
                             (lab[2] + 128.0) / 255.0]) * lab_scale
        else:
            enc = xyz / 1.999969482421875
            if matrix is not None:
                from .transforms import apply_matrix

                enc = apply_matrix(enc, matrix.tolist())
        enc = jnp.clip(enc, 0.0, 1.0)
        t = jnp.stack([eval_curve(enc[ch], *in_coeffs[ch])
                       for ch in range(3)])
        out = lut3d_sample(jnp.clip(t, 0.0, 1.0), flat, grid, 0)
        return jnp.stack([eval_curve(jnp.clip(out[ch], 0.0, 1.0),
                                     *out_coeffs[ch]) for ch in range(3)])
    return f
