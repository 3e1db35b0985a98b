"""3D LUT file loaders: .cube (Adobe/IRIDAS), .3dl (Autodesk), Hald CLUT
images (PNG).

Reference: `/root/reference/src/iop/lut3d.c` lut file parsing
(parse_cube/parse_3dl/read png haldclut paths, :~300-700).  Loaders are
host-side NumPy; the (level^3, 3) table is handed to the op as a device
constant.
"""

from __future__ import annotations

import os

import numpy as np


def load_cube(path: str) -> np.ndarray:
    """-> (level, level, level, 3) float32, indexed [b][g][r] like dt's
    flat layout r + g*L + b*L^2."""
    level = None
    rows = []
    domain_min = np.zeros(3)
    domain_max = np.ones(3)
    with open(path, "r", errors="replace") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            tok = line.split()
            key = tok[0].upper()
            if key == "LUT_3D_SIZE":
                level = int(tok[1])
            elif key == "LUT_1D_SIZE":
                raise ValueError("1D LUTs not supported in lut3d")
            elif key == "DOMAIN_MIN":
                domain_min = np.array([float(v) for v in tok[1:4]])
            elif key == "DOMAIN_MAX":
                domain_max = np.array([float(v) for v in tok[1:4]])
            elif key in ("TITLE",):
                continue
            else:
                try:
                    rows.append([float(tok[0]), float(tok[1]), float(tok[2])])
                except (ValueError, IndexError):
                    continue
    if level is None or len(rows) < level ** 3:
        raise ValueError(f"malformed .cube: level={level} rows={len(rows)}")
    data = np.asarray(rows[:level ** 3], np.float32)
    span = np.maximum(domain_max - domain_min, 1e-9)
    data = (data - domain_min) / span
    return data.reshape(level, level, level, 3).astype(np.float32)


def load_3dl(path: str) -> np.ndarray:
    """Autodesk .3dl: first non-comment line is the mesh, then R-fastest
    integer rows scaled by the max code value."""
    rows = []
    mesh = None
    with open(path, "r", errors="replace") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            tok = line.split()
            vals = []
            try:
                vals = [float(v) for v in tok]
            except ValueError:
                continue
            if mesh is None:
                mesh = vals  # the shaper/mesh line
                continue
            if len(vals) >= 3:
                rows.append(vals[:3])
    if mesh is None:
        raise ValueError("malformed .3dl: no mesh line")
    level = int(round(len(rows) ** (1.0 / 3.0)))
    if level ** 3 != len(rows):
        raise ValueError(f"malformed .3dl: {len(rows)} rows")
    data = np.asarray(rows, np.float32)
    maxcode = float(data.max())
    # common encodings: 10-bit (1023), 12-bit (4095), 16-bit
    for full in (1023.0, 4095.0, 65535.0):
        if maxcode <= full:
            data = data / full
            break
    # .3dl is blue-fastest: reorder to r-fastest
    data = data.reshape(level, level, level, 3)  # [r][g][b]
    data = np.transpose(data, (2, 1, 0, 3))      # -> [b][g][r]
    return np.ascontiguousarray(data, np.float32)


def load_hald(path: str) -> np.ndarray:
    """Hald CLUT image: an NxN image where N = level^1.5 (level = k^2)."""
    from PIL import Image

    img = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
    n = img.shape[0]
    level = int(round(n ** (2.0 / 3.0)))
    if level ** 3 != n * n or img.shape[1] != n:
        raise ValueError(f"not a Hald CLUT: {img.shape}")
    return img.reshape(level, level, level, 3).astype(np.float32)


def load_lut3d(path: str) -> np.ndarray:
    ext = os.path.splitext(path)[1].lower()
    if ext == ".cube":
        return load_cube(path)
    if ext == ".3dl":
        return load_3dl(path)
    if ext in (".png", ".jpg", ".jpeg", ".tif", ".tiff"):
        return load_hald(path)
    raise ValueError(f"unsupported 3D LUT format: {ext}")
