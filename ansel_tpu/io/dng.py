"""DNG loader backed by the native C++ decoder (native/rawdec).

The reference delegates camera decode to rawspeed/LibRaw (C++); this is
the framework's native-runtime equivalent — TIFF IFD walk, packed
10/12/14/16-bit mosaics, and lossless-JPEG (compression 7) strips, the
formats a DNG pipeline needs.  Loaded through ctypes; the shared library
is built on first use with g++ and cached next to the source.

Reference tag semantics: /root/reference/src/imageio/imageio_dng.c and
the DNG 1.4 specification.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

from ..core.types import CFAPattern, RawMeta

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                    "rawdec", "rawdec.cpp")
_SO = os.path.join(os.path.dirname(_SRC), "librawdec.so")


class _RawInfo(ctypes.Structure):
    _fields_ = [
        ("width", ctypes.c_uint32), ("height", ctypes.c_uint32),
        ("bits", ctypes.c_uint32), ("compression", ctypes.c_uint32),
        ("cfa", ctypes.c_uint32 * 4),
        ("black", ctypes.c_double), ("white", ctypes.c_double),
        ("wb", ctypes.c_double * 3),
        ("cam_to_xyz", ctypes.c_double * 9),
        ("n_strips", ctypes.c_uint32),
        ("iso", ctypes.c_uint32),
    ]


def _lib() -> ctypes.CDLL:
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        src = os.path.abspath(_SRC)
        so = os.path.abspath(_SO)
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            subprocess.run(["g++", "-O2", "-shared", "-fPIC", src, "-o", so],
                           check=True, capture_output=True)
        lib = ctypes.CDLL(so)
        lib.rawdec_info.restype = ctypes.c_int
        lib.rawdec_info.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.POINTER(_RawInfo),
            ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64)]
        lib.rawdec_decode.restype = ctypes.c_int
        lib.rawdec_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.POINTER(_RawInfo),
            ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_uint16)]
        _LIB = lib
        return lib


_CFA_ENUM = {
    (0, 1, 1, 2): CFAPattern.RGGB,
    (1, 0, 2, 1): CFAPattern.GRBG,
    (1, 2, 0, 1): CFAPattern.GBRG,
    (2, 1, 1, 0): CFAPattern.BGGR,
}


def load_dng(path: str) -> Tuple[np.ndarray, RawMeta]:
    """-> (mosaic float32 (H, W) in sensor units, RawMeta)."""
    with open(path, "rb") as f:
        buf = f.read()
    lib = _lib()
    info = _RawInfo()
    offs = (ctypes.c_uint64 * 64)()
    cnts = (ctypes.c_uint64 * 64)()
    rc = lib.rawdec_info(buf, len(buf), ctypes.byref(info), offs, cnts)
    if rc != 0:
        raise ValueError(f"{path}: not a decodable DNG/TIFF (rc={rc})")
    H, W = info.height, info.width
    out = np.empty((H, W), np.uint16)
    rows_per_strip = (H + max(info.n_strips, 1) - 1) // max(info.n_strips, 1)
    rc = lib.rawdec_decode(
        buf, len(buf), ctypes.byref(info), offs, cnts, rows_per_strip,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)))
    if rc != 0:
        raise ValueError(f"{path}: raw decode failed (rc={rc}, "
                         f"compression={info.compression})")

    cfa = _CFA_ENUM.get(tuple(info.cfa), CFAPattern.RGGB)
    # AsShotNeutral is the illuminant in camera space -> WB multipliers
    wb = np.asarray(info.wb, np.float64)
    wb = np.where(wb > 1e-9, 1.0 / np.maximum(wb, 1e-9), 1.0)
    wb = wb / max(wb[1], 1e-9)
    cam_to_xyz = np.asarray(info.cam_to_xyz, np.float64).reshape(3, 3)
    meta = RawMeta(
        width=W, height=H, cfa=cfa,
        black_levels=(float(info.black),) * 4,
        white_point=float(info.white),
        wb_coeffs=(float(wb[0]), float(wb[1]), float(wb[2]), 0.0),
        cam_to_xyz=(tuple(cam_to_xyz.reshape(-1))
                    if np.abs(cam_to_xyz).sum() > 1e-9 else None),
        iso=float(info.iso or 100),
    )
    return out.astype(np.float32), meta
