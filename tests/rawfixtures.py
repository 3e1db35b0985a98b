"""Synthetic raw-container fixtures for native/rawdec tests.

No real camera files exist in this environment, so each writer emits a
minimal but spec-conformant file: the TIFF/IFD structure, CR2's
lossless-JPEG (T.81 SOF3) stream + Canon slice tag, NEF/ARW packed
SubIFD layouts, and the Fujifilm RAF container with its BE meta records.
Round-tripping these exercises every container walk in rawdec.cpp.

Reference structures: /root/reference/src/imageio/imageio_rawspeed.cc
(decoder dispatch), DNG 1.4 spec, ITU-T T.81 annex H (lossless).
"""

from __future__ import annotations

import struct

import numpy as np


# --------------------------------------------------------------- LJ92 encode

def _huff_fixed():
    """All 17 ssss symbols at code length 5 (canonical)."""
    counts = [0] * 17
    counts[5] = 17
    values = list(range(17))
    codes = {}
    code = 0
    for ln in range(1, 17):
        for _ in range(counts[ln]):
            codes[values[len(codes)]] = (code, ln)
            code += 1
        code <<= 1
    return counts, values, codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, val, nbits):
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (val & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8

    def flush(self):
        if self.n:
            self.put(0x7F, 8 - self.n)  # pad with 1s? use 0s via put
        return bytes(self.out)


def lj92_encode(img: np.ndarray, comps: int, precision: int) -> bytes:
    """img (h, w_total) uint16 with w_total % comps == 0; predictor 1,
    matching rawdec.cpp's decoder (default DC top-left, above for col 0,
    left otherwise)."""
    h, wt = img.shape
    w = wt // comps
    counts, values, codes = _huff_fixed()
    bw = _BitWriter()
    default_dc = 1 << (precision - 1)
    data = img.reshape(h, w, comps).astype(np.int64)
    for y in range(h):
        for x in range(w):
            for c in range(comps):
                if y == 0 and x == 0:
                    pred = default_dc
                elif x == 0:
                    pred = int(data[y - 1, 0, c])
                elif y == 0:
                    pred = int(data[y, x - 1, c])
                else:
                    pred = int(data[y, x - 1, c])  # predictor 1 = left
                diff = int(data[y, x, c]) - pred
                diff = ((diff + (1 << 15)) & 0xFFFF) - (1 << 15)  # mod 2^16
                if diff == 0:
                    ssss = 0
                else:
                    ssss = max(diff, -diff).bit_length()
                code, ln = codes[ssss]
                bw.put(code, ln)
                if ssss:
                    v = diff if diff >= 0 else diff + (1 << ssss) - 1
                    bw.put(v, ssss)
    scan = bw.flush()

    dht = bytes([0x00] + counts[1:] + values)
    sof_comps = b"".join(bytes([i + 1, 0x11, 0]) for i in range(comps))
    sof = struct.pack(">BHHB", precision, h, w, comps) + sof_comps
    sos_comps = b"".join(bytes([i + 1, 0x00]) for i in range(comps))
    sos = bytes([comps]) + sos_comps + bytes([1, 0, 0])  # Ss=1 pred, Se, AhAl
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xc4" + struct.pack(">H", len(dht) + 2) + dht
    out += b"\xff\xc3" + struct.pack(">H", len(sof) + 2) + sof
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    out += scan
    return bytes(out)


# ------------------------------------------------------------------ TIFF

class TiffWriter:
    """Little-endian TIFF builder with explicit IFD chaining."""

    def __init__(self, header_extra=b""):
        self.buf = bytearray(b"II*\x00\x00\x00\x00\x00" + header_extra)
        self.ifd_offsets = []

    def _align(self):
        while len(self.buf) % 2:
            self.buf.append(0)

    def add_blob(self, data: bytes) -> int:
        self._align()
        off = len(self.buf)
        self.buf += data
        return off

    def add_ifd(self, entries, link_from=None):
        """entries: list of (tag, type, count, value_bytes_or_int)."""
        self._align()
        off = len(self.buf)
        ifd = struct.pack("<H", len(entries))
        for tag, typ, cnt, val in sorted(entries):
            if isinstance(val, int):
                val = struct.pack("<I", val)
            if len(val) <= 4:
                val = val + b"\x00" * (4 - len(val))
                ifd += struct.pack("<HHI", tag, typ, cnt) + val
            else:
                voff = self.add_blob(val)
                # add_blob may grow buf; ifd written later at `off`
                ifd += struct.pack("<HHII", tag, typ, cnt, voff)
        ifd += struct.pack("<I", 0)  # next (patched via link())
        self._align()
        off = len(self.buf)
        self.buf += ifd
        self.ifd_offsets.append(off)
        next_field = off + 2 + 12 * len(entries)
        if link_from == "header":
            struct.pack_into("<I", self.buf, 4, off)
        elif isinstance(link_from, int):
            struct.pack_into("<I", self.buf, link_from, off)
        return off, next_field

    @staticmethod
    def shorts(*v):
        return struct.pack(f"<{len(v)}H", *v)

    @staticmethod
    def longs(*v):
        return struct.pack(f"<{len(v)}I", *v)

    @staticmethod
    def rational(num, den=1):
        return struct.pack("<II", num, den)


def _ascii(s):
    return s.encode() + b"\x00"


def write_nef(path, mosaic: np.ndarray, bits=14):
    """Nikon-style TIFF: IFD0 (Make/Model) + SubIFD raw, packed
    MSB-first `bits`-bit mosaic, CFA + black/white tags."""
    h, w = mosaic.shape
    t = TiffWriter()
    packed = _pack_msb(mosaic, bits)
    data_off = t.add_blob(packed)
    raw_off, _ = t.add_ifd([
        (0x0100, 4, 1, w), (0x0101, 4, 1, h),
        (0x0102, 3, 1, bits), (0x0103, 3, 1, 1),
        (0x0106, 3, 1, 32803),
        (0x0111, 4, 1, data_off), (0x0117, 4, 1, len(packed)),
        (0x0115, 3, 1, 1),
        (0x828D, 3, 2, TiffWriter.shorts(2, 2)),
        (0x828E, 1, 4, bytes([0, 1, 1, 2])),
        (0xC61A, 4, 1, 600), (0xC61D, 4, 1, (1 << bits) - 1),
    ])
    t.add_ifd([
        (0x010F, 2, 18, _ascii("NIKON CORPORATION")),
        (0x0110, 2, 11, _ascii("NIKON D850")),
        (0x014A, 4, 1, raw_off),
        (0x8827, 3, 1, 400),
    ], link_from="header")
    with open(path, "wb") as f:
        f.write(t.buf)


def write_arw(path, mosaic: np.ndarray, bits=12):
    h, w = mosaic.shape
    t = TiffWriter()
    packed = _pack_msb(mosaic, bits)
    data_off = t.add_blob(packed)
    raw_off, _ = t.add_ifd([
        (0x0100, 4, 1, w), (0x0101, 4, 1, h),
        (0x0102, 3, 1, bits), (0x0103, 3, 1, 1),
        (0x0106, 3, 1, 32803),
        (0x0111, 4, 1, data_off), (0x0117, 4, 1, len(packed)),
        (0x0115, 3, 1, 1),
        (0x828E, 1, 4, bytes([0, 1, 1, 2])),
        (0xC61A, 4, 1, 512), (0xC61D, 4, 1, (1 << bits) - 1),
    ])
    t.add_ifd([
        (0x010F, 2, 5, _ascii("SONY")),
        (0x0110, 2, 10, _ascii("ILCE-7M3")),
        (0x014A, 4, 1, raw_off),
        (0x8827, 3, 1, 800),
    ], link_from="header")
    with open(path, "wb") as f:
        f.write(t.buf)


def write_cr2(path, mosaic: np.ndarray, bits=14, n_slices=1):
    """Canon CR2: TIFF with "CR" magic, raw = last chained IFD,
    compression 6 (lossless JPEG) + slice tag 0xC640."""
    h, w = mosaic.shape
    wa = (w // (n_slices + 1)) & ~1
    wb = w - n_slices * wa
    # build the sliced flat sequence the decoder will un-slice
    cols = [mosaic[:, i * wa:(i + 1) * wa] for i in range(n_slices)]
    cols.append(mosaic[:, n_slices * wa:])
    flat = np.concatenate([np.ascontiguousarray(c).reshape(-1) for c in cols])
    comps = 2
    stream = lj92_encode(flat.reshape(h, w), comps, bits)

    t = TiffWriter(header_extra=b"")
    # CR2 magic: bytes 8..11 = "CR" 0x02 0x00
    t.buf[0:8] = b"II*\x00\x00\x00\x00\x00"
    t.buf += b"CR\x02\x00"
    data_off = t.add_blob(stream)
    ifd0_off, ifd0_next = t.add_ifd([
        (0x010F, 2, 6, _ascii("Canon")),
        (0x0110, 2, 14, _ascii("Canon EOS 40D")),
        (0x8827, 3, 1, 200),
    ], link_from="header")
    t.add_ifd([
        (0x0103, 3, 1, 6),
        (0x0111, 4, 1, data_off), (0x0117, 4, 1, len(stream)),
        (0xC640, 3, 3, TiffWriter.shorts(n_slices, wa, wb)),
    ], link_from=ifd0_next)
    with open(path, "wb") as f:
        f.write(t.buf)


def write_raf(path, mosaic: np.ndarray, xtrans, model="X-T3"):
    """Fujifilm RAF: magic + BE directory + meta records + 16-bit LE."""
    h, w = mosaic.shape
    head = bytearray(b"FUJIFILMCCD-RAW ")      # 16
    head += b"0201"                            # format version (4)
    head += b"FF000000"                        # camera id (8)
    head += model.encode().ljust(32, b"\x00")  # model (32) -> offset 0x3C
    head += b"\x00" * (0x54 - len(head))
    meta = bytearray()
    recs = [
        (0x0100, struct.pack(">HH", h, w)),
        (0x0115, struct.pack(">H", 16)),
        (0x0131, bytes(int(v) for v in np.asarray(xtrans).reshape(-1))),
    ]
    meta += struct.pack(">I", len(recs))
    for tag, payload in recs:
        meta += struct.pack(">HH", tag, len(payload)) + payload
    data = mosaic.astype("<u2").tobytes()
    meta_off = 0x70
    cfa_off = meta_off + len(meta)
    directory = struct.pack(
        ">IIIIII",
        0, 0,                       # jpeg off/len (none)
        meta_off, len(meta),
        cfa_off, len(data))
    head += directory
    head += b"\x00" * (meta_off - len(head))
    with open(path, "wb") as f:
        f.write(bytes(head) + bytes(meta) + data)


def _pack_msb(mosaic: np.ndarray, bits: int) -> bytes:
    """TIFF FillOrder-1 bit packing."""
    flat = mosaic.astype(np.uint64).reshape(-1)
    out = bytearray()
    acc = 0
    n = 0
    for v in flat:
        acc = (acc << bits) | int(v)
        n += bits
        while n >= 8:
            out.append((acc >> (n - 8)) & 0xFF)
            n -= 8
    if n:
        out.append((acc << (8 - n)) & 0xFF)
    return bytes(out)
