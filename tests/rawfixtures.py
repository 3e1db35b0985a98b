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

    def __init__(self, header_extra=b"", magic=0x2A):
        self.buf = bytearray(b"II" + struct.pack("<H", magic)
                             + b"\x00\x00\x00\x00" + header_extra)
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


# ------------------------------------------------- Nikon 34713 (NEF entropy)
# Format constants + reference semantics per dcraw nikon_load_raw /
# rawspeed NikonDecompressor (public knowledge).  The Python encoder and
# decoder here are the test oracle the C++ decoder must match bit-exact.

NIKON_TREES = (
    # (counts for code lengths 1..16, symbol values)
    ((0, 1, 5, 1, 1, 1, 1, 1, 1, 2, 0, 0, 0, 0, 0, 0),
     (5, 4, 3, 6, 2, 7, 1, 0, 8, 9, 11, 10, 12)),            # 12 lossy
    ((0, 1, 5, 1, 1, 1, 1, 1, 1, 2, 0, 0, 0, 0, 0, 0),
     (0x39, 0x5A, 0x38, 0x27, 0x16, 5, 4, 3, 2, 1, 0, 11, 12, 12)),
    ((0, 1, 4, 2, 3, 1, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0),
     (5, 4, 6, 3, 7, 2, 8, 1, 9, 0, 10, 11, 12)),            # 12 lossless
    ((0, 1, 4, 3, 1, 1, 1, 1, 1, 2, 0, 0, 0, 0, 0, 0),
     (5, 6, 4, 7, 8, 3, 9, 2, 1, 0, 10, 11, 12, 13, 14)),    # 14 lossy
    ((0, 1, 5, 1, 1, 1, 1, 1, 1, 1, 2, 0, 0, 0, 0, 0),
     (8, 0x5C, 0x4B, 0x3A, 0x29, 7, 6, 5, 4, 3, 2, 1, 0, 13, 14)),
    ((0, 1, 4, 2, 2, 3, 1, 2, 0, 0, 0, 0, 0, 0, 0, 0),
     (7, 6, 8, 5, 9, 4, 10, 3, 11, 12, 2, 0, 1, 13, 14)),    # 14 lossless
)


def _nikon_codes(tree_idx):
    """symbol value -> (code, length), canonical assignment.  The 32-byte
    table rows are zero-padded: counts may sum past the listed values and
    the missing trailing symbols are 0."""
    counts, values = NIKON_TREES[tree_idx]
    total = sum(counts)
    values = tuple(values) + (0,) * max(0, total - len(values))
    codes = {}
    code = 0
    vi = 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            codes.setdefault(values[vi], (code, ln))
            code += 1
            vi += 1
        code <<= 1
    return codes


class _MsbWriter:
    """MSB-first raw bitstream (no JPEG byte stuffing)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, val, nbits):
        if nbits <= 0:
            return
        self.acc = (self.acc << nbits) | (val & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            self.out.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8

    def flush(self):
        if self.n:
            self.out.append((self.acc << (8 - self.n)) & 0xFF)
            self.n = 0
        return bytes(self.out)


class _MsbReader:
    def __init__(self, data):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def get(self, nbits):
        if nbits <= 0:
            return 0
        while self.n < nbits:
            b = self.data[self.pos] if self.pos < len(self.data) else 0
            self.pos += 1
            self.acc = (self.acc << 8) | b
            self.n += 8
        v = (self.acc >> (self.n - nbits)) & ((1 << nbits) - 1)
        self.n -= nbits
        return v


def nikon_reference_decode(stream, W, H, bits, ver, vpred, curve_knots,
                           split=0):
    """Independent Python model of the 34713 decoder (the oracle)."""
    tree = (2 if ver[0] == 0x46 else 0) + (3 if bits == 14 else 0)
    vpred = [list(vpred[:2]), list(vpred[2:])]
    maxv = (1 << bits) & 0x7FFF
    curve = list(range(0x8000))
    if ver == (0x44, 0x20) and curve_knots is not None:
        csize = len(curve_knots)
        step = maxv // (csize - 1)
        for i, v in enumerate(curve_knots):
            curve[i * step] = v
        for i in range(maxv):
            r = i % step
            curve[i] = (curve[i - r] * (step - r)
                        + curve[i - r + step] * r) // step
    elif ver[0] != 0x46 and curve_knots is not None:
        for i, v in enumerate(curve_knots):
            curve[i] = v
        maxv = len(curve_knots)
    while maxv > 2 and curve[maxv - 2] == curve[maxv - 1]:
        maxv -= 1

    def decode_sym(br, codes):
        # walk codes bit by bit (codes are prefix-free)
        code = 0
        ln = 0
        inv = {v: k for k, v in codes.items()}
        while ln <= 16:
            code = (code << 1) | br.get(1)
            ln += 1
            if (code, ln) in inv:
                return inv[(code, ln)]
        return 0

    codes = _nikon_codes(tree)
    br = _MsbReader(stream)
    out = np.zeros((H, W), np.uint16)
    hpred = [0, 0]
    for row in range(H):
        if split and row == split:
            codes = _nikon_codes(tree + 1)
        for col in range(W):
            sym = decode_sym(br, codes)
            slen = sym & 15
            shl = sym >> 4
            diff = ((br.get(slen - shl) << 1) + 1) << shl >> 1
            if slen > 0 and not (diff & (1 << (slen - 1))):
                diff -= (1 << slen) - (0 if shl else 1)
            if col < 2:
                vpred[row & 1][col] = (vpred[row & 1][col] + diff) & 0xFFFF
                hpred[col] = vpred[row & 1][col]
            else:
                hpred[col & 1] = (hpred[col & 1] + diff) & 0xFFFF
            v = hpred[col & 1]
            v = v - 0x10000 if v >= 0x8000 else v
            out[row, col] = curve[min(max(v, 0), 0x3FFF)]
    return out


def nikon_encode_lossless(mosaic, bits, vpred):
    """Encode a mosaic exactly with the lossless tree (ver 0x46)."""
    H, W = mosaic.shape
    tree = 2 + (3 if bits == 14 else 0)
    codes = _nikon_codes(tree)
    bw = _MsbWriter()
    vp = [list(vpred[:2]), list(vpred[2:])]
    hp = [0, 0]
    for row in range(H):
        for col in range(W):
            target = int(mosaic[row, col])
            prev = vp[row & 1][col] if col < 2 else hp[col & 1]
            diff = ((target - prev + 0x8000) & 0xFFFF) - 0x8000
            ssss = 0 if diff == 0 else max(diff, -diff).bit_length()
            code, ln = codes[ssss]
            bw.put(code, ln)
            if ssss:
                v = diff if diff >= 0 else diff + (1 << ssss) - 1
                bw.put(v, ssss)
            if col < 2:
                vp[row & 1][col] = target & 0xFFFF
                hp[col] = vp[row & 1][col]
            else:
                hp[col & 1] = target & 0xFFFF
    return bw.flush()


def nikon_random_stream(rng, W, H, tree, split=0):
    """Random-but-valid symbol stream (exercises the lossy/split trees)."""
    bw = _MsbWriter()
    codes0 = _nikon_codes(tree)
    codes1 = _nikon_codes(tree + 1) if split else codes0
    for row in range(H):
        codes = codes1 if (split and row >= split) else codes0
        syms = list(codes.keys())
        for _ in range(W):
            sym = syms[int(rng.integers(len(syms)))]
            code, ln = codes[sym]
            bw.put(code, ln)
            nb = (sym & 15) - (sym >> 4)
            if nb > 0:
                bw.put(int(rng.integers(1 << nb)), nb)
    return bw.flush()


def _nikon_makernote(meta_blob):
    """MakerNote: "Nikon\\0" header + embedded LE TIFF whose offsets are
    relative to the TIFF header; tag 0x0096 = linearization table."""
    # header(8) + ifd: count(2) + 1 entry(12) + next(4) = 26
    value_off = 26
    tiff = struct.pack("<4sI", b"II*\x00", 8)
    tiff += struct.pack("<H", 1)
    tiff += struct.pack("<HHII", 0x0096, 7, len(meta_blob), value_off)
    tiff += struct.pack("<I", 0)
    tiff += meta_blob
    return b"Nikon\x00\x02\x10\x00\x00" + tiff


def write_nef_34713(path, mosaic=None, bits=14, lossy=False, split=0,
                    seed=0):
    """NEF with the vendor entropy payload (compression 34713).

    lossless (default): encodes `mosaic` bit-exact (ver 0x46 0x30).
    lossy: ver 0x44 0x20 with a 257-knot curve and a split row; payload
    is a seeded random symbol stream.  Returns the expected decode."""
    rng = np.random.default_rng(seed)
    vpred = (1 << (bits - 1),) * 4
    if lossy:
        tree = 3 if bits == 14 else 0
        stream = nikon_random_stream(rng, 64, 48, tree, split=split)
        H, W = 48, 64
        maxv = (1 << bits) & 0x7FFF
        csize = 257
        # monotone 16-bit curve over the input domain
        knots = tuple(int(v) for v in np.linspace(0, 65535, csize)
                      .astype(np.uint16))
        expected = nikon_reference_decode(stream, W, H, bits, (0x44, 0x20),
                                          vpred, knots, split=split)
        meta = bytearray()
        meta += bytes([0x44, 0x20])
        meta += struct.pack("<4H", *vpred)
        meta += struct.pack("<H", csize)
        meta += struct.pack(f"<{csize}H", *knots)
        if len(meta) < 562:
            meta += b"\x00" * (562 - len(meta))
        meta += struct.pack("<H", split)
    else:
        assert mosaic is not None
        H, W = mosaic.shape
        stream = nikon_encode_lossless(mosaic, bits, vpred)
        expected = nikon_reference_decode(stream, W, H, bits, (0x46, 0x30),
                                          vpred, None)
        meta = bytearray()
        meta += bytes([0x46, 0x30])
        meta += struct.pack("<4H", *vpred)
        meta += struct.pack("<H", 1)   # csize 1: identity curve
        meta += b"\x00" * 32

    t = TiffWriter()
    data_off = t.add_blob(stream)
    raw_off, _ = t.add_ifd([
        (0x0100, 4, 1, W), (0x0101, 4, 1, H),
        (0x0102, 3, 1, bits), (0x0103, 3, 1, 34713),
        (0x0106, 3, 1, 32803),
        (0x0111, 4, 1, data_off), (0x0117, 4, 1, len(stream)),
        (0x0115, 3, 1, 1),
        (0x828E, 1, 4, bytes([0, 1, 1, 2])),
        (0xC61A, 4, 1, 0),
    ])
    mn = _nikon_makernote(bytes(meta))
    exif_off, _ = t.add_ifd([
        (0x927C, 7, len(mn), mn),
    ])
    t.add_ifd([
        (0x010F, 2, 18, _ascii("NIKON CORPORATION")),
        (0x0110, 2, 10, _ascii("NIKON Z 8")),
        (0x014A, 4, 1, raw_off),
        (0x8769, 4, 1, exif_off),
        (0x8827, 3, 1, 640),
    ], link_from="header")
    with open(path, "wb") as f:
        f.write(t.buf)
    return expected


# --------------------------------------------------- Sony ARW2 (compression
# 32767) — per dcraw sony_arw2_load_raw / rawspeed SonyArw2Decompressor.

def sony_build_curve(knots4):
    """5-segment tone curve; knots are the raw tag-0x7010 u16 values."""
    kn = [0] + [((int(k) >> 2) & 0xFFF) for k in knots4] + [0xFFF]
    curve = list(range(0x1000))
    for i in range(5):
        for j in range(kn[i] + 1, min(kn[i + 1] + 1, 0x1000)):
            curve[j] = curve[j - 1] + (1 << i)
    return curve


def arw2_reference_decode(data, W, H, knots4):
    curve = sony_build_curve(knots4)
    out = np.zeros((H, W), np.uint16)
    for row in range(H):
        rowdat = data[row * W:(row + 1) * W]
        col = 0
        dpi = 0
        while col + 30 < W:
            dp = rowdat[dpi:dpi + 16]
            val = struct.unpack("<I", dp[:4])[0]
            vmax = val & 0x7FF
            vmin = (val >> 11) & 0x7FF
            imax = (val >> 22) & 0x0F
            imin = (val >> 26) & 0x0F
            sh = 0
            while sh < 4 and (0x80 << sh) <= vmax - vmin:
                sh += 1
            pix = [0] * 16
            bit = 30
            for i in range(16):
                if i == imax:
                    pix[i] = vmax
                elif i == imin:
                    pix[i] = vmin
                else:
                    # the last delta's high byte is never needed; guard
                    # instead of reading past the 16-byte block
                    hi = dp[(bit >> 3) + 1] << 8 if (bit >> 3) + 1 < 16 else 0
                    w16 = dp[bit >> 3] | hi
                    pix[i] = min((((w16 >> (bit & 7)) & 0x7F) << sh) + vmin,
                                 0x7FF)
                    bit += 7
            for i in range(16):
                out[row, col] = curve[pix[i] << 1] >> 2
                col += 2
            col -= 1 if (col & 1) else 31
            dpi += 16
    return out


def arw2_encode(values11, W, H):
    """Lossy-encode (H, W) 11-bit pre-curve values into ARW2 blocks.
    W must be a multiple of 32."""
    assert W % 32 == 0
    out = bytearray()
    v = np.asarray(values11, np.uint32)
    for row in range(H):
        for g in range(W // 32):
            for phase in (0, 1):
                block = v[row, g * 32 + phase:(g + 1) * 32:2]
                vmax = int(block.max())
                vmin = int(block.min())
                imax = int(block.argmax())
                imin = int(block.argmin())
                if imax == imin:  # constant block: separate indices
                    imax, imin = 0, 1
                sh = 0
                while sh < 4 and (0x80 << sh) <= vmax - vmin:
                    sh += 1
                hdr = (vmax | (vmin << 11) | (imax << 22) | (imin << 26)
                       ) & 0xFFFFFFFF
                bits = []
                for i in range(16):
                    if i in (imax, imin):
                        continue
                    d = (int(block[i]) - vmin) >> sh
                    bits.append(min(d, 0x7F))
                # pack 14 x 7 bits LSB-first starting at bit 30
                acc = hdr
                pos = 30
                for d in bits:
                    acc |= d << pos
                    pos += 7
                out += acc.to_bytes(16, "little")
    return bytes(out)


def _sony_pad(key):
    pad = [0] * 128
    for p in range(4):
        key = (key * 48828125 + 1) & 0xFFFFFFFF
        pad[p] = key
    pad[3] = (pad[3] << 1 | (pad[0] ^ pad[2]) >> 31) & 0xFFFFFFFF
    for p in range(4, 127):
        pad[p] = ((pad[p - 4] ^ pad[p - 2]) << 1
                  | (pad[p - 3] ^ pad[p - 1]) >> 31) & 0xFFFFFFFF
    return [int.from_bytes(p.to_bytes(4, "big"), "little") for p in pad[:127]] + [0]


def sony_encrypt(data: bytes, key: int) -> bytes:
    """XOR stream cipher (involution) used by the SR2 private IFD."""
    pad = _sony_pad(key)
    out = bytearray(data)
    p = 127
    for i in range(len(data) // 4):
        w = pad[p & 127] = pad[(p + 1) & 127] ^ pad[(p + 65) & 127]
        for b in range(4):
            out[4 * i + b] ^= (w >> (8 * b)) & 0xFF
        p += 1
    return bytes(out)


def write_arw2(path, values11, knots4=(2000, 6000, 10000, 14000),
               encrypted=False, key=0x12345678):
    """ARW with Sony ARW2 payload; tone curve via tag 0x7010 either in
    IFD0 (plain) or inside an SR2-encrypted hidden IFD (0xC634 ->
    0x7200/0x7201/0x7221).  Returns the expected decode."""
    H, W = values11.shape
    data = arw2_encode(values11, W, H)
    expected = arw2_reference_decode(data, W, H, knots4)

    t = TiffWriter()
    data_off = t.add_blob(data)
    raw_off, _ = t.add_ifd([
        (0x0100, 4, 1, W), (0x0101, 4, 1, H),
        (0x0102, 3, 1, 8), (0x0103, 3, 1, 32767),
        (0x0106, 3, 1, 32803),
        (0x0111, 4, 1, data_off), (0x0117, 4, 1, len(data)),
        (0x0115, 3, 1, 1),
        (0x828E, 1, 4, bytes([0, 1, 1, 2])),
        (0xC61A, 4, 1, 128),
    ])
    ifd0 = [
        (0x010F, 2, 5, _ascii("SONY")),
        (0x0110, 2, 10, _ascii("ILCE-7M4")),
        (0x014A, 4, 1, raw_off),
        (0x8827, 3, 1, 1600),
    ]
    if not encrypted:
        ifd0.append((0x7010, 3, 4, TiffWriter.shorts(*knots4)))
    else:
        # hidden IFD: 1 entry (0x7010) whose value offset is file-absolute
        t._align()
        hoff = len(t.buf)
        hidden = struct.pack("<H", 1)
        hidden += struct.pack("<HHII", 0x7010, 3, 4, hoff + 18)
        hidden += struct.pack("<I", 0)
        hidden += TiffWriter.shorts(*knots4)
        hidden += b"\x00" * ((-len(hidden)) % 4)
        t.buf += sony_encrypt(hidden, key)
        sr2_off, _ = t.add_ifd([
            (0x7200, 4, 1, hoff),
            (0x7201, 4, 1, len(hidden)),
            (0x7221, 4, 1, key),
        ])
        ifd0.append((0xC634, 4, 1, sr2_off))
    t.add_ifd(ifd0, link_from="header")
    with open(path, "wb") as f:
        f.write(t.buf)
    return expected


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


# ----------------------------------------- Fuji lossless-compressed RAF
# Encoder mirror of native/rawdec fuji_compressed_decode (scheme per the
# published Danilchenko fuji_compressed reverse-engineering: vertical
# strips, per-color sample lines, even/odd interleaved passes, 41
# sign-folded gradient contexts with (sum,count)-adaptive Rice codes,
# q_points 0x12/0x43/0x114, counter halving at 64, unary escape at 16).
# Real camera files cannot be validated in this environment; the C++
# decoder is gated bit-exact against THIS encoder on random mosaics.

def _fuji_qlevel(d):
    a = abs(d)
    q = 0 if a == 0 else 1 if a < 0x12 else 2 if a < 0x43 else \
        3 if a < 0x114 else 4
    return -q if d < 0 else q


class _FujiCtx:
    __slots__ = ("sum", "cnt")

    def __init__(self):
        self.sum, self.cnt = 256, 1

    def k(self):
        k = 0
        while k < 12 and (self.cnt << k) < self.sum:
            k += 1
        return k

    def update(self, m):
        self.sum += m
        self.cnt += 1
        if self.cnt >= 64:
            self.sum >>= 1
            self.cnt >>= 1


def _fuji_put_err(bw, ctx, err, bits):
    m = 2 * err if err >= 0 else -2 * err - 1
    k = ctx.k()
    q = m >> k
    if q >= 16:
        bw.put(0, 16)                   # escape marker: 16 zero bits
        bw.put(m, bits + 1)
    else:
        bw.put(0, q)                    # q zeros...
        bw.put(1, 1)                    # ...then a 1
        bw.put(m & ((1 << k) - 1), k)
    ctx.update(m)


def _fuji_encode_strip(mosaic, info_cfa, is_xtrans, bits, x0, x1):
    H = mosaic.shape[0]
    period = 6 if is_xtrans else 2
    maxv = (1 << bits) - 1

    class BW:  # MSB-first writer
        def __init__(self):
            self.out = bytearray()
            self.acc = 0
            self.n = 0

        def put(self, val, nbits):
            if nbits <= 0:
                return
            self.acc = (self.acc << nbits) | (val & ((1 << nbits) - 1))
            self.n += nbits
            while self.n >= 8:
                self.out.append((self.acc >> (self.n - 8)) & 0xFF)
                self.n -= 8

        def flush(self):
            if self.n:
                self.out.append((self.acc << (8 - self.n)) & 0xFF)
                self.n = 0
            return bytes(self.out)

    bw = BW()
    grads = {}
    prev = {}
    for r in range(H):
        phase = r % period
        for c in range(3):
            if is_xtrans:
                xs = [x for x in range(x0, x1)
                      if info_cfa[(r % 6) * 6 + (x % 6)] == c]
            else:
                xs = [x for x in range(x0, x1)
                      if info_cfa[(r % 2) * 2 + (x % 2)] == c]
            if not xs:
                continue
            n = len(xs)
            line = [int(mosaic[r, x]) for x in xs]
            pl = prev.get((c, phase))
            first = pl is None or len(pl) != n
            key = (c, phase)
            if key not in grads:
                grads[key] = ([_FujiCtx() for _ in range(41)],
                              [_FujiCtx() for _ in range(41)])
            ge, go = grads[key]
            dec = [0] * n
            for i in range(0, n, 2):     # even pass
                if first:
                    b = dec[i - 2] if i else (1 << (bits - 1))
                    cL = dR = b
                else:
                    b = pl[i]
                    cL = pl[i - 1] if i else pl[0]
                    dR = pl[i + 1] if i + 1 < n else pl[n - 1]
                gidx = 9 * _fuji_qlevel(dR - b) + _fuji_qlevel(b - cL)
                sign = -1 if gidx < 0 else 1
                gidx = abs(gidx)
                interp = b if first else (2 * b + cL + dR) >> 2
                err = sign * (line[i] - interp)
                _fuji_put_err(bw, ge[gidx], err, bits)
                dec[i] = max(0, min(interp + sign * err, maxv))
            for i in range(1, n, 2):     # odd pass
                a = dec[i - 1]
                gR = dec[i + 1] if i + 1 < n else a
                b = a if first else pl[i]
                gidx = 9 * _fuji_qlevel(b - a) + _fuji_qlevel(gR - b)
                sign = -1 if gidx < 0 else 1
                gidx = abs(gidx)
                lo, hi = min(a, gR), max(a, gR)
                interp = ((a + gR + 2 * b) >> 2) if (b < lo or b > hi) \
                    else (a + gR) >> 1
                err = sign * (line[i] - interp)
                _fuji_put_err(bw, go[gidx], err, bits)
                dec[i] = max(0, min(interp + sign * err, maxv))
            assert dec == line, "lossless invariant"
            prev[key] = line
    return bw.flush()


def fuji_compressed_payload(mosaic: np.ndarray, xtrans=None, bits=14,
                            block_size=768) -> bytes:
    """-> the compressed CFA payload (header + size table + strips)."""
    h, w = mosaic.shape
    is_xtrans = xtrans is not None
    cfa = ([int(v) for v in np.asarray(xtrans).reshape(-1)]
           if is_xtrans else [0, 1, 1, 2])
    nblocks = -(-w // block_size)
    strips = []
    for s in range(nblocks):
        x0 = s * block_size
        x1 = min(x0 + block_size, w)
        strips.append(_fuji_encode_strip(mosaic, cfa, is_xtrans, bits,
                                         x0, x1))
    head = struct.pack(">HBBBBHHHI", 0x4953, 1, 16 if is_xtrans else 0,
                       bits, nblocks, block_size, h, w, 0)
    table = b"".join(struct.pack(">I", len(s)) for s in strips)
    return head + table + b"".join(strips)


def write_raf_compressed(path, mosaic: np.ndarray, xtrans=None, bits=14,
                         block_size=768, model="X-T5"):
    """Fujifilm RAF with a lossless-compressed CFA payload."""
    h, w = mosaic.shape
    head = bytearray(b"FUJIFILMCCD-RAW ")
    head += b"0201"
    head += b"FF000000"
    head += model.encode().ljust(32, b"\x00")
    head += b"\x00" * (0x54 - len(head))
    recs = [(0x0100, struct.pack(">HH", h, w)),
            (0x0115, struct.pack(">H", bits))]
    if xtrans is not None:
        recs.append((0x0131, bytes(int(v) for v in
                                   np.asarray(xtrans).reshape(-1))))
    meta = bytearray()
    meta += struct.pack(">I", len(recs))
    for tag, payload in recs:
        meta += struct.pack(">HH", tag, len(payload)) + payload
    data = fuji_compressed_payload(mosaic, xtrans, bits, block_size)
    meta_off = 0x70
    cfa_off = meta_off + len(meta)
    directory = struct.pack(">IIIIII", 0, 0, meta_off, len(meta),
                            cfa_off, len(data))
    head += directory
    head += b"\x00" * (meta_off - len(head))
    with open(path, "wb") as f:
        f.write(bytes(head) + bytes(meta) + data)


# ------------------------------------------------------- Canon CR3 (CRX)
# Container per the public "Inside Canon RAW v3" structure documentation
# (ISO-BMFF: ftyp 'crx ', moov/uuid(Canon) with CMT1/CMT2 TIFF blobs,
# trak/stbl sample tables, CRAW + CMP1 stsd entry, mdat payload).  The
# codec mirror matches native/rawdec crx_decode: four half-res CFA
# subplanes, median-edge-detector prediction, 2e/-2e-1 mapping,
# per-sample K+-1 Rice adaptation from K=4, 41-quotient escape.

_CANON_UUID = bytes.fromhex("85c0b687820f11e08111f4ce462b6a48")


def _crx_adapt_k(k, m):
    if (m >> k) >= 2 and k < 15:
        return k + 1
    if k > 0 and (m << 1) < (1 << k):
        return k - 1
    return k


def _crx_med(a, b, c):
    mx, mn = max(a, b), min(a, b)
    if c >= mx:
        return mn
    if c <= mn:
        return mx
    return a + b - c


def crx_encode_plane(plane: np.ndarray, bits: int) -> bytes:
    ph, pw = plane.shape
    out = bytearray()
    acc = 0
    nb = 0

    def put(val, nbits):
        nonlocal acc, nb
        if nbits <= 0:
            return
        acc = (acc << nbits) | (val & ((1 << nbits) - 1))
        nb += nbits
        while nb >= 8:
            out.append((acc >> (nb - 8)) & 0xFF)
            nb -= 8

    k = 4
    pl = plane.astype(np.int64)
    for y in range(ph):
        for x in range(pw):
            a = int(pl[y, x - 1]) if x else (int(pl[y - 1, 0]) if y else 0)
            b = int(pl[y - 1, x]) if y else a
            c = int(pl[y - 1, x - 1]) if (x and y) else b
            pred = _crx_med(a, b, c) if (x or y) else 1 << (bits - 1)
            e = int(pl[y, x]) - pred
            m = 2 * e if e >= 0 else -2 * e - 1
            q = m >> k
            if q >= 41:
                put(0, 41)
                put(m, bits + 1)
            else:
                put(0, q)
                put(1, 1)
                put(m & ((1 << k) - 1), k)
            k = _crx_adapt_k(k, m)
    if nb:
        out.append((acc << (8 - nb)) & 0xFF)
    return bytes(out)


def crx_payload(mosaic: np.ndarray, bits: int) -> bytes:
    h, w = mosaic.shape
    assert h % 2 == 0 and w % 2 == 0
    planes = [mosaic[0::2, 0::2], mosaic[0::2, 1::2],
              mosaic[1::2, 0::2], mosaic[1::2, 1::2]]
    out = bytearray()
    for i, p in enumerate(planes):
        s = crx_encode_plane(p, bits)
        out += struct.pack(">III", 0xFF020008, i, len(s)) + s
    return bytes(out)


def _box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def _tiff_blob(entries) -> bytes:
    t = TiffWriter()
    t.add_ifd(entries, link_from="header")
    return bytes(t.buf)


def write_cr3(path, mosaic: np.ndarray, bits=14, model="Canon EOS R5",
              iso=800):
    """Canon CR3: ISO-BMFF container with a CRX-coded raw track."""
    h, w = mosaic.shape
    payload = crx_payload(mosaic, bits)

    cmt1 = _tiff_blob([
        (0x010F, 2, 6, b"Canon\x00"),
        (0x0110, 2, len(model) + 1, model.encode() + b"\x00"),
    ])
    cmt2 = _tiff_blob([(0x8827, 3, 1, TiffWriter.shorts(iso))])

    # stsd: ver/flags + count + CRAW sample entry (+ CMP1 codec box)
    cmp1 = _box(b"CMP1", struct.pack(">HH", 1, bits))
    craw_body = (b"\x00" * 6 + struct.pack(">H", 1)   # reserved + dataref
                 + b"\x00" * 16                        # predefined
                 + struct.pack(">HH", w, h) + cmp1)
    stsd = _box(b"stsd", struct.pack(">II", 0, 1) + _box(b"CRAW", craw_body))
    stsz = _box(b"stsz", struct.pack(">III", 0, len(payload), 1))

    def assemble(mdat_off):
        co64 = _box(b"co64", struct.pack(">II", 0, 1)
                    + struct.pack(">Q", mdat_off + 8))
        stbl = _box(b"stbl", stsd + stsz + co64)
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", minf)
        trak = _box(b"trak", mdia)
        uuid_box = _box(b"uuid", _CANON_UUID + _box(b"CMT1", cmt1)
                        + _box(b"CMT2", cmt2))
        moov = _box(b"moov", uuid_box + trak)
        ftyp = _box(b"ftyp", b"crx " + struct.pack(">I", 1) + b"crx isom")
        return ftyp + moov

    head = assemble(0)
    mdat_off = len(head)
    head = assemble(mdat_off)
    assert len(head) == mdat_off
    mdat = _box(b"mdat", payload)
    with open(path, "wb") as f:
        f.write(head + mdat)


# ----------------------------------------------------- Panasonic RW2 (v4)

class _PanaWriter:
    """Mirror of the v4 bitstream sectioning: 0x4000-byte sections with
    contiguous LSB-first fields that never straddle sections, file
    layout = buf[0x2008:] + buf[:0x2008] (the decoder's split load
    inverted)."""

    LOAD_FLAGS = 0x2008

    def __init__(self):
        self.blocks = []
        self.buf = bytearray(0x4001)
        self.pos = 0                  # bits consumed in this section

    def put(self, val, nbits):
        assert 0 <= val < (1 << nbits)
        if self.pos + nbits > 0x20000:   # pad; field starts next section
            self._flush_block()
        byte = self.pos >> 3
        shift = self.pos & 7
        window = self.buf[byte] | (self.buf[byte + 1] << 8)
        window |= val << shift
        self.buf[byte] = window & 0xFF
        self.buf[byte + 1] = (window >> 8) & 0xFF
        self.pos += nbits

    def _flush_block(self):
        self.blocks.append(bytes(self.buf[self.LOAD_FLAGS:0x4000])
                           + bytes(self.buf[:self.LOAD_FLAGS]))
        self.buf = bytearray(0x4001)
        self.pos = 0

    def tobytes(self):
        self._flush_block()
        return b"".join(self.blocks)


def pana_v4_payload(mosaic: np.ndarray) -> bytes:
    """Encode a mosaic into the v4 bitstream.  Requires values in
    [16, 4095] with same-parity horizontal steps <= 127 (the fixture
    scenes satisfy this; sh stays 0)."""
    h, w = mosaic.shape
    m = mosaic.astype(np.int64)
    assert m.min() >= 16 and m.max() <= 4095
    bw = _PanaWriter()
    for row in range(h):
        pred = [0, 0]
        nonz = [0, 0]
        for col in range(w):
            i = col % 14
            if i == 0:
                pred = [0, 0]
                nonz = [0, 0]
            if i % 3 == 2:
                bw.put(0, 2)          # sh = 4 >> 3 = 0
            v = int(m[row, col])
            j = i & 1
            if nonz[j] == 0:
                nonz[j] = v >> 4      # >= 1 because v >= 16
                bw.put(nonz[j], 8)
                bw.put(v & 15, 4)
                pred[j] = v
            else:
                if v == pred[j]:
                    bw.put(0, 8)
                else:
                    assert pred[j] >= 0x80, (row, col, pred[j])
                    d = v - pred[j] + 0x80
                    assert 1 <= d <= 255, (row, col, v, pred[j])
                    bw.put(d, 8)
                    pred[j] = v
    return bw.tobytes()


def write_rw2(path, mosaic: np.ndarray, cfa_id=1, iso=640):
    """Panasonic RW2: TIFF magic 85, Panasonic IFD0 tags, raw payload
    (tag 0x0118) in the v4 12-bit bitstream."""
    h, w = mosaic.shape
    payload = pana_v4_payload(mosaic)
    t = TiffWriter(magic=85)
    data_off = t.add_blob(payload)
    t.add_ifd([
        (0x0002, 3, 1, w), (0x0003, 3, 1, h),
        (0x0009, 3, 1, cfa_id), (0x000A, 3, 1, 12),
        (0x002D, 3, 1, 4),
        (0x001C, 3, 1, 65), (0x001D, 3, 1, 65), (0x001E, 3, 1, 65),
        (0x0024, 3, 1, 440), (0x0025, 3, 1, 256), (0x0026, 3, 1, 380),
        (0x0017, 3, 1, iso),
        (0x010F, 2, 10, _ascii("Panasonic")),
        (0x0110, 2, 6, _ascii("DC-S5")),
        (0x0118, 4, 1, data_off),
    ], link_from="header")
    with open(path, "wb") as f:
        f.write(t.buf)


# ------------------------------------------------------- Olympus ORF

def _pack_lsb12(mosaic: np.ndarray) -> bytes:
    """LSB-first little-endian 12-bit packing."""
    out = bytearray()
    acc = 0
    nb = 0
    for v in mosaic.astype(np.uint16).reshape(-1):
        acc |= int(v) << nb
        nb += 12
        while nb >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nb -= 8
    if nb:
        out.append(acc & 0xFF)
    return bytes(out)


def olympus_payload(mosaic: np.ndarray) -> bytes:
    """Encode the Olympus predictive codec: per pixel a 3-bit
    sign/low field, a leading-zeros high code (12 zeros = escape to a
    (16-nbits)-bit field), and nbits explicit low bits of the carry,
    with two interleaved carry chains and the W/N/NW gradient
    predictor."""
    h, w = mosaic.shape
    m = mosaic.astype(np.int64)
    assert m.min() >= 0 and m.max() <= 4095
    bw = _MsbWriter()
    out = np.zeros((h, w), np.int64)
    for row in range(h):
        acarry = [[0, 0, 0], [0, 0, 0]]
        for col in range(w):
            carry = acarry[col & 1]
            i = 2 * (carry[2] < 3)
            nbits = 2 + i
            while (carry[0] & 0xFFFF) >> (nbits + i):
                nbits += 1
            if row < 2 and col < 2:
                pred = 0
            elif row < 2:
                pred = int(out[row, col - 2])
            elif col < 2:
                pred = int(out[row - 2, col])
            else:
                w_ = int(out[row, col - 2])
                n_ = int(out[row - 2, col])
                nw = int(out[row - 2, col - 2])
                if (w_ < nw < n_) or (n_ < nw < w_):
                    if abs(w_ - nw) > 32 or abs(n_ - nw) > 32:
                        pred = w_ + n_ - nw
                    else:
                        pred = (w_ + n_) >> 1
                else:
                    pred = w_ if abs(w_ - nw) > abs(n_ - nw) else n_
            v = int(m[row, col])
            d = v - pred
            low = d & 3
            dd = d >> 2
            t = dd - carry[1]
            if t >= 0:
                sign_bit, c0 = 0, t
            else:
                sign_bit, c0 = 1, -t - 1
            bw.put((sign_bit << 2) | low, 3)
            high = c0 >> nbits
            if high < 12:
                bw.put(1, high + 1)   # `high` zeros then a 1
            else:
                bw.put(0, 12)         # escape
                assert high < (1 << (15 - nbits))
                bw.put(high << 1, 16 - nbits)
            bw.put(c0 & ((1 << nbits) - 1), nbits)
            sign_ext = -1 if sign_bit else 0
            diff = (c0 ^ sign_ext) + carry[1]
            assert diff == dd
            carry[0] = c0
            carry[1] = (diff * 3 + carry[1]) >> 5
            carry[2] = 0 if c0 > 16 else carry[2] + 1
            out[row, col] = v
    return b"\x00" * 7 + bw.flush()


def write_orf(path, mosaic: np.ndarray, compressed=False, iso=400):
    """Olympus ORF: TIFF walk with the 'RO' magic; raw strip either
    12-bit LSB-first packed or the Olympus predictive codec (selected
    by the rawspeed strip-size rule)."""
    h, w = mosaic.shape
    if compressed:
        payload = olympus_payload(mosaic)
        assert len(payload) < (w * h * 12) // 8, \
            "compressed payload too large for the size-rule dispatch"
    else:
        payload = _pack_lsb12(mosaic)
    t = TiffWriter(magic=0x4F52)
    data_off = t.add_blob(payload)
    t.add_ifd([
        (0x0100, 4, 1, w), (0x0101, 4, 1, h),
        (0x0102, 3, 1, 12), (0x0103, 3, 1, 1),
        (0x0106, 3, 1, 32803), (0x0115, 3, 1, 1),
        (0x0111, 4, 1, data_off), (0x0117, 4, 1, len(payload)),
        (0x828E, 1, 4, bytes([0, 1, 1, 2])),
        (0xC61A, 4, 1, 255), (0xC61D, 4, 1, 4095),
        (0x010F, 2, 22, _ascii("OLYMPUS IMAGING CORP.")),
        (0x0110, 2, 8, _ascii("E-M1III")),
        (0x8827, 3, 1, iso),
    ], link_from="header")
    with open(path, "wb") as f:
        f.write(t.buf)


# ------------------------------------------------------- Pentax PEF

def pef_payload(mosaic: np.ndarray, dep=13):
    """ssss-coded diff stream with the PEF predictor scheme (two-row
    vertical predictors on cols 0/1, horizontal after)."""
    h, w = mosaic.shape
    m = mosaic.astype(np.int64)
    bw = _MsbWriter()
    vpred = [[0, 0], [0, 0]]
    for row in range(h):
        hpred = [0, 0]
        for col in range(w):
            if col < 2:
                prev = vpred[row & 1][col]
            else:
                prev = hpred[col & 1]
            diff = int(m[row, col]) - prev
            c = 0 if diff == 0 else max(diff, -diff).bit_length()
            assert c < dep
            bw.put(c, 4)                  # canonical len-4 code = symbol
            if c:
                v = diff if diff >= 0 else diff + (1 << c) - 1
                bw.put(v, c)
            if col < 2:
                vpred[row & 1][col] = int(m[row, col])
            hpred[col & 1] = int(m[row, col])
    return bw.flush()


def write_pef(path, mosaic: np.ndarray, bits=12, iso=200):
    """Pentax PEF: TIFF with Compression 65535 and the huffman spec in
    the PENTAX MakerNote ("AOC\\0" header, file-absolute entry offsets)
    tag 0x0220 — u16 dep-12, 12 pad bytes, dep u16 left-aligned code
    starts, dep u8 lengths.  All 13 ssss symbols at length 4."""
    h, w = mosaic.shape
    assert int(mosaic.max()) < (1 << bits)
    dep = bits + 1          # ssss symbols 0..bits
    payload = pef_payload(mosaic, dep=dep)
    spec = struct.pack("<H", (dep - 12) & 0xFFFF) + b"\x00" * 12
    spec += b"".join(struct.pack("<H", c << 8) for c in range(dep))
    spec += bytes([4] * dep)

    t = TiffWriter()
    data_off = t.add_blob(payload)
    spec_off = t.add_blob(spec)
    # makernote: "AOC\0" + "II" + IFD whose offsets are file-absolute;
    # built after spec so the 0x0220 entry can point at it
    mn = bytearray(b"AOC\x00II")
    mn += struct.pack("<H", 1)  # one entry
    mn += struct.pack("<HHII", 0x0220, 7, len(spec), spec_off)
    mn += struct.pack("<I", 0)
    mn_off = t.add_blob(bytes(mn))

    raw_off, _ = t.add_ifd([
        (0x0100, 4, 1, w), (0x0101, 4, 1, h),
        (0x0102, 3, 1, bits), (0x0103, 3, 1, 65535),
        (0x0106, 3, 1, 32803), (0x0115, 3, 1, 1),
        (0x0111, 4, 1, data_off), (0x0117, 4, 1, len(payload)),
        (0x828E, 1, 4, bytes([0, 1, 1, 2])),
        (0xC61A, 4, 1, 128), (0xC61D, 4, 1, (1 << bits) - 1),
    ])
    exif_entries = [(0x927C, 7, len(mn), mn_off),
                    (0x8827, 3, 1, iso)]
    exif_off, _ = t.add_ifd(exif_entries)
    t.add_ifd([
        (0x010F, 2, 19, _ascii("PENTAX Corporation")),
        (0x0110, 2, 11, _ascii("PENTAX K-5")),
        (0x014A, 4, 1, raw_off),
        (0x8769, 4, 1, exif_off),
    ], link_from="header")
    with open(path, "wb") as f:
        f.write(t.buf)
