"""Native DNG decoder: synthesized DNGs (uncompressed 16-bit, packed
12-bit, lossless-JPEG) round-trip through native/rawdec."""

import struct

import numpy as np
import pytest


# --- minimal DNG writer (test-side ground truth) -----------------------------

def _entry(tag, typ, count, value_or_bytes, heap, base):
    sizes = {1: 1, 3: 2, 4: 4, 5: 8, 10: 8}
    if isinstance(value_or_bytes, bytes):
        data = value_or_bytes
    else:
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        vals = value_or_bytes if isinstance(value_or_bytes, (list, tuple)) \
            else [value_or_bytes]
        data = b"".join(struct.pack("<" + fmt, v) for v in vals)
    if len(data) <= 4:
        return struct.pack("<HHI", tag, typ, count) + data.ljust(4, b"\0"), b""
    off = base + len(heap)
    return struct.pack("<HHII", tag, typ, count, off), data


def _rational(vals, signed=False):
    out = b""
    for v in vals:
        num = int(round(v * 10000))
        out += struct.pack("<ii" if signed else "<II", num, 10000)
    return out


def write_dng(path, mosaic: np.ndarray, bits=16, compression=1,
              payload=None, black=256.0, white=65535.0, extra_tags=()):
    H, W = mosaic.shape
    if payload is None:
        if bits == 16:
            payload = mosaic.astype("<u2").tobytes()
        else:  # MSB-first packed
            bitbuf, nbits, out = 0, 0, bytearray()
            for v in mosaic.reshape(-1):
                bitbuf = (bitbuf << bits) | int(v)
                nbits += bits
                while nbits >= 8:
                    out.append((bitbuf >> (nbits - 8)) & 0xFF)
                    nbits -= 8
            if nbits:
                out.append((bitbuf << (8 - nbits)) & 0xFF)
            payload = bytes(out)

    entries = []
    heap = b""
    # header 8 + ifd (N entries): compute layout in two passes
    tags = [
        (0x0100, 4, 1, W), (0x0101, 4, 1, H), (0x0102, 3, 1, bits),
        (0x0103, 3, 1, compression), (0x0106, 3, 1, 32803),
        (0x0115, 3, 1, 1), (0x0116, 4, 1, H),
        (0x828E, 1, 4, bytes([0, 1, 1, 2])),          # CFAPattern RGGB
        (0xC61A, 5, 1, _rational([black])),            # BlackLevel
        (0xC61D, 4, 1, int(white)),                    # WhiteLevel
        (0xC622, 10, 9, _rational([0.7, 0.2, 0.1,      # ColorMatrix1
                                   0.25, 0.9, -0.15,
                                   0.05, -0.2, 1.1], signed=True)),
        (0xC628, 5, 3, _rational([0.45, 1.0, 0.62])),  # AsShotNeutral
    ] + list(extra_tags)
    n = len(tags) + 2  # + strip offset/count
    ifd_size = 2 + n * 12 + 4
    heap_base = 8 + ifd_size
    raw_entries = []
    for tag, typ, count, val in tags:
        e, d = _entry(tag, typ, count, val, heap, heap_base)
        raw_entries.append((tag, e))
        heap += d
    data_off = heap_base + len(heap)
    e, _ = _entry(0x0111, 4, 1, data_off, heap, heap_base)
    raw_entries.append((0x0111, e))
    e, _ = _entry(0x0117, 4, 1, len(payload), heap, heap_base)
    raw_entries.append((0x0117, e))
    raw_entries.sort(key=lambda t: t[0])
    ifd = struct.pack("<H", n) + b"".join(e for _, e in raw_entries) \
        + struct.pack("<I", 0)
    with open(path, "wb") as f:
        f.write(b"II" + struct.pack("<HI", 42, 8))
        f.write(ifd)
        f.write(heap)
        f.write(payload)


# --- minimal LJ92 encoder (predictor 1, one component) -----------------------

_LENGTHS = [2, 2, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16]


def _huff_table():
    counts = [0] * 17
    for ln in _LENGTHS:
        counts[ln] += 1
    codes, code = {}, 0
    k = 0
    for ln in range(1, 17):
        for _ in range(counts[ln]):
            codes[k] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return counts, codes


def lj92_encode(img: np.ndarray, precision=16) -> bytes:
    H, W = img.shape
    counts, codes = _huff_table()

    bits = []

    def put(code, ln):
        for i in range(ln - 1, -1, -1):
            bits.append((code >> i) & 1)

    default = 1 << (precision - 1)
    prev_row = None
    for y in range(H):
        for x in range(W):
            if y == 0 and x == 0:
                pred = default
            elif x == 0:
                pred = int(prev_row[0])
            else:
                pred = int(img[y, x - 1])
            diff = (int(img[y, x]) - pred)
            # wrap to 16-bit two's complement semantics
            diff = ((diff + 32768) & 0xFFFF) - 32768
            mag = abs(diff)
            ssss = mag.bit_length()
            c, ln = codes[ssss]
            put(c, ln)
            if ssss and ssss < 16:
                v = diff if diff >= 0 else diff + (1 << ssss) - 1
                put(v & ((1 << ssss) - 1), ssss)
        prev_row = img[y]

    # pack bits, stuff 0x00 after 0xFF
    by = bytearray()
    acc, n = 0, 0
    for b in bits:
        acc = (acc << 1) | b
        n += 1
        if n == 8:
            by.append(acc)
            if acc == 0xFF:
                by.append(0x00)
            acc, n = 0, 0
    if n:
        acc = (acc << (8 - n)) | ((1 << (8 - n)) - 1)
        by.append(acc)
        if acc == 0xFF:
            by.append(0x00)

    dht = bytes(counts[1:]) + bytes(range(17))
    out = b"\xff\xd8"                                    # SOI
    out += b"\xff\xc4" + struct.pack(">H", 2 + 1 + len(dht)) + b"\x00" + dht
    out += b"\xff\xc3" + struct.pack(">HBHHB", 11, precision, H, W, 1) \
        + bytes([0, 0x11, 0])                            # SOF3, 1 comp
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) \
        + bytes([0, 0x00, 1, 0, 0])                      # SOS pred=1 pt=0
    out += bytes(by)
    out += b"\xff\xd9"
    return out


def _mosaic(h=32, w=48, seed=0, maxv=65535):
    rng = np.random.default_rng(seed)
    return rng.integers(0, maxv, (h, w)).astype(np.uint16)


def test_uncompressed_16bit(tmp_path):
    from ansel_tpu.io.dng import load_dng

    m = _mosaic()
    p = str(tmp_path / "u16.dng")
    write_dng(p, m, bits=16)
    raw, meta = load_dng(p)
    assert raw.shape == m.shape
    assert np.array_equal(raw, m.astype(np.float32))
    assert meta.black_levels[0] == pytest.approx(256.0)
    assert meta.wb_coeffs[0] == pytest.approx(1.0 / 0.45, rel=1e-3)
    assert meta.cam_to_xyz is not None


def test_packed_12bit(tmp_path):
    from ansel_tpu.io.dng import load_dng

    m = _mosaic(maxv=4095)
    p = str(tmp_path / "p12.dng")
    write_dng(p, m, bits=12, white=4095.0)
    raw, meta = load_dng(p)
    assert np.array_equal(raw, m.astype(np.float32))
    assert meta.white_point == pytest.approx(4095.0)


def test_lossless_jpeg(tmp_path):
    from ansel_tpu.io.dng import load_dng

    m = _mosaic(h=24, w=36)
    payload = lj92_encode(m)
    p = str(tmp_path / "lj.dng")
    write_dng(p, m, bits=16, compression=7, payload=payload)
    raw, meta = load_dng(p)
    assert np.array_equal(raw, m.astype(np.float32)), \
        np.abs(raw - m).max()


def test_garbage_rejected(tmp_path):
    from ansel_tpu.io.dng import load_dng

    p = str(tmp_path / "junk.dng")
    with open(p, "wb") as f:
        f.write(b"not a tiff at all" * 10)
    with pytest.raises(ValueError):
        load_dng(p)


def test_dng_through_pipeline(tmp_path):
    """decoded DNG drives the actual pipe end-to-end."""
    from ansel_tpu.io.dng import load_dng
    from ansel_tpu.pipeline.engine import HistoryItem, compile_pipeline

    rng = np.random.default_rng(3)
    m = (rng.uniform(300, 60000, (64, 96))).astype(np.uint16)
    p = str(tmp_path / "pipe.dng")
    write_dng(p, m)
    raw, meta = load_dng(p)
    pipe = compile_pipeline(meta, [HistoryItem("exposure")])
    out = np.asarray(pipe.output_array(raw))
    assert out.shape[0] == 3 and np.isfinite(out).all()


# --- DNG GainMap (OpcodeList2) ----------------------------------------------

def _gainmap_param(top, left, h, w, mv, mh, gains):
    p = struct.pack(">10I", top, left, h, w, 0, 1, 2, 2, mv, mh)
    p += struct.pack(">4d", 1.0 / (mv - 1), 1.0 / (mh - 1), 0.0, 0.0)
    p += struct.pack(">I", 1)
    p += struct.pack(f">{len(gains)}f", *gains)
    return p


def opcode_list2_blob(h, w, mv, mh, gains4):
    """OpcodeList2 payload: 4 GainMaps, one per RGGB filter
    (big-endian wire format, dng_opcode.c:57-130)."""
    blob = struct.pack(">I", 4)
    for k, (dy, dx) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
        param = _gainmap_param(dy, dx, h, w, mv, mh, gains4[k])
        blob += struct.pack(">IIII", 9, 0x01030000, 1, len(param)) + param
    return blob


def test_gainmap_parse(tmp_path):
    from ansel_tpu.io.dng import load_dng

    m = _mosaic(h=32, w=48)
    mv, mh = 3, 5
    rng = np.random.default_rng(7)
    gains4 = [rng.uniform(1.0, 2.5, mv * mh).astype(np.float32)
              for _ in range(4)]
    blob = opcode_list2_blob(32, 48, mv, mh, gains4)
    p = str(tmp_path / "gm.dng")
    write_dng(p, m, extra_tags=[(51009, 7, len(blob), blob)])
    _, meta = load_dng(p)
    assert len(meta.gain_maps) == 4
    g = meta.gain_maps[2]
    assert (g.top, g.left) == (1, 0)
    assert g.map_points_v == mv and g.map_points_h == mh
    assert g.map_spacing_h == pytest.approx(0.25)
    assert np.allclose(g.map_gain, gains4[2])


def test_gainmap_applied_in_rawprepare(tmp_path):
    """flat_field=EMBEDDED multiplies the bilinear-sampled per-filter
    gain (numpy mirror of rawprepare.c:564-603)."""
    from ansel_tpu.core.types import RawMeta
    from ansel_tpu.io.dng import parse_opcode_list2
    from ansel_tpu.ops import base as ob
    from ansel_tpu.core.types import CFAPattern, Colorspace, ImageSpec
    from ansel_tpu.ops.rawprepare import RawPrepare, RawPrepareParams

    H, W, mv, mh = 32, 48, 3, 5
    rng = np.random.default_rng(11)
    gains4 = [rng.uniform(1.0, 2.5, mv * mh).astype(np.float32)
              for _ in range(4)]
    gm = parse_opcode_list2(opcode_list2_blob(H, W, mv, mh, gains4))
    meta = RawMeta(width=W, height=H, white_point=1000, gain_maps=gm)
    op = RawPrepare()
    p = RawPrepareParams(raw_white_point=1000, flat_field=1)
    ctx = ob.PlanContext(meta=meta)
    spec = ImageSpec(width=W, height=H, colorspace=Colorspace.RAW,
                     channels=1, cfa=CFAPattern.RGGB)
    plan = op.plan(ctx, spec, p)
    assert plan.static[2] == (mv, mh)
    c = op.coeffs(ctx, plan, p)
    raw = rng.uniform(0, 1000, (spec.pad_h, spec.pad_w)).astype(np.float32)
    out = np.asarray(op.apply(raw, c, plan, ctx))[:H, :W]

    # numpy mirror of the reference sampling loop
    maps = {((g.top & 1) << 1) + (g.left & 1):
            np.asarray(g.map_gain, np.float32).reshape(mv, mh)
            for g in gm}
    expected = np.empty((H, W), np.float32)
    for j in range(H):
        ym = min(max((j / H) * (mv - 1), 0.0), float(mv))
        y0 = min(int(ym), mv - 1)
        y1 = min(y0 + 1, mv - 1)
        yf = ym - y0
        for i in range(W):
            xm = min(max((i / W) * (mh - 1), 0.0), float(mh))
            x0 = min(int(xm), mh - 1)
            x1 = min(x0 + 1, mh - 1)
            xf = xm - x0
            mp = maps[((j & 1) << 1) + (i & 1)]
            top = (1 - xf) * mp[y0, x0] + xf * mp[y0, x1]
            bot = (1 - xf) * mp[y1, x0] + xf * mp[y1, x1]
            gain = (1 - yf) * top + yf * bot
            expected[j, i] = raw[j, i] / 1000.0 * gain
    assert np.allclose(out, expected, atol=1e-5), \
        np.abs(out - expected).max()


def test_gainmap_off_by_default(tmp_path):
    """flat_field=0 ignores present GainMaps (rawprepare.c FLAT_FIELD_OFF)."""
    from ansel_tpu.core.types import RawMeta
    from ansel_tpu.io.dng import parse_opcode_list2
    from ansel_tpu.ops import base as ob
    from ansel_tpu.core.types import CFAPattern, Colorspace, ImageSpec
    from ansel_tpu.ops.rawprepare import RawPrepare, RawPrepareParams

    gm = parse_opcode_list2(opcode_list2_blob(
        32, 48, 2, 2, [np.full(4, 2.0, np.float32)] * 4))
    meta = RawMeta(width=48, height=32, white_point=1000, gain_maps=gm)
    op = RawPrepare()
    ctx = ob.PlanContext(meta=meta)
    spec = ImageSpec(width=48, height=32, colorspace=Colorspace.RAW,
                     channels=1, cfa=CFAPattern.RGGB)
    plan = op.plan(ctx, spec, RawPrepareParams(raw_white_point=1000))
    assert plan.static[2] is None
