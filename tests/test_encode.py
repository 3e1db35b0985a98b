"""Export encoding: 8/16-bit formats, ICC embedding, EXIF carry-over
(reference imageio_core.c:897-928 + format/{jpeg,png,tiff}.c)."""

import numpy as np
import pytest
from PIL import Image

from ansel_tpu.io.encode import (exif_from_meta, srgb_icc_bytes, to_uint16,
                                 write_image, write_pfm)


@pytest.fixture
def img():
    rng = np.random.default_rng(7)
    return rng.random((3, 40, 56), dtype=np.float32)


def test_jpeg_icc_exif(tmp_path, img):
    from types import SimpleNamespace

    p = str(tmp_path / "o.jpg")
    write_image(p, img, meta=SimpleNamespace(maker="NIKON", model="D7000",
                                             iso=800))
    im = Image.open(p)
    assert im.info.get("icc_profile")
    ex = dict(im.getexif())
    assert ex.get(271) == "NIKON" and ex.get(34855) == 800


@pytest.mark.parametrize("ext", ["png", "tif"])
def test_16bit_roundtrip(tmp_path, img, ext):
    p = str(tmp_path / f"o.{ext}")
    write_image(p, img, bpp=16)
    im = Image.open(p)
    assert im.info.get("icc_profile")
    a = np.asarray(im).astype(np.int32)      # PIL downconverts RGB16 -> 8
    e = (to_uint16(img) // 257).astype(np.int32)
    assert np.abs(a - e).max() <= 1


def test_pfm_exact(tmp_path, img):
    p = str(tmp_path / "o.pfm")
    write_pfm(p, img)
    with open(p, "rb") as f:
        assert f.readline() == b"PF\n"
        w, h = map(int, f.readline().split())
        f.readline()
        data = np.frombuffer(f.read(), "<f4").reshape(h, w, 3)[::-1]
    assert np.allclose(data.transpose(2, 0, 1), img)


def test_icc_is_valid_profile():
    icc = srgb_icc_bytes()
    assert icc[36:40] == b"acsp"  # ICC signature


def test_exif_roundtrip():
    from types import SimpleNamespace

    b = exif_from_meta(SimpleNamespace(maker="SONY", model="A7", iso=100))
    assert b and b"SONY" in b


def test_exr_writer_roundtrip():
    """Minimal OpenEXR writer (format/exr.cc analog): parse back our own
    scanline layout and verify the pixel data + offset table."""
    import struct

    from ansel_tpu.io.encode import write_exr

    rng = np.random.default_rng(0)
    x = rng.uniform(0.0, 4.0, (3, 12, 20)).astype(np.float32)
    path = "/tmp/ansel_tpu_test.exr"
    write_exr(path, x)
    buf = open(path, "rb").read()
    assert struct.unpack("<I", buf[:4])[0] == 20000630
    assert buf[4] == 2
    # walk attributes to the header end
    pos = 8
    attrs = {}
    while buf[pos] != 0:
        e = buf.index(b"\0", pos)
        name = buf[pos:e].decode()
        pos = e + 1
        e = buf.index(b"\0", pos)
        pos = e + 1
        (alen,) = struct.unpack_from("<i", buf, pos)
        attrs[name] = buf[pos + 4:pos + 4 + alen]
        pos += 4 + alen
    pos += 1
    assert attrs["compression"] == b"\0"
    x0, y0, x1, y1 = struct.unpack("<iiii", attrs["dataWindow"])
    h, w = y1 - y0 + 1, x1 - x0 + 1
    assert (h, w) == (12, 20)
    offsets = struct.unpack_from(f"<{h}Q", buf, pos)
    pos += 8 * h
    assert offsets[0] == pos  # first block right after the table
    out = np.zeros((3, h, w), np.float32)
    for yy in range(h):
        o = offsets[yy]
        line_y, size = struct.unpack_from("<ii", buf, o)
        assert line_y == yy and size == 3 * 2 * w
        for k, ch in enumerate((2, 1, 0)):  # B, G, R order on disk
            row = np.frombuffer(buf, "<f2", w, o + 8 + k * 2 * w)
            out[ch, yy] = row.astype(np.float32)
    assert np.allclose(out, x, atol=4e-3)  # half-float quantization


def test_avif_roundtrip(tmp_path, img):
    """AVIF plugin (format/avif.c analog): decodes back close to source."""
    g = np.linspace(0, 1, 40 * 56, dtype=np.float32).reshape(40, 56)
    smooth = np.stack([g, g[::-1], g * 0.5])
    p = str(tmp_path / "o.avif")
    write_image(p, smooth, quality=90)
    im = Image.open(p)
    assert im.format == "AVIF" and im.info.get("icc_profile")
    a = np.asarray(im).astype(np.float32) / 255.0
    e = np.clip(smooth, 0, 1).transpose(1, 2, 0)
    assert np.abs(a - e).mean() < 0.03


def test_j2k_lossless_roundtrip(tmp_path, img):
    """JPEG-2000 plugin (format/j2k.c analog): quality=100 => reversible."""
    p = str(tmp_path / "o.jp2")
    write_image(p, img, quality=100, icc=None)
    im = Image.open(p)
    assert im.format == "JPEG2000"
    a = np.asarray(im).transpose(2, 0, 1)
    e = np.clip(np.round(np.clip(img, 0, 1) * 255), 0, 255).astype(np.uint8)
    assert (a == e).all()


def test_j2k_lossy(tmp_path, img):
    p = str(tmp_path / "o.j2k")
    write_image(p, img, quality=50, icc=None)
    a = np.asarray(Image.open(p)).astype(np.float32) / 255.0
    e = np.clip(img, 0, 1).transpose(1, 2, 0)
    assert np.abs(a - e).mean() < 0.05


def test_heif_fails_loudly(tmp_path, img):
    with pytest.raises(ValueError, match="HEVC"):
        write_image(str(tmp_path / "o.heic"), img)
