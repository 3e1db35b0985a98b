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
