"""PDF format plugin (io/pdfwriter.py vs reference common/pdf.c +
imageio/format/pdf.c)."""

import zlib

import numpy as np

from ansel_tpu.io.pdfwriter import (MODE_DEBUG, MODE_DRAFT, PAPER_SIZES,
                                    parse_length, parse_paper_size,
                                    write_pdf)


def _img(h=24, w=32):
    rng = np.random.default_rng(0)
    return rng.random((3, h, w)).astype(np.float32)


def test_parse_length():
    # dt_pdf_parse_length semantics (common/pdf.c:69-98)
    assert abs(parse_length("25.4 mm") - 72.0) < 1e-4
    assert abs(parse_length("1 inch") - 72.0) < 1e-4
    assert abs(parse_length('2 "') - 144.0) < 1e-4
    assert abs(parse_length("1 cm") - 720.0 / 25.4) < 1e-4
    assert parse_length("0") == 0.0
    assert parse_length("bogus unit") is None


def test_parse_paper_size():
    for name, (w, h) in PAPER_SIZES.items():
        assert parse_paper_size(name) == (w, h)
        assert parse_paper_size(name.upper()) == (w, h)
    w, h = parse_paper_size("210 mm x 297 mm")
    assert abs(w - PAPER_SIZES["a4"][0]) < 1e-3
    assert abs(h - PAPER_SIZES["a4"][1]) < 1e-3
    # width inherits the trailing unit: "8.5 x 11 inch"
    w, h = parse_paper_size("8.5 x 11 inch")
    assert abs(w - 612.0) < 1e-3 and abs(h - 792.0) < 1e-3
    assert parse_paper_size("nonsense") is None


def test_write_pdf_structure(tmp_path):
    p = str(tmp_path / "out.pdf")
    write_pdf(p, _img(), size="a4", border="10 mm", title="t(e)st")
    data = open(p, "rb").read()
    assert data.startswith(b"%PDF-1.4")
    assert data.rstrip().endswith(b"%%EOF")
    assert b"/Type /Catalog" in data
    assert b"/Subtype /Image" in data
    assert b"/BitsPerComponent 8" in data
    assert b"/Title (t\\(e\\)st)" in data
    # xref offsets must point at "N 0 obj" lines
    xref_off = int(data.rsplit(b"startxref\n", 1)[1].split(b"\n")[0])
    assert data[xref_off:xref_off + 4] == b"xref"


def test_image_stream_roundtrip(tmp_path):
    img = _img(8, 16)
    p = str(tmp_path / "rt.pdf")
    write_pdf(p, img, size="letter", rotate=False)
    data = open(p, "rb").read()
    # find the image XObject stream and inflate it
    i = data.index(b"/Subtype /Image")
    s = data.index(b"stream\n", i) + len(b"stream\n")
    e = data.index(b"\nendstream", s)
    raw = zlib.decompress(data[s:e])
    got = np.frombuffer(raw, np.uint8).reshape(8, 16, 3).transpose(2, 0, 1)
    want = np.rint(np.clip(img, 0, 1) * 255)
    assert np.abs(got.astype(np.float32) - want).max() <= 1


def test_16bit_and_icc(tmp_path):
    from ansel_tpu.io.encode import srgb_icc_bytes
    p = str(tmp_path / "x.pdf")
    write_pdf(p, _img(), bpp=16, icc=srgb_icc_bytes())
    data = open(p, "rb").read()
    assert b"/BitsPerComponent 16" in data
    assert b"/ICCBased" in data and b"/N 3" in data


def test_draft_and_debug_modes(tmp_path):
    for mode in (MODE_DRAFT, MODE_DEBUG):
        p = str(tmp_path / f"m{mode}.pdf")
        write_pdf(p, _img(), mode=mode)
        data = open(p, "rb").read()
        # outline modes draw a rect, no image placement
        assert b"/Subtype /Image" in data  # object still embedded
        # content stream has no Do operator
        i = data.index(b"/Contents")


def test_rotate_to_fit(tmp_path):
    # wide image on portrait a4: rotated placement uses more page area
    img = _img(20, 60)
    pr = str(tmp_path / "rot.pdf")
    pn = str(tmp_path / "norot.pdf")
    write_pdf(pr, img, rotate=True, compress=False)
    write_pdf(pn, img, rotate=False, compress=False)
    dr, dn = open(pr, "rb").read(), open(pn, "rb").read()

    def ctm_scale(d):
        i = d.index(b" cm")
        start = d.rindex(b"\n", 0, i) + 1
        return [float(t) for t in d[start:i].split()]

    # rotated: first CTM is the rotation matrix [0 -1 1 0 ...]
    assert ctm_scale(dr)[:4] == [0.0, -1.0, 1.0, 0.0]
    assert ctm_scale(dn)[1] == 0.0 and ctm_scale(dn)[2] == 0.0


def test_write_image_dispatch(tmp_path):
    from ansel_tpu.io.encode import write_image
    p = str(tmp_path / "via.pdf")
    write_image(p, _img())
    assert open(p, "rb").read().startswith(b"%PDF")
