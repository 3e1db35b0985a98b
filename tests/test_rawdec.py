"""native/rawdec container breadth: CR2 / NEF / ARW / RAF round-trips.

Fixtures are synthetic (no camera files exist in this environment) but
spec-conformant; they exercise every container walk, the LJ92 decoder +
Canon slice reassembly, packed-bit paths, and metadata extraction.
Reference decoder-set: /root/reference/src/imageio/imageio_rawspeed.cc:692.
"""

import numpy as np
import pytest

from ansel_tpu.core.types import CFAPattern
from ansel_tpu.io.dng import load_raw
from rawfixtures import (write_arw, write_arw2, write_cr2, write_cr3,
                         write_nef, write_nef_34713, write_orf, write_pef,
                         write_raf, write_raf_compressed, write_rw2)

XTRANS6 = ((1, 2, 0, 1, 0, 2),
           (0, 1, 1, 2, 1, 1),
           (2, 1, 1, 0, 1, 1),
           (1, 0, 2, 1, 2, 0),
           (2, 1, 1, 0, 1, 1),
           (0, 1, 1, 2, 1, 1))


def _mosaic(h, w, bits, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 1 << bits, (h, w), dtype=np.uint16)


def test_nef_packed_roundtrip(tmp_path):
    m = _mosaic(48, 64, 14)
    p = str(tmp_path / "shot.nef")
    write_nef(p, m, bits=14)
    raw, meta = load_raw(p)
    assert raw.shape == (48, 64)
    assert np.array_equal(raw, m.astype(np.float32))
    assert meta.cfa is CFAPattern.RGGB
    assert meta.black_levels[0] == 600.0
    assert meta.white_point == (1 << 14) - 1
    assert meta.maker.startswith("NIKON")
    assert "D850" in meta.model
    assert meta.iso == 400.0


def test_arw_packed_roundtrip(tmp_path):
    m = _mosaic(40, 96, 12)
    p = str(tmp_path / "shot.arw")
    write_arw(p, m, bits=12)
    raw, meta = load_raw(p)
    assert np.array_equal(raw, m.astype(np.float32))
    assert meta.maker.startswith("SONY")
    assert meta.black_levels[0] == 512.0
    assert meta.white_point == (1 << 12) - 1


@pytest.mark.parametrize("n_slices", [1, 3])
def test_cr2_lj92_slices_roundtrip(tmp_path, n_slices):
    m = _mosaic(32, 96, 14, seed=n_slices)
    p = str(tmp_path / "shot.cr2")
    write_cr2(p, m, bits=14, n_slices=n_slices)
    raw, meta = load_raw(p)
    assert raw.shape == m.shape
    assert np.array_equal(raw, m.astype(np.float32)), \
        np.argwhere(raw != m)[:4]
    assert meta.maker == "Canon"
    assert "40D" in meta.model


@pytest.mark.parametrize("bits", [12, 14])
def test_cr3_crx_roundtrip(tmp_path, bits):
    """CR3 (ISO-BMFF + CRX raw track): bit-exact vs the Python encoder;
    the BMFF walk, Canon uuid CMT metadata, CRAW/CMP1 stsd entry,
    stsz/co64 sample location, and all four subplane streams."""
    m = _mosaic(40, 64, bits, seed=7)
    p = str(tmp_path / "shot.cr3")
    write_cr3(p, m, bits=bits, iso=1600)
    raw, meta = load_raw(p)
    assert raw.shape == (40, 64)
    assert np.array_equal(raw, m.astype(np.float32)), \
        np.argwhere(raw != m)[:4]
    assert meta.cfa is CFAPattern.RGGB
    assert meta.maker == "Canon"
    assert "R5" in meta.model
    assert meta.iso == 1600
    assert meta.white_point == (1 << bits) - 1


def test_cr3_smooth_scene(tmp_path):
    """Smooth scene: long low-K runs + one escape spike."""
    yy, xx = np.mgrid[0:48, 0:64]
    m = ((np.sin(yy / 9.0) + np.cos(xx / 13.0) + 2.0)
         * (16383 / 4.0)).astype(np.uint16)
    m[7, 11] = 16383
    p = str(tmp_path / "smooth.cr3")
    write_cr3(p, m, bits=14)
    raw, _ = load_raw(p)
    assert np.array_equal(raw, m.astype(np.float32))


def test_cr3_feeds_pipeline(tmp_path):
    from ansel_tpu import HistoryItem, compile_pipeline

    m = _mosaic(64, 96, 14, seed=9)
    p = str(tmp_path / "shot.cr3")
    write_cr3(p, m)
    raw, meta = load_raw(p)
    pipe = compile_pipeline(meta, [HistoryItem("exposure", {})])
    out = np.asarray(pipe.output_array(raw))
    assert out.shape[0] == 3 and np.isfinite(out).all()


@pytest.mark.parametrize("bits", [12, 14])
def test_raf_compressed_xtrans_roundtrip(tmp_path, bits):
    """Fuji lossless-compressed payload (the default on modern X
    bodies), bit-exact vs the independent Python encoder — incl. a
    block_size smaller than the width so the multi-strip path and the
    per-strip context reset are exercised."""
    m = _mosaic(48, 96, bits, seed=3)
    p = str(tmp_path / "shot.raf")
    write_raf_compressed(p, m, XTRANS6, bits=bits, block_size=48)
    raw, meta = load_raw(p)
    assert raw.shape == (48, 96)
    assert np.array_equal(raw, m.astype(np.float32)), \
        np.argwhere(raw != m)[:4]
    assert meta.cfa is CFAPattern.XTRANS
    assert meta.white_point == (1 << bits) - 1


def test_raf_compressed_bayer_roundtrip(tmp_path):
    """GFX-class Bayer RAF with the compressed payload."""
    m = _mosaic(40, 64, 14, seed=5)
    p = str(tmp_path / "shot.raf")
    write_raf_compressed(p, m, xtrans=None, bits=14, block_size=64)
    raw, meta = load_raw(p)
    assert np.array_equal(raw, m.astype(np.float32))
    assert meta.cfa is CFAPattern.RGGB


def test_raf_compressed_smooth_scene(tmp_path):
    """A smooth gradient compresses well below 1 byte/sample/…; also a
    non-random payload exercises long Rice runs + the escape path."""
    yy, xx = np.mgrid[0:48, 0:96]
    m = ((np.sin(yy / 7.0) + np.cos(xx / 11.0) + 2.0)
         * ((1 << 13) / 4.0)).astype(np.uint16)
    m[5, 9] = (1 << 14) - 1  # spike -> escape code
    p = str(tmp_path / "smooth.raf")
    write_raf_compressed(p, m, XTRANS6, bits=14, block_size=96)
    raw, _ = load_raw(p)
    assert np.array_equal(raw, m.astype(np.float32))


def test_raf_xtrans_roundtrip(tmp_path):
    m = _mosaic(48, 60, 16)
    p = str(tmp_path / "shot.raf")
    write_raf(p, m, XTRANS6)
    raw, meta = load_raw(p)
    assert raw.shape == (48, 60)
    assert np.array_equal(raw, m.astype(np.float32))
    assert meta.cfa is CFAPattern.XTRANS
    assert meta.xtrans == tuple(
        int(v) for v in np.asarray(XTRANS6).reshape(-1))
    assert meta.maker == "FUJIFILM"
    assert "X-T3" in meta.model


@pytest.mark.parametrize("bits", [12, 14])
def test_nef_34713_lossless_roundtrip(tmp_path, bits):
    """Nikon entropy coding, lossless trees: bit-exact mosaic recovery."""
    m = _mosaic(48, 64, bits, seed=bits)
    p = str(tmp_path / "shot.nef")
    expected = write_nef_34713(p, m, bits=bits)
    # lossless + identity curve: expected decode IS the mosaic
    assert np.array_equal(expected, m)
    raw, meta = load_raw(p)
    assert np.array_equal(raw, m.astype(np.float32)), \
        np.argwhere(raw != m)[:4]
    assert meta.maker.startswith("NIKON")
    assert meta.white_point == (1 << bits) - 1
    assert meta.iso == 640.0


@pytest.mark.parametrize("bits,split", [(12, 0), (14, 0), (14, 17)])
def test_nef_34713_lossy_vs_oracle(tmp_path, bits, split):
    """Lossy trees (+ split-row tree switch): C++ matches the Python
    oracle bit-exact on a random-but-valid symbol stream."""
    p = str(tmp_path / "shot.nef")
    expected = write_nef_34713(p, None, bits=bits, lossy=True, split=split,
                               seed=bits + split)
    raw, meta = load_raw(p)
    assert np.array_equal(raw, expected.astype(np.float32)), \
        np.argwhere(raw != expected)[:4]


@pytest.mark.parametrize("encrypted", [False, True])
def test_arw2_roundtrip(tmp_path, encrypted):
    """Sony ARW2 blocks + tone curve; encrypted=True routes the curve
    through the SR2 LFSR-encrypted hidden IFD."""
    rng = np.random.default_rng(7 + encrypted)
    vals = rng.integers(0, 0x800, (32, 64), dtype=np.uint16)
    p = str(tmp_path / "shot.arw")
    expected = write_arw2(p, vals, encrypted=encrypted)
    raw, meta = load_raw(p)
    assert np.array_equal(raw, expected.astype(np.float32)), \
        np.argwhere(raw != expected)[:4]
    assert meta.maker.startswith("SONY")
    assert meta.black_levels[0] == 128.0
    # white point comes from the decoded tone curve's ceiling
    assert meta.white_point > 0x7FF


def test_arw2_smooth_scene_near_exact(tmp_path):
    """On a smooth gradient the ARW2 quantization is sh=0 -> the block
    codec is lossless; decode equals curve(source)."""
    from rawfixtures import sony_build_curve

    yy, xx = np.mgrid[0:32, 0:64]
    vals = (xx * 8 + yy % 16).astype(np.uint16)  # gentle ramp, max delta<128
    p = str(tmp_path / "shot.arw")
    knots = (2000, 6000, 10000, 14000)
    expected = write_arw2(p, vals, knots4=knots)
    curve = np.asarray(sony_build_curve(knots))
    want = curve[vals.astype(np.int64) << 1] >> 2
    assert np.array_equal(expected, want)
    raw, _ = load_raw(p)
    assert np.array_equal(raw, want.astype(np.float32))


def test_nef_34713_feeds_pipeline(tmp_path):
    """End-to-end: compressed NEF -> load -> demosaic pipe."""
    yy, xx = np.mgrid[0:48, 0:64]
    scene = 800 + (xx * 150 + yy * 80)
    m = np.minimum(scene, 16000).astype(np.uint16)
    p = str(tmp_path / "shot.nef")
    write_nef_34713(p, m, bits=14)
    raw, meta = load_raw(p)

    from ansel_tpu import compile_pipeline
    from ansel_tpu.pipeline.engine import HistoryItem

    pipe = compile_pipeline(meta, [HistoryItem("filmicrgb", {})])
    out = pipe.output_array(raw)
    assert out.shape[0] == 3
    assert np.isfinite(out).all()
    assert out.max() > 0.05


def test_raf_feeds_xtrans_pipeline(tmp_path):
    """End-to-end: a RAF fixture runs through the Markesteijn pipe."""
    import jax

    from ansel_tpu import compile_pipeline
    from ansel_tpu.pipeline.engine import HistoryItem

    yy, xx = np.mgrid[0:48, 0:60]
    scene = (0.2 + 0.5 * xx / 60 + 0.3 * yy / 48)
    sel = np.asarray(XTRANS6)[yy % 6, xx % 6]
    m = (scene * 4000 + 100 * (sel == 1)).astype(np.uint16)
    p = str(tmp_path / "shot.raf")
    write_raf(p, m, XTRANS6)
    raw, meta = load_raw(p)
    pipe = compile_pipeline(meta, [
        HistoryItem("demosaic", {"demosaicing_method": 1024 | 1}),
        HistoryItem("filmicrgb", {}),
    ])
    out = pipe.output_array(raw)
    assert out.shape[0] == 3
    assert np.isfinite(out).all()
    assert out.max() > 0.05


def test_rw2_v4_roundtrip(tmp_path):
    """Panasonic RW2: TIFF magic 85, Panasonic geometry/CFA/WB tags,
    v4 bitstream (split 0x4000 sections, down-counting cursor,
    14-pixel predictor groups) — bit-exact vs the Python encoder."""
    rng = np.random.default_rng(21)
    h, w = 40, 64
    yy, xx = np.mgrid[0:h, 0:w]
    base = 1800 + 700 * np.sin(yy / 15.0) + 600 * np.cos(xx / 20.0)
    m = np.clip(base + rng.integers(-25, 25, (h, w)), 160, 4095) \
        .astype(np.uint16)
    p = str(tmp_path / "shot.rw2")
    write_rw2(p, m, iso=640)
    raw, meta = load_raw(p)
    assert raw.shape == (h, w)
    assert np.array_equal(raw, m.astype(np.float32)), \
        np.argwhere(raw != m)[:4]
    assert meta.cfa is CFAPattern.RGGB
    assert meta.maker == "Panasonic"
    assert "DC-S5" in meta.model
    assert meta.iso == 640
    assert meta.black_levels[0] == 80.0   # tag value 65 + the +15 offset
    assert abs(meta.wb_coeffs[0] - 440.0 / 256.0) < 1e-6
    assert abs(meta.wb_coeffs[2] - 380.0 / 256.0) < 1e-6


def test_rw2_multi_section(tmp_path):
    """> 0x20000 bits of stream: the section split-load layout."""
    rng = np.random.default_rng(3)
    h, w = 64, 400   # ~25k px * ~10 bits > one 0x4000-byte section
    yy, xx = np.mgrid[0:h, 0:w]
    base = 2000 + 700 * np.sin(yy / 12.0) + 600 * np.cos(xx / 22.0)
    m = np.clip(base + rng.integers(-25, 25, (h, w)), 160, 4095) \
        .astype(np.uint16)
    p = str(tmp_path / "big.rw2")
    write_rw2(p, m)
    raw, _ = load_raw(p)
    assert np.array_equal(raw, m.astype(np.float32))


@pytest.mark.parametrize("compressed", [False, True])
def test_orf_roundtrip(tmp_path, compressed):
    """Olympus ORF: 'RO'-magic TIFF walk; packed-12 vs the predictive
    codec selected by the strip-size rule."""
    rng = np.random.default_rng(5)
    h, w = 48, 64
    yy, xx = np.mgrid[0:h, 0:w]
    base = 1500 + 900 * np.sin(yy / 8.0) + 800 * np.cos(xx / 10.0)
    m = np.clip(base + rng.integers(-30, 30, (h, w)), 0, 4095) \
        .astype(np.uint16)
    if not compressed:
        m = _mosaic(h, w, 12, seed=6)   # packed path: any values
    p = str(tmp_path / "shot.orf")
    write_orf(p, m, compressed=compressed)
    raw, meta = load_raw(p)
    assert raw.shape == (h, w)
    assert np.array_equal(raw, m.astype(np.float32)), \
        np.argwhere(raw != m)[:4]
    assert meta.cfa is CFAPattern.RGGB
    assert "OLYMPUS" in meta.maker
    assert meta.iso == 400


def test_orf_compressed_spike(tmp_path):
    """A hot pixel exercises the 12-zero escape path of the high code."""
    yy, xx = np.mgrid[0:40, 0:56]
    m = (1000 + 400 * np.sin(yy / 6.0) * np.cos(xx / 6.0)) \
        .astype(np.uint16)
    m[9, 13] = 4095
    m[20, 30] = 0
    p = str(tmp_path / "spike.orf")
    write_orf(p, m, compressed=True)
    raw, _ = load_raw(p)
    assert np.array_equal(raw, m.astype(np.float32))


@pytest.mark.parametrize("bits", [12, 14])
def test_pef_roundtrip(tmp_path, bits):
    """Pentax PEF: MakerNote 0x0220 huffman spec + ssss diff stream
    with the two-row vertical / horizontal predictor scheme."""
    m = _mosaic(40, 64, bits, seed=17)
    p = str(tmp_path / "shot.pef")
    write_pef(p, m, bits=bits)
    raw, meta = load_raw(p)
    assert raw.shape == (40, 64)
    assert np.array_equal(raw, m.astype(np.float32)), \
        np.argwhere(raw != m)[:4]
    assert meta.cfa is CFAPattern.RGGB
    assert "PENTAX" in meta.maker
    assert "K-5" in meta.model
    assert meta.white_point == (1 << bits) - 1
