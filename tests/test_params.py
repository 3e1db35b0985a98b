"""Params codec: struct layout round-trips and XMP payload encoding
(reference serialization contract: introspection structs + exif.cc
hex/gz-base64 encoding)."""

import math

from ansel_tpu.core import params as P
from ansel_tpu.ops.exposure import ExposureParams
from ansel_tpu.ops.filmicrgb import FilmicParams
from ansel_tpu.ops.rawprepare import RawPrepareParams
from ansel_tpu.ops.temperature import TemperatureParams


def test_exposure_roundtrip():
    p = ExposureParams(mode=0, black=-0.01, exposure=1.5,
                       deflicker_percentile=50.0,
                       deflicker_target_level=-4.0,
                       compensate_exposure_bias=1)
    raw = ExposureParams.codec.encode(p)
    assert len(raw) == 24  # 2 ints + 4 floats
    q = ExposureParams.codec.decode(raw)
    assert q.mode == p.mode and q.compensate_exposure_bias == 1
    assert abs(q.black - p.black) < 1e-7 and abs(q.exposure - p.exposure) < 1e-6


def test_temperature_nan_g2_roundtrip():
    p = TemperatureParams(red=2.1, green=1.0, blue=1.4, g2=float("nan"))
    q = TemperatureParams.codec.decode(TemperatureParams.codec.encode(p))
    assert abs(q.red - p.red) < 1e-6 and math.isnan(q.g2)


def test_rawprepare_layout():
    p = RawPrepareParams(x=2, y=4, width=6, height=8,
                         raw_black_level_separate=(512, 513, 514, 515),
                         raw_white_point=15000)
    raw = RawPrepareParams.codec.encode(p)
    # 4x int32 + 4x uint16 + uint16 + int32 (flat_field) = 16+8+2+4
    assert len(raw) == 30
    q = RawPrepareParams.codec.decode(raw)
    assert q.raw_black_level_separate == (512, 513, 514, 515)
    assert q.raw_white_point == 15000


def test_filmic_struct_size():
    # 18 floats + 10 int32 enums/bools = 112 bytes (reference v5 layout)
    assert FilmicParams.codec.size == 112


def test_xmp_hex_and_gz():
    blob = ExposureParams.codec.encode(ExposureParams(exposure=0.7))
    hex_text = P.xmp_encode(blob, compress=False)
    assert P.xmp_decode(hex_text) == blob
    gz_text = P.xmp_encode(b"\x00" * 500, compress=True)
    assert gz_text.startswith("gz")
    assert P.xmp_decode(gz_text) == b"\x00" * 500


def test_decode_blob_exact_and_legacy():
    blob = ExposureParams.codec.encode(ExposureParams(exposure=0.7))
    p = P.decode_blob("exposure", 6, blob)
    assert abs(p.exposure - 0.7) < 1e-6
    import struct

    legacy = struct.pack("<3f", 0.0, 1.25, 1.0)
    p2 = P.decode_blob("exposure", 2, legacy)
    assert abs(p2.exposure - 1.25) < 1e-6
