"""legacy_params breadth: every reference module with a legacy ladder
must decode its old binary param versions (iop_api.h:206-207; per-module
ladders cited in each from_legacy).  These byte layouts are constructed
from the reference's versioned structs."""

import math
import struct

import pytest

import ansel_tpu.ops  # noqa: F401 — populate the registry
from ansel_tpu.core.params import decode_blob


def test_temperature_v2():
    p = decode_blob("temperature", 2,
                    struct.pack("<4f", 5000.0, 2.0, 1.0, 1.5))
    assert (p.red, p.green, p.blue) == (2.0, 1.0, 1.5)
    assert math.isnan(p.g2)


def test_flip_v1():
    p = decode_blob("flip", 1, struct.pack("<i", 6))
    assert p.orientation == 6


def test_levels_v1():
    p = decode_blob("levels", 1, struct.pack("<3fi", 0.1, 0.5, 0.9, 0))
    assert abs(p.levels[0] - 0.1) < 1e-6 and abs(p.levels[2] - 0.9) < 1e-6


def test_grain_v1_zero_bias():
    p = decode_blob("grain", 1, struct.pack("<i2f", 0, 23.0, 50.0))
    assert p.midtones_bias == 0.0 and p.scale == 23.0


def test_vignette_v1_bsratio_split():
    raw = struct.pack("<5d2i2d", 90.0, 40.0, 50.0, 0.5, 0.3, 0, 1,
                      0.1, -0.2)
    p = decode_blob("vignette", 1, raw)
    assert abs(p.brightness - (-0.35)) < 1e-6
    assert abs(p.saturation - 1.0) < 1e-6  # inverted -> doubled
    assert p.unbound == 0


def test_shadhi_v1_signs_and_algo():
    p = decode_blob("shadhi", 1, struct.pack(
        "<i6f", 0, -80.0, 40.0, 1.0, -30.0, 0.0, 50.0))
    assert p.radius == 80.0 and p.shadhi_algo == 1
    assert p.shadows == 20.0 and p.highlights == 15.0


def test_tonecurve_v1_curve_build():
    xs = [i / 5 for i in range(6)]
    ys = [v**0.8 for v in xs]
    p = decode_blob("tonecurve", 1, struct.pack("<12fi", *(xs + ys + [0])))
    assert p.tonecurve_nodes == (6, 3, 3)
    assert p.tonecurve_type == (0, 2, 2)  # L cubic, ab monotone
    assert p.tonecurve_autoscale_ab == 1


def test_tonecurve_v4_passthrough():
    n = 120
    raw = struct.pack(f"<{n}f9i", *(list(range(n)) + [6, 3, 3, 2, 2, 2,
                                                      1, 0, 1]))
    p = decode_blob("tonecurve", 4, raw)
    assert p.tonecurve_unbound_ab == 1 and p.preserve_colors == 0


def test_basecurve_v3_stops_fix():
    n = 120
    raw = struct.pack(f"<{n}f6iif", *(list(range(n))
                                      + [6, 3, 3, 0, 2, 2] + [0] + [0.0]))
    p = decode_blob("basecurve", 3, raw)
    assert p.exposure_stops == 1.0 and p.exposure_bias == 1.0


def test_nlmeans_v1():
    p = decode_blob("nlmeans", 1, struct.pack("<2f", 0.4, 0.6))
    assert p.radius == 3.0 and p.strength == 100.0


def test_velvia_v1_product():
    p = decode_blob("velvia", 1, struct.pack("<4f", 50.0, 80.0, 0.5, 0.0))
    assert abs(p.strength - 40.0) < 1e-5 and p.bias == 0.5


def test_lowpass_v1_bilateral_from_sign():
    p = decode_blob("lowpass", 1, struct.pack("<i3f", 0, -30.0, 1.2, 0.8))
    assert p.radius == 30.0 and p.lowpass_algo == 1 and p.unbound == 0


def test_monochrome_v1():
    p = decode_blob("monochrome", 1, struct.pack("<3f", 10.0, -5.0, 2.3))
    assert p.highlights == 0.0 and p.a == 10.0


def test_rawdenoise_v1_default_curves():
    p = decode_blob("rawdenoise", 1, struct.pack("<f", 0.02))
    assert abs(p.threshold - 0.02) < 1e-7
    assert all(v == 0.5 for v in p.y)


def test_colorzones_v1_8node_expansion():
    raw = struct.pack("<i36f", 2, *([i / 5 for i in range(6)] * 3
                                    + [0.5] * 18))
    p = decode_blob("colorzones", 1, raw)
    assert p.curve_num_nodes == (8, 8, 8)
    assert p.curve_type == (1, 1, 1)
    assert p.splines_version == 0


def test_colorzones_v3_strength():
    raw = struct.pack("<i49f", 1, *([i / 7 for i in range(8)] * 3
                                    + [0.5] * 24 + [0.7]))
    p = decode_blob("colorzones", 3, raw)
    assert abs(p.strength - 0.7) < 1e-6


def test_lens_v2_tca_swap():
    raw = struct.pack("<2i5fi52s52si2f", 2, 0, 1.0, 1.6, 35.0, 4.0,
                      100.0, 1, b"Canon EOS", b"EF 35mm", 1,
                      1.002, 0.998)
    p = decode_blob("lens", 2, raw)
    assert p.camera == "Canon EOS"
    assert abs(p.tca_r - 0.998) < 1e-6  # R/B swapped in old versions
    assert abs(p.tca_b - 1.002) < 1e-6
    assert p.modified == 1


def test_colorbalance_v1_mode_legacy():
    p = decode_blob("colorbalance", 1, struct.pack("<12f", *range(12)))
    assert p.mode == 0 and p.gain == (8.0, 9.0, 10.0, 11.0)


def test_profile_gamma_v1():
    p = decode_blob("profile_gamma", 1, struct.pack("<2f", 0.1, 0.45))
    assert p.mode == 0 and abs(p.gamma - 0.45) < 1e-6


def test_borders_v1_aspect_flip():
    p = decode_blob("borders", 1,
                    struct.pack("<5f", 1, 1, 1, 0.5, -0.08))
    assert p.aspect == 2.0 and p.aspect_orient == 2
    assert abs(p.size - 0.08) < 1e-6 and p.max_border_size == 0


def test_toneequal_v1_new_defaults():
    raw = struct.pack("<13f3i", *([0.1] * 13), 1, 3, 2)
    p = decode_blob("toneequal", 1, raw)
    assert p.details == 1 and p.iterations == 3 and p.method == 2
    assert abs(p.quantization - 0.01) < 1e-9
    assert abs(p.smoothing - math.sqrt(2.0)) < 1e-9


def test_basicadj_v1_no_vibrance():
    raw = struct.pack("<5fi4f", 0.01, 0.5, 10, 20, 0.1, 1, 18.42,
                      0.2, 0.3, 90.0)
    p = decode_blob("basicadj", 1, raw)
    assert p.vibrance == 0.0 and p.clip == 90.0


def test_channelmixer_v1_gray_gate():
    red = [0.1, 0, 0, 0.9, 0.05, 0.05, 0.0]
    green = [0, 0.1, 0, 0.1, 0.8, 0.1, 0.0]
    blue = [0, 0, 0.1, 0, 0.1, 0.9, 0.0]
    p = decode_blob("channelmixer", 1,
                    struct.pack("<21f", *(red + green + blue)))
    # gray unused -> RGB mixing carried over
    assert abs(p.red[3] - 0.9) < 1e-6
    gray = [0.3, 0.6, 0.1]
    red[6], green[6], blue[6] = gray
    p = decode_blob("channelmixer", 1,
                    struct.pack("<21f", *(red + green + blue)))
    # gray used -> RGB mixing reset to identity
    assert p.red[3] == 1.0 and abs(p.red[6] - 0.3) < 1e-6


def test_negadoctor_v1_identity():
    raw = struct.pack("<i12f6f", 1, *range(12), 2.0, -0.05, 0.07, 4.0,
                      0.75, 0.92)
    p = decode_blob("negadoctor", 1, raw)
    assert p.film_stock == 1 and p.Dmin == (0.0, 1.0, 2.0, 3.0)
    assert abs(p.exposure - 0.92) < 1e-6


def test_lut3d_v1():
    raw = struct.pack("<512s2i", b"/tmp/x.cube", 1, 2)
    p = decode_blob("lut3d", 1, raw)
    assert p.filepath == "/tmp/x.cube" and p.nb_keypoints == 0


def test_colorout_v2_named_profiles():
    raw = struct.pack("<100s100s2i", b"adobergb", b"X profile", 2, 0)
    p = decode_blob("colorout", 2, raw)
    assert p.type == 1 and p.intent == 2
    raw = struct.pack("<100s100s2i", b"/path/my.icc", b"", 0, 0)
    p = decode_blob("colorout", 3, raw)
    assert p.type == 99 and p.filename == "/path/my.icc"


def test_colorout_v4():
    raw = struct.pack("<i100si", 5, b"", 1)
    p = decode_blob("colorout", 4, raw)
    assert p.type == 5 and p.intent == 1


def test_watermark_ladder():
    v1 = struct.pack("<4fi64s", 50.0, 100.0, 0.1, 0.2, 4, b"logo.svg")
    p = decode_blob("watermark", 1, v1)
    assert p.filename == "logo.svg" and p.rotate == 0.0 and p.sizeto == 0
    v4 = struct.pack("<4fifi64s64s3f64s", 50.0, 100.0, 0.1, 0.2, 4,
                     15.0, 1, b"logo.svg", b"hello", 0.1, 0.2, 0.3,
                     b"Sans 12")
    p = decode_blob("watermark", 4, v4)
    assert p.text == "hello" and p.rotate == 15.0 and p.font == "Sans 12"


def test_colorchecker_v1_classic_targets():
    raw = struct.pack("<72f", *range(72))
    p = decode_blob("colorchecker", 1, raw)
    assert p.num_patches == 24
    assert abs(p.source_L[0] - 39.19) < 1e-4  # dark skin
    assert p.target_L[1] == 1.0


def test_colorreconstruct_v1_v2():
    p = decode_blob("colorreconstruct", 1,
                    struct.pack("<3f", 95.0, 300.0, 10.0))
    assert p.precedence == 0 and abs(p.hue - 0.66) < 1e-6
    p = decode_blob("colorreconstruct", 2,
                    struct.pack("<3fi", 95.0, 300.0, 10.0, 1))
    assert p.precedence == 1


def test_clipping_v2_keystone_bit():
    k = struct.unpack("<f", struct.pack("<I", (
        struct.unpack("<I", struct.pack("<f", 0.25))[0] | 0x40000000)))[0]
    raw = struct.pack("<7f", 5.0, 0.1, 0.1, 0.9, 0.9, k, 0.0)
    p = decode_blob("clipping", 2, raw)
    assert p.k_type == 4 and p.k_v == 0.0 and p.k_h != 0.0
    assert p.crop_auto == 1


def test_clipping_v3_v4():
    p = decode_blob("clipping", 3,
                    struct.pack("<7f", 1.0, 0, 0, 1, 1, 0.0, 0.0))
    assert p.k_type == 0
    v4 = struct.pack("<15f4i", 1.0, 0, 0, 1, 1, 0.1, 0.0,
                     .2, .2, .8, .2, .8, .8, .2, .8, 4, 1, 1, 0)
    p = decode_blob("clipping", 4, v4)
    assert p.k_sym == 1 and p.k_apply == 1 and p.crop_auto == 0


def test_bilat_v1_v2_midtone():
    p = decode_blob("bilat", 1, struct.pack("<3f", 20.0, 50.0, 0.2))
    assert p.mode == 0 and p.midtone == 0.2
    p = decode_blob("bilat", 2, struct.pack("<I3f", 1, 0.5, 0.5, 0.25))
    assert p.mode == 1 and p.midtone == 0.2


def test_filmic_ladder():
    v1 = struct.pack("<12fi", *([1.0] * 12), 2)
    p = decode_blob("filmic", 1, v1)
    assert p.preserve_color == 0 and p.global_saturation == 100.0
    v2 = struct.pack("<12f2i", *([1.0] * 12), 2, 1)
    p = decode_blob("filmic", 2, v2)
    assert p.preserve_color == 1
    # ansel writes v3 with the layout registered here as v4
    v3 = struct.pack("<13f2i", *([1.0] * 13), 2, 1)
    p = decode_blob("filmic", 3, v3)
    assert p.interpolator == 2


def test_crystgrain_v9_alias():
    raw = struct.pack("<if2fi3f", 0, 25.0, 4.0, 0.25, 30, 0.0, 67.0,
                      67.0)
    # layout identical across 1/8/9 — just ensure v9 decodes
    p = decode_blob("crystgrain", 9, struct.pack(
        "<iffif3f", 0, 25.0, 4.0, 30, 0.25, 0.0, 67.0, 67.0))
    assert p.layers == 30


def test_globaltonemap_v1():
    p = decode_blob("globaltonemap", 1, struct.pack("<i2f", 1, 0.85, 100))
    assert p.detail == 0.0 and p.operator == 1


def test_invert_v1_nan_fourth():
    p = decode_blob("invert", 1, struct.pack("<3f", 0.9, 0.8, 0.7))
    assert math.isnan(p.color[3])


def test_colorize_v1_tag():
    p = decode_blob("colorize", 1, struct.pack("<4f", 0.5, 0.6, 50, 40))
    assert p.version == 1


def test_colorcontrast_v1_bound():
    p = decode_blob("colorcontrast", 1, struct.pack("<4f", 1.2, 0, 1.1, 0))
    assert p.unbound == 0
