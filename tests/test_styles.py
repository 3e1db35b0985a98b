"""Styles: parse the REFERENCE's own .dtstyle fixture, apply, round-trip."""

import numpy as np

from ansel_tpu.io.styles import Style, apply_style, parse_style, write_style
from ansel_tpu.pipeline.engine import HistoryItem

FIXTURE = "/root/reference/tests/styles/mixed_instances.dtstyle"


def test_parse_reference_fixture():
    style = parse_style(FIXTURE)
    assert style.name == "test"
    ops = [(h.op, h.multi_priority) for h in style.items]
    assert ("colorbalancergb", 2) in ops and ("exposure", 1) in ops
    # exposure params decode to the v6 struct
    from ansel_tpu.core.params import decode_blob

    exp = next(h for h in style.items
               if h.op == "exposure" and h.multi_priority == 2)
    p = decode_blob("exposure", exp.version, exp.params)
    assert abs(p.exposure - 1.2449) < 1e-3  # 0x3f9f5c28
    # blend params decode
    from ansel_tpu.pipeline.blend import decode_blend_params

    bp = decode_blend_params(exp.blend_params)
    assert bp is not None and bp.opacity > 0


def test_apply_style_merges():
    base = [HistoryItem("exposure", {"exposure": 0.1})]
    style = Style(name="s", items=[
        HistoryItem("exposure", {"exposure": 1.0}, multi_priority=0),
        HistoryItem("vibrance", {"amount": 30.0}),
    ])
    merged = apply_style(base, style)
    assert len(merged) == 2
    assert merged[0].params == {"exposure": 1.0}


def test_style_roundtrip(tmp_path):
    from ansel_tpu.ops.exposure import ExposureParams

    style = Style(name="rt", items=[
        HistoryItem("exposure", ExposureParams(exposure=0.7), version=6)])
    p = tmp_path / "rt.dtstyle"
    write_style(str(p), style)
    back = parse_style(str(p))
    assert back.name == "rt"
    from ansel_tpu.core.params import decode_blob

    q = decode_blob("exposure", 6, back.items[0].params)
    assert abs(q.exposure - 0.7) < 1e-6


def test_style_drives_pipeline():
    from ansel_tpu import compile_pipeline
    from ansel_tpu.io.synthetic import synth_raw

    raw, meta, _ = synth_raw(h=64, w=128)
    style = parse_style(FIXTURE)
    # keep only ops we implement (the style carries exposure instances)
    items = [h for h in style.items if h.op == "exposure"]
    items.append(HistoryItem("demosaic", {"demosaicing_method": 0}))
    pipe = compile_pipeline(meta, items)
    out = pipe.output_array(raw)
    assert np.isfinite(out).all()
