"""XMP sidecar read/write round-trip + a real-world-shaped fixture."""

import numpy as np

from ansel_tpu.core.params import xmp_encode
from ansel_tpu.io.xmp import XMPDocument, parse_xmp, write_xmp
from ansel_tpu.pipeline.engine import HistoryItem
from ansel_tpu.ops.exposure import ExposureParams
from ansel_tpu.ops.filmicrgb import FilmicParams


def test_roundtrip(tmp_path):
    doc = XMPDocument(
        history=[
            HistoryItem("exposure", ExposureParams(exposure=1.25), version=6,
                        enabled=True, iop_order=21.0),
            HistoryItem("filmicrgb", FilmicParams(contrast=1.5), version=5,
                        enabled=True),
        ],
        history_end=2,
    )
    p = tmp_path / "test.xmp"
    write_xmp(str(p), doc)
    back = parse_xmp(str(p))
    assert back.history_end == 2
    assert [h.op for h in back.history] == ["exposure", "filmicrgb"]
    ep = ExposureParams.codec.decode(back.history[0].params)
    assert abs(ep.exposure - 1.25) < 1e-6
    fp = FilmicParams.codec.decode(back.history[1].params)
    assert abs(fp.contrast - 1.5) < 1e-6
    assert back.history[0].iop_order == 21.0


def test_parse_modern_inline_format():
    blob = xmp_encode(ExposureParams.codec.encode(ExposureParams(exposure=2.0)),
                      compress=True)
    xml = f"""<?xpacket begin="" id="W5M0MpCehiHzreSzNTczkc9d"?>
<x:xmpmeta xmlns:x="adobe:ns:meta/">
 <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">
  <rdf:Description rdf:about=""
    xmlns:darktable="http://darktable.sf.net/"
    darktable:xmp_version="5"
    darktable:history_end="1"
    darktable:iop_order_version="2">
   <darktable:history>
    <rdf:Seq>
     <rdf:li
       darktable:operation="exposure"
       darktable:enabled="1"
       darktable:modversion="6"
       darktable:params="{blob}"
       darktable:multi_priority="0"/>
    </rdf:Seq>
   </darktable:history>
  </rdf:Description>
 </rdf:RDF>
</x:xmpmeta>
<?xpacket end="w"?>"""
    doc = parse_xmp(xml.encode())
    assert doc.history_end == 1 and doc.iop_order_version == 2
    assert doc.history[0].op == "exposure"
    p = ExposureParams.codec.decode(doc.history[0].params)
    assert abs(p.exposure - 2.0) < 1e-6


def test_parse_legacy_parallel_arrays():
    blob = xmp_encode(ExposureParams.codec.encode(ExposureParams(exposure=0.5)),
                      compress=False)
    xml = f"""<x:xmpmeta xmlns:x="adobe:ns:meta/">
 <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">
  <rdf:Description rdf:about=""
    xmlns:darktable="http://darktable.sf.net/">
   <darktable:history_modversion><rdf:Seq><rdf:li>6</rdf:li></rdf:Seq></darktable:history_modversion>
   <darktable:history_enabled><rdf:Seq><rdf:li>1</rdf:li></rdf:Seq></darktable:history_enabled>
   <darktable:history_operation><rdf:Seq><rdf:li>exposure</rdf:li></rdf:Seq></darktable:history_operation>
   <darktable:history_params><rdf:Seq><rdf:li>{blob}</rdf:li></rdf:Seq></darktable:history_params>
  </rdf:Description>
 </rdf:RDF>
</x:xmpmeta>"""
    doc = parse_xmp(xml.encode())
    assert doc.history[0].op == "exposure" and doc.history[0].enabled
    p = ExposureParams.codec.decode(doc.history[0].params)
    assert abs(p.exposure - 0.5) < 1e-6


def test_xmp_history_drives_pipeline(tmp_path):
    from ansel_tpu import compile_pipeline
    from ansel_tpu.io.synthetic import synth_raw

    raw, meta, _ = synth_raw(h=64, w=128)
    doc = XMPDocument(history=[
        HistoryItem("exposure", ExposureParams(exposure=1.0), version=6),
    ])
    p = tmp_path / "img.xmp"
    write_xmp(str(p), doc)
    hist = parse_xmp(str(p)).history
    pipe = compile_pipeline(meta, hist)
    out = pipe.output_array(raw)
    pipe0 = compile_pipeline(meta, [])
    out0 = pipe0.output_array(raw)
    assert np.mean(out) > np.mean(out0)  # +1EV renders brighter
