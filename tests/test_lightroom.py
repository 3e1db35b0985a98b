"""Lightroom XMP import (develop/lightroom.c mapping)."""

import numpy as np

LR_XMP = """<?xml version="1.0" encoding="UTF-8"?>
<x:xmpmeta xmlns:x="adobe:ns:meta/">
 <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">
  <rdf:Description rdf:about=""
    xmlns:crs="http://ns.adobe.com/camera-raw-settings/1.0/"
    xmlns:xmp="http://ns.adobe.com/xap/1.0/"
    xmlns:dc="http://purl.org/dc/elements/1.1/"
    xmp:Rating="4"
    xmp:Label="Red"
    crs:Exposure2012="+0.85"
    crs:Blacks2012="-50"
    crs:HasCrop="True"
    crs:CropTop="0.1" crs:CropLeft="0.05" crs:CropBottom="0.9"
    crs:CropRight="0.95" crs:CropAngle="2.5"
    crs:ImageWidth="6000" crs:ImageLength="4000"
    crs:Orientation="6"
    crs:GrainAmount="30"
    crs:GrainFrequency="60"
    crs:PostCropVignetteAmount="-40"
    crs:PostCropVignetteMidpoint="30"
    crs:PostCropVignetteStyle="1"
    crs:SaturationAdjustmentRed="25"
    crs:LuminanceAdjustmentBlue="-30"
    crs:SplitToningShadowHue="220"
    crs:SplitToningShadowSaturation="30"
    crs:SplitToningHighlightHue="40"
    crs:SplitToningHighlightSaturation="20"
    crs:SplitToningBalance="-25"
    crs:ParametricShadows="20"
    crs:ToneCurveName2012="Medium Contrast">
   <dc:subject><rdf:Bag><rdf:li>alps</rdf:li><rdf:li>ski</rdf:li></rdf:Bag></dc:subject>
   <crs:ToneCurvePV2012><rdf:Seq>
     <rdf:li>0, 0</rdf:li><rdf:li>128, 140</rdf:li><rdf:li>255, 255</rdf:li>
   </rdf:Seq></crs:ToneCurvePV2012>
  </rdf:Description>
 </rdf:RDF>
</x:xmpmeta>
"""


def test_lightroom_parse_maps_ops():
    from ansel_tpu.io.lightroom import is_lightroom_xmp, parse_lightroom_xmp

    assert is_lightroom_xmp(LR_XMP)
    imp = parse_lightroom_xmp(LR_XMP)
    ops = [h.op for h in imp.history]
    for expect in ("exposure", "clipping", "flip", "grain", "vignette",
                   "tonecurve", "colorzones", "splittoning"):
        assert expect in ops, ops
    exp = next(h for h in imp.history if h.op == "exposure")
    assert abs(exp.params["exposure"] - 0.85) < 1e-6
    assert abs(exp.params["black"] - 0.005) < 1e-6  # lr2dt_blacks(-50)
    assert imp.rating == 4
    assert imp.color_label == "Red"
    assert imp.tags == ["alps", "ski"]
    vg = next(h for h in imp.history if h.op == "vignette")
    assert vg.params["saturation"] == -0.3  # highlight priority


def test_lightroom_history_renders():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from ansel_tpu.io.lightroom import parse_lightroom_xmp
    from ansel_tpu.io.synthetic import synth_raw
    from ansel_tpu.pipeline.engine import compile_pipeline

    raw, meta, _ = synth_raw(h=96, w=160)
    imp = parse_lightroom_xmp(LR_XMP)
    pipe = compile_pipeline(meta, imp.history)
    out = np.asarray(pipe.output_array(raw))
    assert np.isfinite(out).all()
    assert out.shape[0] == 3
