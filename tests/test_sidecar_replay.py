"""End-to-end replay of the reference's shipped benchmark sidecars.

The reference pins its benchmark pipelines in versioned XMPs
(`/root/reference/tests/benchmark/darktable-bench-{3.4,3.6,3.8}.xmp`,
README.txt:1-15) written by real darktable releases — decoding them
exercises every legacy params version (`legacy_params`, iop_api.h:206-207)
a real-world sidecar can carry.
"""

import os

import numpy as np
import pytest

import ansel_tpu.ops  # noqa: F401 — register all ops
from ansel_tpu.core.params import decode_blob
from ansel_tpu.io.synthetic import synth_raw
from ansel_tpu.io.xmp import parse_xmp
from ansel_tpu.pipeline.engine import CompiledPipe, Pipeline

BENCH_DIR = "/root/reference/tests/benchmark"
SIDECARS = ["darktable-bench-3.4.xmp", "darktable-bench-3.6.xmp",
            "darktable-bench-3.8.xmp"]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(BENCH_DIR), reason="reference sidecars not present")


@pytest.mark.parametrize("name", SIDECARS)
def test_decode_every_history_item(name):
    doc = parse_xmp(os.path.join(BENCH_DIR, name))
    assert len(doc.history) >= 60
    for item in doc.history:
        p = decode_blob(item.op, item.version,
                        bytes(item.params)
                        if isinstance(item.params, (bytes, bytearray))
                        else item.params.codec.encode(item.params))
        assert p is not None, (item.op, item.version)


@pytest.mark.parametrize("name", SIDECARS)
def test_plan_without_skips(name):
    doc = parse_xmp(os.path.join(BENCH_DIR, name))
    raw, meta, _ = synth_raw(h=128, w=192, kind="gradients")
    pipe = Pipeline(meta, doc.history, forms=doc.masks)
    assert pipe.unsupported == []
    names = [s.name for s in pipe.stages]
    # every enabled history item must be planned in
    for item in doc.history:
        if item.enabled:
            assert item.op in names, \
                f"{item.op} missing from planned {name} stack"


def test_render_bench_34_finite():
    doc = parse_xmp(os.path.join(BENCH_DIR, SIDECARS[0]))
    raw, meta, _ = synth_raw(h=128, w=192, kind="gradients")
    cp = CompiledPipe(Pipeline(meta, doc.history, forms=doc.masks))
    y = cp.output_array(raw)
    assert y.ndim == 3 and y.shape[0] == 3
    assert np.isfinite(y).all()
    assert y.max() > 0.01


# Pixel-statistics golden for the 3.4 sidecar render (128x192 "gradients"
# synthetic raw, hermetic CPU path).  Guards against silently-wrong renders
# (e.g. a module decoding but applying identity): the per-channel
# distribution of the full 60-module output is pinned, not just finiteness.
GOLDEN_34 = {
    "r": dict(mean=0.5164, p05=0.1411, p50=0.3439, p95=1.0),
    "g": dict(mean=0.4063, p05=0.0660, p50=0.1552, p95=1.0),
    "b": dict(mean=0.4179, p05=0.0775, p50=0.1807, p95=1.0),
}


def test_render_bench_34_pixel_statistics_golden():
    doc = parse_xmp(os.path.join(BENCH_DIR, SIDECARS[0]))
    raw, meta, _ = synth_raw(h=128, w=192, kind="gradients")
    cp = CompiledPipe(Pipeline(meta, doc.history, forms=doc.masks))
    y = np.asarray(cp.output_array(raw))
    for c, name in enumerate("rgb"):
        ch, want = y[c], GOLDEN_34[name]
        got = dict(mean=float(ch.mean()),
                   p05=float(np.percentile(ch, 5)),
                   p50=float(np.percentile(ch, 50)),
                   p95=float(np.percentile(ch, 95)))
        for k in want:
            assert abs(got[k] - want[k]) < 0.02, (name, k, got[k], want[k])
