"""SpatialPipeline: single-image row sharding over an 8-device mesh with
ppermute halo exchange == the single-device pipe within the display
quantum (round-4 VERDICT task 2; SURVEY §5.7 tiling.c -> shard_map+ICI).

The shifted-window scheme is exact by construction (true edges keep true
op padding; interior cut edges are cropped beyond the backward-ROI
halo), so the tolerance only absorbs XLA scheduling differences.
"""

import numpy as np
import pytest

from ansel_tpu import HistoryItem
from ansel_tpu.core.types import RawMeta
from ansel_tpu.io.synthetic import synth_raw
from ansel_tpu.parallel.batch import make_mesh
from ansel_tpu.parallel.spatial import SpatialPipeline, required_halo
from ansel_tpu.pipeline import engine

DISPLAY_QUANTUM = 1.0 / 255.0


def _single(meta, hist, raw):
    pipe = engine.CompiledPipe(engine.Pipeline(meta, hist))
    return np.asarray(pipe.output_array(raw))


def _sharded(meta, hist, raw, spatial=8):
    mesh = make_mesh(spatial=spatial)
    # the mesh axes are (dp, sp); shard over sp with dp=1
    sp = SpatialPipeline(meta, hist, mesh, axis="sp")
    y = np.asarray(sp(raw))
    return y[..., :meta.height, :meta.width]


def _compare(hist, h=384, w=256, spatial=8, **synth_kw):
    raw, meta, _ = synth_raw(h=h, w=w, **synth_kw)
    raw = np.asarray(raw)
    ref = _single(meta, hist, raw)
    got = _sharded(meta, hist, raw, spatial=spatial)
    d = np.abs(ref - got)
    assert d.max() < DISPLAY_QUANTUM, (d.max(), d.mean())


def test_default_pipe_rowsharded():
    _compare([HistoryItem("exposure", {"exposure": 0.5}),
              HistoryItem("filmicrgb", {})])


def test_denoise_stack_rowsharded():
    """Config-2-class pipe: highlight reconstruction + profiled wavelet
    denoise + NLM — the VPU-bound stencil stack the VERDICT names."""
    # compound halo ~160 rows at this size (wavelet scales grow with
    # the frame): 2 shards of 352 rows exercise both boundary windows;
    # interior-window offsets are covered by the default-pipe test
    _compare([
        HistoryItem("highlights", {"mode": 0, "clip": 1.0}),
        HistoryItem("denoiseprofile",
                    {"a": (4e-4,) * 3, "b": (1e-5,) * 3, "strength": 2.0}),
        HistoryItem("nlmeans", {"strength": 50.0, "luma": 50.0,
                                "chroma": 50.0}),
        HistoryItem("exposure", {"exposure": 0.5}),
        HistoryItem("filmicrgb", {}),
    ], h=704, spatial=2)


def test_eaw_atrous_rowsharded():
    """à-trous wavelet (rawdenoise) — dilated stencil chain, the widest
    finite halo in the denoise family."""
    _compare([HistoryItem("rawdenoise", {"threshold": 0.02}),
              HistoryItem("exposure", {"exposure": 0.5}),
              HistoryItem("filmicrgb", {})], h=768, spatial=4)


def test_halo_is_cfa_aligned_and_finite():
    raw, meta, _ = synth_raw(h=384, w=256)
    hist = [HistoryItem("denoiseprofile",
                        {"a": (4e-4,) * 3, "b": (1e-5,) * 3}),
            HistoryItem("exposure", {"exposure": 0.5})]
    h = required_halo(meta, hist, 48)
    assert 0 < h < 384


def test_global_op_rejected():
    """A stage that demands the full frame must raise, not silently
    produce wrong seams."""
    raw, meta, _ = synth_raw(h=384, w=256)
    mesh = make_mesh(spatial=8)
    hist = [HistoryItem("exposure", {"exposure": 0.5}),
            HistoryItem("bilat", {"sigma_r": 100.0, "sigma_s": 100.0,
                                  "detail": 0.3}),
            HistoryItem("filmicrgb", {})]
    with pytest.raises(ValueError):
        SpatialPipeline(meta, hist, mesh, axis="sp")


def test_indivisible_height_rejected():
    raw, meta, _ = synth_raw(h=380, w=256)  # 380/8 = 47.5
    mesh = make_mesh(spatial=8)
    with pytest.raises(ValueError):
        SpatialPipeline(meta, [HistoryItem("exposure", {})], mesh)
