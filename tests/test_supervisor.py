"""Supervisor lifecycle registry (reference src/develop/supervisor.{c,h},
doc/supervisor.md) — TPU translation supervises the plan/cache layer."""

import numpy as np

from ansel_tpu.core import supervisor as sup


def setup_function(_fn):
    sup._reset_for_tests(on=True)


def teardown_function(_fn):
    sup._reset_for_tests(on=False)


def test_crud_and_resurrection_flagging():
    sup.event("pipe", "create", "abc")
    sup.event("pipe", "read", "abc")
    sup.event("pipe", "dead", "abc")
    sup.event("pipe", "read", "abc")      # use-after-free
    sup.event("pipe", "create", "abc")    # resurrection
    a = sup.anomalies()
    assert len(a) == 2
    assert all(r.get("resurrected") for r in a)


def test_duplicate_create_and_unknown_read():
    sup.event("stage", "create", 1)
    sup.event("stage", "create", 1)       # duplicate
    sup.event("stage", "read", 2)         # never created
    kinds = [("duplicate" in r, "unknown" in r) for r in sup.anomalies()]
    assert (True, False) in kinds and (False, True) in kinds


def test_engine_emits_pipe_and_raster_events():
    import jax

    from ansel_tpu.io.synthetic import synth_raw
    from ansel_tpu.ops import base as ops_base
    from ansel_tpu.pipeline import blend as bm
    from ansel_tpu.pipeline.engine import (_COMPILE_CACHE, CompiledPipe,
                                           HistoryItem, Pipeline)

    raw, meta, _ = synth_raw(h=64, w=128)
    hist = [
        HistoryItem("exposure", {"exposure": 0.5},
                    blend_params=bm.BlendParams(mask_mode=bm.MASK_ENABLED,
                                                opacity=60.0)),
        HistoryItem("vibrance", {},
                    blend_params=bm.BlendParams(
                        mask_mode=bm.MASK_ENABLED | bm.MASK_RASTER,
                        raster_mask_source="exposure")),
        HistoryItem("filmicrgb", {}),
    ]
    _COMPILE_CACHE.clear()
    cp = CompiledPipe(Pipeline(meta, hist))
    y = cp(raw)
    np.asarray(y)
    kinds = {(r["kind"], r["op"]) for r in sup.ring()}
    assert ("pipe", "create") in kinds
    assert ("raster_mask", "create") in kinds
    assert ("raster_mask", "read") in kinds
    # same signature again -> cache read, no anomaly
    CompiledPipe(Pipeline(meta, hist))
    kinds = {(r["kind"], r["op"]) for r in sup.ring()}
    assert ("pipe", "read") in kinds
    assert sup.anomalies() == []


def test_mipmap_lifecycle_events(tmp_path):
    from ansel_tpu.library.mipmap import MipmapCache

    mc = MipmapCache(cache_dir=str(tmp_path))
    img = tmp_path / "x.txt"
    img.write_text("z")

    def render(path, xmp, scale):
        return np.zeros((3, 8, 8), np.float32)

    mc.get(str(img), 2, render=render)
    mc.get(str(img), 2, render=render)    # mem hit -> read
    mc.invalidate(str(img))               # -> dead
    kinds = [(r["kind"], r["op"]) for r in sup.ring()
             if r["kind"] == "mipmap"]
    assert ("mipmap", "create") in kinds
    assert ("mipmap", "read") in kinds
    assert ("mipmap", "dead") in kinds
    assert sup.anomalies() == []
