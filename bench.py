#!/usr/bin/env python
"""Benchmark: 24MP Bayer raw -> sRGB full default pipeline, per-chip.

Mirrors the reference's shipped benchmark semantics
(`/root/reference/tests/benchmark/ansel-bench`: throughput of the headless
raw->sRGB pixelpipe; metric normalized to exports/sec).  Baseline
(BASELINE.md): reference CPU path = 720 exports/hour = 0.2 images/sec for a
20MP raw on a 32-core TR-3970X.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np

# BASELINE.json configs (1 = headline, always reported by the bare run)
CONFIGS = {
    1: dict(h=4000, w=6016, history=[
        ("exposure", {"exposure": 0.5}),
        ("channelmixerrgb", {}),
        ("filmicrgb", {}),
    ], label="24MP default pipe"),
    2: dict(h=4000, w=6016, history=[
        ("denoiseprofile", {"a": (4e-4,) * 3, "b": (1e-5,) * 3,
                            "strength": 2.0}),
        ("exposure", {"exposure": 0.5}),
        ("filmicrgb", {}),
    ], label="24MP high-ISO denoise stack"),
    3: dict(h=5504, w=8256, history=[
        ("diffuse", {"iterations": 4, "first": 0.2, "second": 0.2,
                     "third": 0.2, "fourth": 0.2, "radius": 8}),
        ("toneequal", {"shadows": 0.5}),
        ("bilat", {"sigma_r": 100.0, "sigma_s": 100.0, "detail": 0.3}),
        ("exposure", {"exposure": 0.5}),
        ("filmicrgb", {}),
    ], label="45MP heavy-iterative stack"),
}


def main():
    import jax

    from ansel_tpu import HistoryItem, compile_pipeline
    from ansel_tpu.io.synthetic import synth_raw
    from ansel_tpu.ops import base as ops_base

    cfg_id = 1
    for a in sys.argv[1:]:
        if a.startswith("--config="):
            cfg_id = int(a.split("=")[1])
    cfg = CONFIGS[cfg_id]
    H, W = cfg["h"], cfg["w"]
    raw, meta, _ = synth_raw(h=H, w=W, kind="gradients")

    history = [HistoryItem(op, prm) for op, prm in cfg["history"]]
    pipe = compile_pipeline(meta, history, scale=1.0)

    spec = pipe.pipe.spec_in
    raw_padded = ops_base.pad_to(raw, spec)

    # warmup / compile (+ hard sync: a small readback, because
    # block_until_ready over the axon relay does not actually block)
    dev_raw = jax.device_put(raw_padded)
    coeffs = jax.device_put(pipe._coeffs)
    fn = pipe._fn
    y = fn(dev_raw, coeffs)
    np.asarray(y[0, 0, :8])

    # Pipeline throughput, device-resident input (the reference benchmark
    # times the pixelpipe, not disk/codec IO — ansel-bench:250-320).  The
    # sandbox's host<->device tunnel runs at ~1 MB/s, so bulk transfers
    # would measure the tunnel, not the framework; a 32-byte readback
    # forces synchronization honestly.
    n = 12
    t0 = time.perf_counter()
    for i in range(n):
        y = fn(dev_raw, coeffs)
    np.asarray(y[0, 0, :8])
    t_compute = (time.perf_counter() - t0) / n

    mp = (H * W) / 1e6
    images_per_sec = 1.0 / t_compute
    result = {
        "metric": "24MP raw->sRGB full-pipe exports/sec/chip"
        if cfg_id == 1 else f"config {cfg_id}: {cfg['label']} exports/sec",
        "value": round(images_per_sec, 3),
        "unit": "images/sec",
        "vs_baseline": round(images_per_sec / 0.2, 2),
        "detail": {
            "pixelpipe_mp_per_sec": round(mp / t_compute, 1),
            "image_mp": round(mp, 1),
            "backend": jax.default_backend(),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
