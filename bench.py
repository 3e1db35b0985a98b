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


def main():
    import jax

    from ansel_tpu import HistoryItem, compile_pipeline
    from ansel_tpu.io.synthetic import synth_raw
    from ansel_tpu.ops import base as ops_base

    H, W = 4000, 6016  # ~24MP, lane-aligned width
    raw, meta, _ = synth_raw(h=H, w=W, kind="gradients")

    history = [
        HistoryItem("exposure", {"exposure": 0.5}),
        HistoryItem("filmicrgb", {}),
    ]
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
        "metric": "24MP raw->sRGB full-pipe exports/sec/chip",
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
