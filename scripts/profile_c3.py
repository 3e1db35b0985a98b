#!/usr/bin/env python
"""Config-3 fused-segment ground truth: full pipe vs pipe-without-stage
(the PERF.md with/without methodology — per-op rows inflate)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/ansel_tpu_jitcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def sync(arr):
    np.asarray(arr[(slice(0, 1),) * (arr.ndim - 1) + (slice(0, 8),)])


def timeit(fn, *args, n=6, warm=1):
    for _ in range(warm):
        y = fn(*args)
    sync(y)
    best = []
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(n):
            y = fn(*args)
        sync(y)
        best.append((time.perf_counter() - t0) / n * 1e3)
    return min(best)


def main():
    print("== probe ==", flush=True)
    x = jax.device_put(jnp.ones((8, 128), jnp.float32))
    print("probe ok:", np.asarray(x[0, :2]), flush=True)

    from ansel_tpu import HistoryItem, compile_pipeline
    from ansel_tpu.io.synthetic import synth_raw

    H, W = 5504, 8256
    raw, meta, _ = synth_raw(h=H, w=W)
    raw = jax.device_put(raw)
    sync(raw)

    FULL = [
        ("diffuse", {"iterations": 4, "first": 0.2, "second": 0.2,
                     "third": 0.2, "fourth": 0.2, "radius": 8}),
        ("toneequal", {"shadows": 0.5}),
        ("bilat", {"sigma_r": 100.0, "sigma_s": 100.0, "detail": 0.3}),
        ("exposure", {"exposure": 0.5}),
        ("filmicrgb", {}),
    ]

    from ansel_tpu.ops import base as ops_base

    def run(hist_spec, tag):
        hist = [HistoryItem(op, params=p) for op, p in hist_spec]
        pipe = compile_pipeline(meta, hist)
        raw_padded = ops_base.pad_to(np.asarray(raw, np.float32),
                                     pipe.pipe.spec_in)
        dev_raw = jax.device_put(raw_padded)
        coeffs = jax.device_put(pipe._coeffs)
        f = pipe._fn
        t = timeit(f, dev_raw, coeffs)
        print(f"[{tag}] {t:.1f}ms", flush=True)
        return t

    t_full = run(FULL, "full")
    for k in range(len(FULL)):
        sub = FULL[:k] + FULL[k + 1:]
        t = run(sub, f"minus {FULL[k][0]}")
        print(f"  -> {FULL[k][0]} in-pipe cost ~ {t_full - t:.1f}ms",
              flush=True)
    run([], "base (decode+demosaic+color only)")
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
