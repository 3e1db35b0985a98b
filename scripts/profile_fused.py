#!/usr/bin/env python
"""Fused-path per-SEGMENT profile of a bench config (default: config 6).

The production pipe compiles as N chained XLA programs (segmented jit,
engine.CompiledPipe); stage-split profiling (scripts/profile6.py) trades
that fusion away and overstates per-stage cost by one HBM round-trip +
dispatch each.  This script times each fused SEGMENT as compiled, which
is what bench.py actually pays.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_fused.py [cfg]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/ansel_tpu_jitcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from ansel_tpu import compile_pipeline
from ansel_tpu.core import conf as conf_mod
from ansel_tpu.io.synthetic import synth_raw
from ansel_tpu.io.xmp import parse_xmp
from ansel_tpu.ops import base as ops_base


def main():
    cfg = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    if cfg == 6:
        H, W = 4000, 6016
        raw, meta, _ = synth_raw(h=H, w=W, kind="gradients")
        doc = parse_xmp(
            "/root/reference/tests/benchmark/darktable-bench-3.4.xmp")
        history, forms = doc.history, doc.masks
    else:
        from bench import CONFIGS
        from ansel_tpu import HistoryItem
        c = CONFIGS[cfg]
        raw, meta, _ = synth_raw(h=c["h"], w=c["w"], kind="gradients")
        history = [HistoryItem(op, p) for op, p in c["history"]]
        forms = None

    pipe = compile_pipeline(meta, history, scale=1.0, forms=forms).pipe

    max_per = conf_mod.get_int("pipe.max_stages_per_jit", 12)
    n = len(pipe.stages)
    weights = [getattr(s.op, "compile_weight", 1) for s in pipe.stages]
    if 0 < max_per < sum(weights):
        bounds = []
        a, acc = 0, 0
        for i, wt in enumerate(weights):
            if acc and acc + wt > max_per:
                bounds.append((a, i))
                a, acc = i, 0
            acc += wt
        bounds.append((a, n))
    else:
        bounds = [(0, n)]

    seg_fns = [jax.jit(pipe.trace_fn(a, b, segmented=True))
               for a, b in bounds]
    coeffs = jax.device_put(pipe.coeffs())
    x0 = jnp.asarray(ops_base.pad_to(np.asarray(raw, np.float32),
                                     pipe.spec_in))

    def sync(arr):
        t = arr[(slice(0, 1),) * (arr.ndim - 1) + (slice(0, 8),)]
        np.asarray(t)

    # warm-up pass (compile everything once)
    x, carry = x0, ({}, None)
    for (a, b), f in zip(bounds, seg_fns):
        x, carry = f(x, coeffs[a:b], carry)
    sync(x)

    # Per-segment, in-stream (inputs NOT retained — retaining all
    # intermediates OOMs HBM with one-op segments): N dispatches
    # back-to-back, ONE sync.  Relay dispatch latency pipelines under
    # device compute exactly as in bench.py's loop.
    N = int(os.environ.get("PROF_N", "6"))
    rows = []
    x, carry = x0, ({}, None)
    for (a, b), f in zip(bounds, seg_fns):
        t0 = time.perf_counter()
        for _ in range(N):
            y, cy = f(x, coeffs[a:b], carry)
        sync(y)
        ms = (time.perf_counter() - t0) / N * 1e3
        names = [s.name for s in pipe.stages[a:b]]
        rows.append((ms, a, b, names))
        print(f"[seg {a:2d}:{b:2d}] {ms:8.2f} ms  {names}", flush=True)
        x, carry = y, cy

    total = sum(r[0] for r in rows)
    print(f"[seg TOTAL] {total:8.2f} ms  ({len(bounds)} segments)")
    # end-to-end fused, as bench pays it (3 chained runs, one sync)
    t0 = time.perf_counter()
    for _ in range(3):
        x, carry = x0, ({}, None)
        for (a, b), f in zip(bounds, seg_fns):
            x, carry = f(x, coeffs[a:b], carry)
    sync(x)
    print(f"[e2e fused] {(time.perf_counter() - t0) / 3 * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
