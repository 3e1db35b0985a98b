#!/usr/bin/env python
"""Per-stage TPU profile of bench config 6 (the full 3.4-sidecar replay).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile6.py
Prints one [perf] line per stage (upper bounds: fusion traded away).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/ansel_tpu_jitcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from ansel_tpu import compile_pipeline
from ansel_tpu.io.synthetic import synth_raw
from ansel_tpu.io.xmp import parse_xmp
from ansel_tpu.pipeline.profiling import run_stages

H, W = 4000, 6016
raw, meta, _ = synth_raw(h=H, w=W, kind="gradients")
doc = parse_xmp("/root/reference/tests/benchmark/darktable-bench-3.4.xmp")
pipe = compile_pipeline(meta, doc.history, scale=1.0, forms=doc.masks)
reports = run_stages(pipe.pipe, raw, repeats=2)
reports.sort(key=lambda r: -r.ms)
print("--- top 15 ---")
for r in reports[:15]:
    print(r.line())
