#!/usr/bin/env python
"""Round-5c chip micros: fused-IIR check, diffuse new geometries
(scales 3/4/5 compile + time), clipping stage dissection."""
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
    t = arr[(slice(0, 1),) * (arr.ndim - 1) + (slice(0, 8),)]
    np.asarray(t)


def timeit(fn, *args, n=8, warm=1):
    for _ in range(warm):
        y = fn(*args)
    sync(y)
    t0 = time.perf_counter()
    for _ in range(n):
        y = fn(*args)
    sync(y)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    print("== probe ==", flush=True)
    x = jax.device_put(jnp.ones((8, 128), jnp.float32))
    print("probe ok:", np.asarray(x[0, :2]), flush=True)

    H, W = 4000, 6016
    rng = np.random.RandomState(0)
    img3 = jnp.asarray(rng.rand(3, H, W).astype(np.float32) * 0.8)

    from ansel_tpu.pixel import blur as blur_mod

    f = jax.jit(lambda v: blur_mod.gaussian_iir(v, 8.0))
    print(f"[iir-dual s=8 3ch] {timeit(f, img3):.1f}ms", flush=True)
    f = jax.jit(lambda v: blur_mod.gaussian_iir(v[0], 4.5))
    print(f"[iir-dual s=4.5 1ch] {timeit(f, img3):.1f}ms", flush=True)
    f = jax.jit(lambda v: blur_mod.gaussian_blur_fast(v[0], 44.0))
    print(f"[gauss_fast s=44 1ch] {timeit(f, img3):.1f}ms", flush=True)

    # ---- diffuse new geometries ----
    from ansel_tpu.kernels import diffuse_pallas as dp

    H45, W45 = 5504, 8256
    img45 = jnp.asarray(rng.rand(3, H45, W45).astype(np.float32))
    for scales in (3, 4, 5):
        c = {"variance_threshold": np.float32(0.0),
             "aniso": np.zeros(4, np.float32),
             "norm_reg": np.ones(scales, np.float32),
             "strength": np.full(scales, 0.2, np.float32),
             "ABCD": np.full(scales * 4, 0.05, np.float32)}
        modes = (0, 0, 0, 0)

        def four_iter(v, s=scales, cc=c):
            out = v
            for _ in range(4):
                out = dp.diffuse_iteration_pallas(out, cc, s, modes)
            return out

        try:
            f = jax.jit(four_iter)
            print(f"[diffuse45 scales={scales} geom={dp._GEOM[scales]}] "
                  f"{timeit(f, img45, n=4):.1f}ms", flush=True)
        except Exception as e:
            print(f"[diffuse scales={scales} ERROR]", type(e).__name__,
                  str(e)[:300], flush=True)

    # ---- clipping stage dissection: the exact sidecar stage ----
    from ansel_tpu import compile_pipeline
    from ansel_tpu.io.synthetic import synth_raw
    from ansel_tpu.io.xmp import parse_xmp
    from ansel_tpu.ops import base as ops_base

    raw, meta, _ = synth_raw(h=H, w=W, kind="gradients")
    doc = parse_xmp("/root/reference/tests/benchmark/darktable-bench-3.4.xmp")
    # keep only history up to and including clipping
    hist = doc.history
    names = [h.op for h in hist]
    idx = names.index("clipping")
    pipe_to = compile_pipeline(meta, hist[:idx], scale=1.0,
                               forms=doc.masks).pipe
    pipe_incl = compile_pipeline(meta, hist[:idx + 1], scale=1.0,
                                 forms=doc.masks).pipe

    for tag, pipe in (("to-clip", pipe_to), ("incl-clip", pipe_incl)):
        fn = jax.jit(pipe.trace_fn(0, len(pipe.stages), segmented=True))
        coeffs = jax.device_put(pipe.coeffs())
        x0 = jnp.asarray(ops_base.pad_to(np.asarray(raw, np.float32),
                                         pipe.spec_in))
        g = lambda a, b, fn=fn: fn(a, b, ({}, None))[0]
        print(f"[pipe {tag} n={len(pipe.stages)}] "
              f"{timeit(g, x0, coeffs, n=4):.1f}ms", flush=True)
        st = pipe.stages[-1]
        print("   last stage:", st.name,
              "spec_out", (st.plan.spec_out.height, st.plan.spec_out.width,
                           st.plan.spec_out.pad_h, st.plan.spec_out.pad_w),
              "static", str(st.plan.static)[:200], flush=True)


if __name__ == "__main__":
    main()
