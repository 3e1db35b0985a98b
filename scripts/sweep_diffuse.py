#!/usr/bin/env python
"""Diffuse tile-geometry sweep WITH cross-step double buffering."""
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

    from ansel_tpu.kernels import diffuse_pallas as dp

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(3, 5504, 8256).astype(np.float32) * 0.5)
    sync(img)
    c = dict(variance_threshold=np.float32(0.02),
             aniso=np.zeros(4, np.float32) + 1.0,
             norm_reg=np.ones(8, np.float32),
             strength=np.ones(8, np.float32) * 0.1,
             ABCD=np.ones(32, np.float32) * 0.05)
    modes = (1, 1, 1, 1)

    ref = None
    for geom in ((256, 512, 48, 64), (256, 1024, 48, 128),
                 (384, 512, 48, 64), (512, 512, 48, 64),
                 (256, 768, 48, 128)):
        dp._GEOM[4] = geom
        f = jax.jit(lambda a: dp.diffuse_iteration_pallas(a, c, 4, modes))
        try:
            t = timeit(f, img)
            y = np.asarray(f(img)[:, 100:108, 100:108])
            if ref is None:
                ref = y
            md = float(np.abs(y - ref).max())
            print(f"[geom {geom}] {t:.1f}ms  interior-diff {md:.1e}",
                  flush=True)
        except Exception as e:
            print(f"[geom {geom}] FAILED: {str(e)[:160]}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
