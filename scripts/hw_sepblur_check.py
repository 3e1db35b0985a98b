#!/usr/bin/env python
"""Hardware check + timing of the row-strip sepblur kernel."""
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

    from ansel_tpu.pixel import shifts

    BSPLINE = [1 / 16, 4 / 16, 6 / 16, 4 / 16, 1 / 16]
    HAT = [0.25, 0.5, 0.25]
    rng = np.random.RandomState(0)

    for (h, w, tag) in ((5504, 8256, "45MP"), (4000, 6016, "24MP")):
        L = jnp.asarray(rng.rand(h, w).astype(np.float32))
        f = jax.jit(lambda a: shifts.sep_filter(a, BSPLINE))
        t = timeit(f, L)
        print(f"[blur5 {tag} 1ch strip] {t:.2f}ms", flush=True)

        # XLA chain for parity
        shifts._DISABLE_PALLAS = True
        fx = jax.jit(lambda a: shifts.sep_filter(a, BSPLINE))
        y_ref = np.asarray(fx(L))
        tx = timeit(fx, L)
        shifts._DISABLE_PALLAS = False
        y_got = np.asarray(f(L))
        print(f"[blur5 {tag} XLA] {tx:.2f}ms  maxdiff "
              f"{float(np.abs(y_ref - y_got).max()):.2e}", flush=True)

    L3 = jnp.asarray(rng.rand(3, 4000, 6016).astype(np.float32))
    f = jax.jit(lambda a: shifts.sep_filter(a, BSPLINE))
    print(f"[blur5 24MPx3 strip] {timeit(f, L3):.2f}ms", flush=True)

    for d in (4, 16, 64):
        L = jnp.asarray(rng.rand(4000, 6016).astype(np.float32))
        f = jax.jit(lambda a, dd=d: shifts.sep_filter(a, HAT, dd))
        t = timeit(f, L)
        shifts._DISABLE_PALLAS = True
        fx = jax.jit(lambda a, dd=d: shifts.sep_filter(a, HAT, dd))
        y_ref = np.asarray(fx(L))
        shifts._DISABLE_PALLAS = False
        md = float(np.abs(y_ref - np.asarray(f(L))).max())
        print(f"[hat d={d} 24MP strip] {t:.2f}ms maxdiff {md:.2e}",
              flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
