#!/usr/bin/env python
"""Round-5e: decompose the 45MP local-laplacian (bilat) + toneequal cost.

Pipelined dispatch timing, one sync (CLAUDE.md relay discipline).
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


def sync(arr):
    if isinstance(arr, (tuple, list)):
        arr = arr[0]
    np.asarray(arr[(slice(0, 1),) * (arr.ndim - 1) + (slice(0, 8),)])


def timeit(fn, *args, n=6, warm=1):
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

    H, W = 5504, 8256
    rng = np.random.RandomState(0)
    L = jnp.asarray(rng.rand(H, W).astype(np.float32))

    from ansel_tpu.pixel import locallaplacian as ll

    f = jax.jit(lambda a: ll.local_laplacian(a, 0.5, 1.0, 1.0, 0.3))
    print(f"[LL full 45MP] {timeit(f, L):.1f}ms", flush=True)

    Lh = L[: H // 2, : W // 2]
    f = jax.jit(lambda a: ll.local_laplacian(a, 0.5, 1.0, 1.0, 0.3))
    print(f"[LL half-res (11MP)] {timeit(f, Lh):.1f}ms", flush=True)

    # curve x6 alone
    def curves(a):
        return sum(ll.curve(a, (k + 0.5) / 6.0, 0.5, 1.0, 1.0, 0.3)
                   for k in range(6))
    print(f"[curve x6] {timeit(jax.jit(curves), L):.1f}ms", flush=True)

    # one reduce / one expand at level 0
    print(f"[reduce 45MP] {timeit(jax.jit(ll._reduce), L):.1f}ms",
          flush=True)
    small = ll._reduce(L)
    f = jax.jit(lambda a: ll._expand(a, (H, W)))
    print(f"[expand ->45MP] {timeit(f, small):.1f}ms", flush=True)

    # blur5 alone
    print(f"[blur5 45MP] {timeit(jax.jit(ll._blur5), L):.1f}ms",
          flush=True)

    # toneequal op via pipeline at 45MP x3
    img3 = jnp.asarray(rng.rand(3, H, W).astype(np.float32) * 0.8)
    from ansel_tpu.ops import toneequal as te_mod  # noqa: F401
    from ansel_tpu.ops.base import get_op
    from ansel_tpu.core.types import ImageSpec, Colorspace

    op = get_op("toneequal")
    params = op.params_cls(shadows=0.5)

    class _Ctx:
        scale = 1.0
        full_h, full_w = H, W
        roi = None

    # go through the real engine instead: single-op pipe
    from ansel_tpu import HistoryItem, compile_pipeline
    from ansel_tpu.io.synthetic import synth_meta

    try:
        meta = synth_meta(h=H, w=W)
    except Exception:
        from ansel_tpu.io.synthetic import synth_raw
        _, meta, _ = synth_raw(h=64, w=96)
        meta = None
    print("toneequal: timing via bench pipe segments is in profile_r5.py; "
          "skipping here", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
