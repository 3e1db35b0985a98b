#!/usr/bin/env python
"""Round-5d: decompose the gaussian_iir pass cost at 24MP x3."""
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

    H, W = 4000, 6144   # padded to a 512 multiple like the real pass
    rng = np.random.RandomState(0)
    img3 = jnp.asarray(rng.rand(3, H, W).astype(np.float32))

    K = 512
    nb = W // K
    T = np.tril(rng.rand(K, K).astype(np.float32) * 0.01)
    Tj = jnp.asarray(T)

    fb = img3.reshape(3, H, nb, K)

    f = jax.jit(lambda a: jnp.einsum("ik,...bk->...bi", Tj, a,
                                     preferred_element_type=jnp.float32))
    print(f"[einsum K=512 axis-1] {timeit(f, fb):.1f}ms", flush=True)

    f = jax.jit(lambda a: jnp.einsum("ik,...bk->...bi",
                                     Tj.astype(jnp.bfloat16),
                                     a.astype(jnp.bfloat16),
                                     preferred_element_type=jnp.float32))
    print(f"[einsum K=512 bf16] {timeit(f, fb):.1f}ms", flush=True)

    # matmul formulation: (3*H*nb, K) @ (K, K)
    f = jax.jit(lambda a: (a.reshape(-1, K) @ Tj.T).reshape(a.shape))
    print(f"[matmul K=512] {timeit(f, fb):.1f}ms", flush=True)

    K2 = 128
    nb2 = W // K2
    T2 = jnp.asarray(np.tril(rng.rand(K2, K2).astype(np.float32) * 0.01))
    fb2 = img3.reshape(3, H, nb2, K2)
    f = jax.jit(lambda a: jnp.einsum("ik,...bk->...bi", T2, a,
                                     preferred_element_type=jnp.float32))
    print(f"[einsum K=128 axis-1] {timeit(f, fb2):.1f}ms", flush=True)

    # scan alone (nb steps, 2-vector states)
    M = jnp.asarray(np.float32([[0.9, 0.1], [0.2, 0.7]]))
    d = jnp.asarray(rng.rand(nb, 2, 3, H, 2).astype(np.float32))

    def scan_only(dm):
        def step(s, x_):
            return jnp.einsum("ij,s...j->s...i", M, s) + x_, s
        s0 = jnp.zeros((2, 3, H, 2), jnp.float32)
        _, entries = jax.lax.scan(step, s0, dm)
        return entries

    f = jax.jit(scan_only)
    print(f"[scan nb={nb}] {timeit(f, d):.1f}ms", flush=True)

    # transpose cost
    f = jax.jit(lambda a: jnp.moveaxis(a, -2, -1) + 0.0)
    print(f"[moveaxis(-2,-1)] {timeit(f, img3):.1f}ms", flush=True)
    f = jax.jit(lambda a: jnp.flip(a, -1) + 0.0)
    print(f"[flip(-1)] {timeit(f, img3):.1f}ms", flush=True)

    # combine stage: ylocal + u*e0 + w*e1 reshape slice
    uj = jnp.asarray(rng.rand(K).astype(np.float32))
    wj = jnp.asarray(rng.rand(K).astype(np.float32))
    ent = jnp.asarray(rng.rand(3, H, nb, 2).astype(np.float32))

    def combine(yl, e):
        y = yl + uj * e[..., 0:1] + wj * e[..., 1:2]
        return y.reshape(3, H, nb * K)[..., :6016]

    f = jax.jit(combine)
    print(f"[combine] {timeit(f, fb, ent):.1f}ms", flush=True)


if __name__ == "__main__":
    main()
