#!/usr/bin/env python
"""Round-5b chip micros: IIR block-size sweep + axis isolation, diffuse
Pallas tile-geometry sweep, clipping-class warp.  One process, serialized.
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
    img1 = img3[0]

    from ansel_tpu.pixel import blur as blur_mod

    # ---- IIR block sweep ----
    for K in (128, 256, 512, 1024):
        blur_mod._IIR_BLOCK = K
        f = jax.jit(lambda v: blur_mod.gaussian_iir(v, 8.0))
        print(f"[iir K={K} 3ch] {timeit(f, img3):.1f}ms", flush=True)
    blur_mod._IIR_BLOCK = 512

    # ---- axis isolation: one _iir_pass along -1 vs -2 ----
    a0, a1, a2, a3, b1, b2, coefp, coefn = blur_mod._deriche_coeffs(8.0)

    def one_pass(v, axis):
        f_fwd = a0 * v
        yb = jnp.take(v, jnp.array([0]), axis=axis) * coefp
        return blur_mod._iir_pass(v, f_fwd, yb, yb, b1, b2,
                                  axis % v.ndim, reverse=False)

    for axis in (-1, -2):
        f = jax.jit(lambda v, ax=axis: one_pass(v, ax))
        print(f"[iir one-pass axis={axis} 3ch] {timeit(f, img3):.1f}ms",
              flush=True)

    # ---- small-plane gaussian (gaussian_blur_fast inner cost) ----
    small = img1[:500, :752]
    f = jax.jit(lambda v: blur_mod.gaussian_iir(v, 5.5))
    print(f"[iir small 500x752 1ch] {timeit(f, small):.2f}ms", flush=True)
    f = jax.jit(lambda v: blur_mod.gaussian_blur_fast(v, 44.0))
    print(f"[gauss_fast s=44 1ch] {timeit(f, img1):.1f}ms", flush=True)

    # ---- diffuse tile sweep (45MP, scales=4, 4 iterations) ----
    from ansel_tpu.kernels import diffuse_pallas as dp

    H45, W45 = 5504, 8256
    img45 = jnp.asarray(rng.rand(3, H45, W45).astype(np.float32))
    scales = 4
    c = {"variance_threshold": np.float32(0.0),
         "aniso": np.zeros(4, np.float32),
         "norm_reg": np.ones(scales, np.float32),
         "strength": np.full(scales, 0.2, np.float32),
         "ABCD": np.full(scales * 4, 0.05, np.float32)}
    modes = (0, 0, 0, 0)
    base_geom = dp._GEOM[scales]
    for geom in (base_geom, (128, 512, 48, 64), (256, 512, 48, 64),
                 (128, 1024, 48, 128)):
        dp._GEOM[scales] = geom

        def four_iter(v):
            out = v
            for _ in range(4):
                out = dp.diffuse_iteration_pallas(out, c, scales, modes)
            return out

        try:
            f = jax.jit(four_iter)
            print(f"[diffuse45 geom={geom}] {timeit(f, img45, n=4):.1f}ms",
                  flush=True)
        except Exception as e:
            print("[diffuse geom", geom, "error]", type(e).__name__,
                  str(e)[:300], flush=True)
    dp._GEOM[scales] = base_geom

    # ---- clipping-class warp: small rotation at 24MP x3 ----
    from ansel_tpu.kernels.warp_pallas import warp_model

    th = np.deg2rad(0.47)
    co, si = float(np.cos(th)), float(np.sin(th))
    cy, cx = H / 2.0, W / 2.0

    def coords(jj, ii):
        y = jj - cy
        x_ = ii - cx
        return (co * y - si * x_ + cy, si * y + co * x_ + cx)

    ry = abs(si) * W / 2 + 8
    rx = abs(si) * H / 2 + 8
    f = jax.jit(lambda v: warp_model(v, coords, ry, rx,
                                     out_shape=(H, W), src_offset=(0, 0)))
    print(f"[warp rot0.47 24MPx3 ry={ry:.0f}] {timeit(f, img3, n=4):.1f}ms",
          flush=True)


if __name__ == "__main__":
    main()
