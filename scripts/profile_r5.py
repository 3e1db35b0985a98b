#!/usr/bin/env python
"""Round-5 chip profile: config 6/3 per-op rows + targeted micro-benches
(bilateral grid phases, IIR gaussian, gaussian_blur_fast, local laplacian).

One process, everything serialized (CLAUDE.md chip discipline).  Timing is
pipelined dispatch: N runs back-to-back, ONE tiny readback sync.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_r5.py
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
    print("probe ok:", np.asarray(x[0, :2]), jax.devices(), flush=True)

    H, W = 4000, 6016
    rng = np.random.RandomState(0)
    img1 = jnp.asarray(rng.rand(H, W).astype(np.float32))
    img3 = jnp.asarray(rng.rand(3, H, W).astype(np.float32) * 0.8)

    # ---- micro: bilateral grid phases (bilateral op: ss=15, D=32, [0,2]) --
    from ansel_tpu.pixel import bilateralgrid as bg

    def phases(guide, values, ss, sr, lo, hi, tag):
        # full
        full = jax.jit(lambda g, v: bg.grid_filter(g, v, ss, sr, lo, hi))
        t_full = timeit(full, guide, values)

        # splat+blur only (returns the small grid)
        def splat_blur(g, v):
            Hh, Ww = g.shape
            C = v.shape[0]
            issl = max(int(round(ss)), 1)
            D = int(np.clip(round((hi - lo) / max(sr, 1e-6)) + 1, 4, 32))
            step = (hi - lo) / (D - 1)
            ph = (-Hh) % issl
            pw = (-Ww) % issl
            gp = jnp.pad(jnp.clip(g, lo, hi), ((0, ph), (0, pw)), mode="edge")
            vp = jnp.pad(v, ((0, 0), (0, ph), (0, pw)), mode="edge")
            Hp, Wp = Hh + ph, Ww + pw
            gh, gw = Hp // issl, Wp // issl
            n_cells, p_cell = gh * gw, issl * issl

            def cells(xx):
                return xx.reshape(gh, issl, gw, issl).transpose(0, 2, 1, 3) \
                        .reshape(n_cells, p_cell)

            z = (gp - lo) / step
            b0 = jnp.floor(z)
            f = z - b0
            b0c = cells(b0)
            fc = cells(f)
            kk = jnp.arange(D, dtype=jnp.float32)[None, None, :]
            Fm = (jnp.equal(b0c[..., None], kk) * (1.0 - fc[..., None])
                  + jnp.equal(b0c[..., None], kk - 1.0) * fc[..., None]
                  ).astype(jnp.bfloat16)
            vc = jnp.stack([cells(vp[c]) for c in range(C)], axis=1)
            nums = jnp.einsum("npk,ncp->nkc", Fm, vc.astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32)
            dens = Fm.astype(jnp.float32).sum(axis=1)
            nums = nums.reshape(gh, gw, D, C).transpose(2, 3, 0, 1) / p_cell
            dens = dens.reshape(gh, gw, D).transpose(2, 0, 1) / p_cell
            for ax in (-2, -1):
                nums = bg._blur_axis(nums, ax)
                dens = bg._blur_axis(dens, ax)
            nums = bg._blur_axis(nums, 0)
            dens = bg._blur_axis(dens, 0)
            return nums / jnp.maximum(dens[:, None], 1e-8)

        sb = jax.jit(splat_blur)
        t_sb = timeit(sb, guide, values)
        print(f"[grid {tag}] full={t_full:.1f}ms splat+blur={t_sb:.1f}ms "
              f"slice={t_full - t_sb:.1f}ms", flush=True)

    phases(img1, img1[None], 15.0, 2.0 / 31.0, 0.0, 2.0, "bilateral ss=15 D=32 C=1")
    phases(img1 * 100.0, img1[None] * 100.0, 50.0, 20.0, 0.0, 100.0,
           "bilat0 ss=50 D=6 C=1")

    # ---- micro: IIR gaussian + fast gaussian ------------------------------
    from ansel_tpu.pixel import blur as blur_mod

    f = jax.jit(lambda v: blur_mod.gaussian_iir(v, 8.0))
    print(f"[gauss_iir s=8 3ch 24MP] {timeit(f, img3):.1f}ms", flush=True)
    f = jax.jit(lambda v: blur_mod.gaussian_iir(v[0], 4.5))
    print(f"[gauss_iir s=4.5 1ch 24MP] {timeit(f, img3):.1f}ms", flush=True)
    f = jax.jit(lambda v: blur_mod.gaussian_blur_fast(v[0], 44.0))
    print(f"[gauss_fast s=44 1ch 24MP] {timeit(f, img3):.1f}ms", flush=True)
    f = jax.jit(lambda v: blur_mod.gaussian_blur_fast(v[0], 176.0))
    print(f"[gauss_fast s=176 1ch 24MP] {timeit(f, img3):.1f}ms", flush=True)

    # ---- micro: local laplacian (bilat mode 1) ----------------------------
    from ansel_tpu.pixel.locallaplacian import local_laplacian

    f = jax.jit(lambda v: local_laplacian(v[0], 0.5, 0.005, 0.005, 0.25))
    print(f"[locallap 24MP] {timeit(f, img3, n=4):.1f}ms", flush=True)
    H45, W45 = 5504, 8256
    img45 = jnp.asarray(rng.rand(H45, W45).astype(np.float32))
    f = jax.jit(lambda v: local_laplacian(v, 0.5, 1.0, 1.0, 0.3))
    print(f"[locallap 45MP] {timeit(f, img45, n=4):.1f}ms", flush=True)

    # ---- per-op profiles: config 6 then config 3 --------------------------
    from ansel_tpu.core import conf as conf_mod

    for cfg in (6, 3):
        print(f"== per-op profile config {cfg} ==", flush=True)
        conf_mod.set("pipe.max_stages_per_jit", 1)
        run_per_op(cfg)
        conf_mod.set("pipe.max_stages_per_jit", 12)
        print(f"== fused-segment profile config {cfg} ==", flush=True)
        run_per_op(cfg)


def run_per_op(cfg):
    from ansel_tpu import compile_pipeline, HistoryItem
    from ansel_tpu.core import conf as conf_mod
    from ansel_tpu.io.synthetic import synth_raw
    from ansel_tpu.io.xmp import parse_xmp
    from ansel_tpu.ops import base as ops_base

    if cfg == 6:
        H, W = 4000, 6016
        raw, meta, _ = synth_raw(h=H, w=W, kind="gradients")
        doc = parse_xmp(
            "/root/reference/tests/benchmark/darktable-bench-3.4.xmp")
        history, forms = doc.history, doc.masks
    else:
        from bench import CONFIGS
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

    x, carry = x0, ({}, None)
    for (a, b), f in zip(bounds, seg_fns):
        x, carry = f(x, coeffs[a:b], carry)
    sync(x)

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
    print(f"[seg TOTAL cfg{cfg}] {total:8.2f} ms  ({len(bounds)} segments)",
          flush=True)


if __name__ == "__main__":
    main()
