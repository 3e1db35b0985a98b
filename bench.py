#!/usr/bin/env python
"""Benchmark: 24MP Bayer raw -> sRGB full default pipeline, per-chip.

Mirrors the reference's shipped benchmark semantics
(`/root/reference/tests/benchmark/ansel-bench`: throughput of the headless
raw->sRGB pixelpipe; metric normalized to exports/sec).  Baseline
(BASELINE.md): reference CPU path = 720 exports/hour = 0.2 images/sec for a
20MP raw on a 32-core TR-3970X.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

# BASELINE.json configs (1 = headline, always reported by the bare run)
CONFIGS = {
    1: dict(h=4000, w=6016, history=[
        ("exposure", {"exposure": 0.5}),
        ("channelmixerrgb", {}),
        ("filmicrgb", {}),
    ], label="24MP default pipe"),
    # BASELINE config 2: "profiled denoise (à-trous wavelet + non-local
    # means) + highlight reconstruction" — wavelet pass + NLM pass +
    # guided-laplacian highlight reconstruction (mode 3)
    2: dict(h=4000, w=6016, history=[
        ("highlights", {"mode": 3, "clip": 1.0}),
        ("denoiseprofile", {"a": (4e-4,) * 3, "b": (1e-5,) * 3,
                            "strength": 2.0}),
        ("denoiseprofile", {"a": (4e-4,) * 3, "b": (1e-5,) * 3,
                            "strength": 1.0, "mode": 0}),  # NLM pass
        ("exposure", {"exposure": 0.5}),
        ("filmicrgb", {}),
    ], label="24MP high-ISO denoise stack (wavelets+NLM+highlights)"),
    3: dict(h=5504, w=8256, history=[
        ("diffuse", {"iterations": 4, "first": 0.2, "second": 0.2,
                     "third": 0.2, "fourth": 0.2, "radius": 8}),
        ("toneequal", {"shadows": 0.5}),
        ("bilat", {"sigma_r": 100.0, "sigma_s": 100.0, "detail": 0.3}),
        ("exposure", {"exposure": 0.5}),
        ("filmicrgb", {}),
    ], label="45MP heavy-iterative stack"),
    # BASELINE config 4: X-Trans Markesteijn 3-pass + lens (incl. TCA)
    4: dict(h=4000, w=6000, xtrans=True, history=[
        ("demosaic", {"demosaicing_method": 1024 | 2}),  # Markesteijn 3-pass
        ("lens", {"tca_r": 1.0005, "tca_b": 0.9995, "dist_a": -0.02}),
        ("exposure", {"exposure": 0.5}),
        ("filmicrgb", {}),
    ], label="24MP X-Trans Markesteijn-3pass+lens+TCA"),
    # BASELINE config 5: catalog batch export through the LIBRARY path —
    # SQLite import + collection query + USER_EXPORT queue + host decode
    # -> device render -> host JPEG encode, mixed Bayer/X-Trans pipes
    # (library/export.py; reference export.c + export_jobs.c).  Small
    # frames: the sandbox relay tunnel (~1-35 MB/s) would otherwise
    # dominate with transfer time no real deployment pays.
    5: dict(library=True, n_images=24, h=1024, w=1536,
            label="library batch export (24-image mixed catalog, "
                  "full decode->render->encode path)"),
    # config 6: the reference's own benchmark pipeline — the full
    # darktable-bench-3.4 sidecar history (~60 module instances incl.
    # denoiseprofile x2, retouch x2, bilat x2, atrous, liquify,
    # hazeremoval), the honest like-for-like comparison against the
    # 0.2 img/s CPU baseline (tests/benchmark/README.txt:135-141)
    6: dict(h=4000, w=6016, sidecar="darktable-bench-3.4.xmp",
            label="full 3.4-sidecar replay (~60 modules)"),
}

# Fuji X-Trans III 6x6 pattern (color indices)
XTRANS6 = (1, 2, 0, 1, 0, 2,
           0, 1, 1, 2, 1, 1,
           2, 1, 1, 0, 1, 1,
           1, 0, 2, 1, 2, 0,
           2, 1, 1, 0, 1, 1,
           0, 1, 1, 2, 1, 1)


def _remosaic_xtrans(raw, meta, scene, h, w):
    """Re-sample a synthetic Bayer scene through the X-Trans pattern."""
    import dataclasses

    import numpy as _np

    meta = dataclasses.replace(meta, xtrans=XTRANS6)
    idx = _np.asarray(XTRANS6).reshape(6, 6)
    sel = idx[_np.arange(h)[:, None] % 6, _np.arange(w)[None, :] % 6]
    lin = _np.take_along_axis(_np.asarray(scene), sel[None], axis=0)[0]
    wb = _np.asarray(meta.wb_coeffs)[:3][sel]
    raw = (lin / _np.maximum(wb, 1e-6)
           * (meta.white_point - meta.black_levels[0])
           + meta.black_levels[0]).astype(_np.float32)
    return raw, meta


def run_library_config(cfg):
    """Config 5: the full library path — import, collection, scheduler
    USER_EXPORT queue, host decode -> device render -> host encode.
    Steady-state rate: run the catalog twice, time the second pass
    (pipe compiles are plan-signature cached; decode/render/encode all
    re-run per image)."""
    import shutil
    import tempfile

    from ansel_tpu import HistoryItem
    from ansel_tpu.io.rawfile import save_raw
    from ansel_tpu.io.synthetic import synth_raw
    from ansel_tpu.io.xmp import write_xmp
    from ansel_tpu.library.collections import Collection
    from ansel_tpu.library.db import Library
    from ansel_tpu.library.export import batch_export

    H, W, n = cfg["h"], cfg["w"], cfg["n_images"]
    root = tempfile.mkdtemp(prefix="ansel_bench5_")
    try:
        src = os.path.join(root, "film")
        os.makedirs(src)
        hist = [HistoryItem("exposure", {"exposure": 0.5}),
                HistoryItem("channelmixerrgb", {}),
                HistoryItem("filmicrgb", {})]
        for i in range(n):
            raw, meta, scene = synth_raw(h=H, w=W, kind="gradients",
                                         seed=i)
            if i % 2:  # odd images: X-Trans (Markesteijn pipe)
                raw, meta = _remosaic_xtrans(raw, meta, scene, H, W)
            path = os.path.join(src, f"img{i:03d}.npz")
            save_raw(path, raw, meta)
            write_xmp(path + ".xmp", hist)

        lib = Library(os.path.join(root, "library.db"))
        lib.import_film_roll(src)
        coll = Collection(film_folder=src)

        out1 = os.path.join(root, "out1")
        out2 = os.path.join(root, "out2")
        written = batch_export(lib, coll, out1)   # compile warmup pass
        assert len(written) == n, written
        t0 = time.perf_counter()
        written = batch_export(lib, coll, out2)
        dt = time.perf_counter() - t0
        assert len(written) == n and all(
            os.path.getsize(p) > 1000 for p in written)

        import jax
        ips = n / dt
        return ips, {
            "pixelpipe_mp_per_sec": round(n * H * W / 1e6 / dt, 1),
            "image_mp": round(H * W / 1e6, 1),
            "images": n,
            "mixed": "bayer+xtrans",
            "path": "sqlite+collection+user_export_queue+decode+encode",
            "backend": jax.default_backend(),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def run_config(cfg_id: int):
    """Measure one config -> (images_per_sec, detail_dict)."""
    import jax

    from ansel_tpu import HistoryItem, compile_pipeline
    from ansel_tpu.io.synthetic import synth_raw
    from ansel_tpu.ops import base as ops_base

    cfg = CONFIGS[cfg_id]
    if cfg.get("library"):
        return run_library_config(cfg)
    H, W = cfg["h"], cfg["w"]
    raw, meta, scene = synth_raw(h=H, w=W, kind="gradients")
    if cfg.get("xtrans"):
        raw, meta = _remosaic_xtrans(raw, meta, scene, H, W)

    forms = None
    if cfg.get("sidecar"):
        from ansel_tpu.io.xmp import parse_xmp

        path = os.path.join("/root/reference/tests/benchmark",
                            cfg["sidecar"])
        doc = parse_xmp(path)
        history, forms = doc.history, doc.masks
    else:
        history = [HistoryItem(op, prm) for op, prm in cfg["history"]]
    pipe = compile_pipeline(meta, history, scale=1.0, forms=forms)

    spec = pipe.pipe.spec_in
    raw_padded = ops_base.pad_to(raw, spec)
    batch = int(cfg.get("batch", 0))

    # warmup / compile (+ hard sync: a small readback, because
    # block_until_ready over the axon relay does not actually block)
    if batch:
        import jax.numpy as jnp

        base_fn, base_coeffs = pipe._fn, pipe._coeffs
        # lax.map (not vmap): Pallas ANY-space refs can't take a batch dim;
        # images stream through the compiled pipe back-to-back on-device
        fn = jax.jit(lambda xs, cs: jax.lax.map(
            lambda xx: base_fn(xx, cs), xs))
        dev_raw = jax.device_put(
            np.broadcast_to(raw_padded, (batch,) + raw_padded.shape).copy())
        coeffs = jax.device_put(base_coeffs)
        y = fn(dev_raw, coeffs)
        np.asarray(y[0, 0, 0, :8])
    else:
        dev_raw = jax.device_put(raw_padded)
        coeffs = jax.device_put(pipe._coeffs)
        fn = pipe._fn
        y = fn(dev_raw, coeffs)
        np.asarray(y[0, 0, :8])

    # Pipeline throughput, device-resident input (the reference benchmark
    # times the pixelpipe, not disk/codec IO — ansel-bench:250-320).  The
    # sandbox's host<->device tunnel runs at ~1 MB/s, so bulk transfers
    # would measure the tunnel, not the framework; a 32-byte readback
    # forces synchronization honestly.
    n = 12 if not batch else 6
    t0 = time.perf_counter()
    for i in range(n):
        y = fn(dev_raw, coeffs)
    np.asarray(y[0, 0, 0, :8] if batch else y[0, 0, :8])
    t_compute = (time.perf_counter() - t0) / n

    mp = (H * W) / 1e6 * max(batch, 1)
    images_per_sec = max(batch, 1) / t_compute
    return images_per_sec, {
        "pixelpipe_mp_per_sec": round(mp / t_compute, 1),
        "image_mp": round(mp, 1),
        "backend": jax.default_backend(),
    }


def main():
    import jax

    # persistent XLA compile cache: the 60-module sidecar pipelines take
    # minutes to compile cold; cached re-runs start in seconds
    jax.config.update("jax_compilation_cache_dir", "/tmp/ansel_tpu_jitcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    cfg_id = None
    for a in sys.argv[1:]:
        if a.startswith("--config="):
            cfg_id = int(a.split("=")[1])

    if cfg_id is not None:
        ips, detail = run_config(cfg_id)
        cfg = CONFIGS[cfg_id]
        result = {
            "metric": "24MP raw->sRGB full-pipe exports/sec/chip"
            if cfg_id == 1 else f"config {cfg_id}: {cfg['label']} exports/sec",
            "value": round(ips, 3),
            "unit": "images/sec",
            "vs_baseline": round(ips / 0.2, 2),
            "detail": detail,
        }
        print(json.dumps(result))
        return

    # bare run: config 1 (simple-pipe headline) AND config 6 — the
    # reference's own benchmark sidecar (~60 modules), the honest
    # like-for-like comparison against the 0.2 img/s CPU baseline
    ips1, detail = run_config(1)
    ips6, _ = run_config(6)
    detail["config6_img_per_sec"] = round(ips6, 3)
    detail["config6_vs_baseline"] = round(ips6 / 0.2, 2)
    detail["config6_label"] = CONFIGS[6]["label"]
    result = {
        "metric": "24MP raw->sRGB full-pipe exports/sec/chip",
        "value": round(ips1, 3),
        "unit": "images/sec",
        "vs_baseline": round(ips1 / 0.2, 2),
        "detail": detail,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
