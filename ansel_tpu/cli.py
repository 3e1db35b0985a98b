"""ansel-tpu CLI — headless export (the `ansel-cli` analog,
reference src/apps/ansel-cli/main.c).

Raw input formats: .dng/.tif (native C++ decoder, native/rawdec —
uncompressed packed 10-16 bit + lossless-JPEG strips), .npz bundles
produced by `ansel_tpu.io.rawfile`, or `synth:WxH` synthetic test raws.

Usage:
  python -m ansel_tpu.cli <raw.npz|synth:6000x4000> [xmp sidecar] <out.jpg>
      [--width N] [--height N] [--quality Q] [--core ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def _generate_cache(argv):
    """`ansel-generate-cache` analog (reference
    src/apps/ansel-generate-cache/main.c:61-140): pre-render mipmap
    levels for a library's images into the disk-backed thumbnail
    store.  usage: --generate-cache --library <library.db>
    [--min-mip 0] [--max-mip 2] [--min-imgid N] [--max-imgid N]
    [--cache-dir DIR]"""
    import argparse

    ap = argparse.ArgumentParser(prog="ansel-tpu-cli --generate-cache")
    ap.add_argument("--library", required=True)
    ap.add_argument("--min-mip", type=int, default=0)
    ap.add_argument("--max-mip", type=int, default=2)
    ap.add_argument("--min-imgid", type=int, default=0)
    ap.add_argument("--max-imgid", type=int, default=1 << 31)
    ap.add_argument("--cache-dir", default=None)
    args = ap.parse_args(argv)

    from .library.db import Library
    from .library.mipmap import LEVEL_SIZES, MipmapCache

    lib = Library(args.library)
    mc = MipmapCache(cache_dir=args.cache_dir)
    lo = max(0, args.min_mip)
    hi = min(args.max_mip, len(LEVEL_SIZES) - 1)
    n = 0
    for imgid in lib.images():
        if not (args.min_imgid <= imgid <= args.max_imgid):
            continue
        path = lib.image_path(imgid)
        xmp = lib.xmp_path(imgid)
        if not os.path.exists(path):
            print(f"image {imgid}: missing file {path}, skipped",
                  file=sys.stderr)
            continue
        # large-to-small like the reference (:116): smaller levels
        # render from already-cached larger ones' pipeline output
        for level in range(hi, lo - 1, -1):
            mc.get(path, level,
                   xmp_path=xmp if os.path.exists(xmp) else None)
            n += 1
        print(f"image {imgid}: levels {lo}..{hi} cached")
    print(f"generated {n} thumbnails "
          f"(hits {mc.hits}, misses {mc.misses})")
    return 0


def _devtest():
    """`ansel-cltest` analog (src/apps/ansel-cltest): device/backend
    diagnostic — discovery, a probe compile, Pallas availability."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    print(f"jax {jax.__version__}, backend: {jax.default_backend()}")
    for i, d in enumerate(jax.devices()):
        print(f"  device {i}: {d.device_kind} ({d.platform})")
    t0 = time.perf_counter()
    y = jax.jit(lambda x: x * 2.0 + 1.0)(jnp.ones((8, 128)))
    v = np.asarray(y[0, :2])
    print(f"probe compile+run: {time.perf_counter() - t0:.2f}s -> {v}")
    try:
        from .kernels.pointwise import ConstPack, pallas_pointwise

        pack = ConstPack()
        vec = pack.pack({"g": np.float32(2.0)}, ["g"])
        z = pallas_pointwise(
            lambda b, c: b * pack.get(c, "g"),
            jnp.ones((3, 64, 512)), vec,
            interpret=jax.default_backend() != "tpu")
        np.asarray(z[0, 0, :2])
        print("pallas pointwise kernel: OK"
              + ("" if jax.default_backend() == "tpu"
                 else " (interpret mode)"))
    except Exception as e:  # pragma: no cover - diagnostic surface
        print(f"pallas pointwise kernel: FAILED ({e})")
        return 1
    return 0


def main(argv=None):
    argv = sys.argv[1:] if argv is None else list(argv)
    if argv and argv[0] == "--generate-cache":
        return _generate_cache(argv[1:])
    if argv and argv[0] == "--devtest":
        return _devtest()
    if argv and argv[0] == "--ingest-lensfun":
        # maintenance mode: install a full upstream lensfun database so
        # lens correction uses measured calibrations instead of the
        # bundled approximate snapshot (io/lensfun.ingest_db)
        from .io.lensfun import ingest_db

        src = argv[1] if len(argv) > 1 else ""
        if not src:
            print("usage: ansel-tpu-cli --ingest-lensfun "
                  "<dir-or-tarball> [dest]", file=sys.stderr)
            return 2
        ncam, nlens = ingest_db(src, argv[2] if len(argv) > 2 else None)
        print(f"ingested lensfun db: {ncam} cameras, {nlens} lenses")
        return 0

    ap = argparse.ArgumentParser(prog="ansel-tpu-cli")
    ap.add_argument("input")
    ap.add_argument("xmp", nargs="?", default=None)
    ap.add_argument("output")
    ap.add_argument("--width", type=int, default=0)
    ap.add_argument("--height", type=int, default=0)
    ap.add_argument("--quality", type=int, default=92)
    ap.add_argument("--bpp", type=int, default=8, choices=(8, 16))
    ap.add_argument("--no-icc", action="store_true")
    ap.add_argument("-d", "--debug", action="append", default=[],
                    choices=("perf", "nan", "supervisor"),
                    help="per-stage timing / NaN scan / lifecycle "
                         "registry (reference -d flags)")
    ap.add_argument("--verbose", "-v", action="store_true")
    args = ap.parse_args(argv)

    import numpy as np

    from .core import crash
    from .io.rawfile import load_raw
    from .io.synthetic import synth_raw
    from .pipeline.export import ExportSettings, export_image

    crash.install()
    crash.breadcrumb("image", args.input)
    t0 = time.perf_counter()
    if args.input.startswith("synth:"):
        w, h = (int(v) for v in args.input[6:].split("x"))
        raw, meta, _ = synth_raw(h=h, w=w)
    elif args.input.lower().endswith((".dng", ".tif", ".tiff")):
        from .io.dng import load_dng

        raw, meta = load_dng(args.input)
    else:
        raw, meta = load_raw(args.input)
    if args.verbose:
        print(f"[load] {meta.width}x{meta.height} {meta.cfa} "
              f"{time.perf_counter() - t0:.2f}s", file=sys.stderr)

    xmp = args.xmp if args.xmp and args.xmp.lower().endswith(".xmp") else None
    settings = ExportSettings(max_width=args.width, max_height=args.height,
                              quality=args.quality, bpp=args.bpp,
                              embed_icc=not args.no_icc)
    if args.debug:
        from .io.xmp import parse_xmp
        from .pipeline.engine import Pipeline
        from .pipeline.export import compute_export_scale
        from .pipeline.profiling import nan_report, run_stages

        doc = parse_xmp(xmp) if xmp else None
        pipe = Pipeline(meta, doc.history if doc else [],
                        scale=compute_export_scale(meta, settings),
                        forms=doc.masks if doc else None)
        reps = run_stages(pipe, raw, nan_scan="nan" in args.debug)
        bad = nan_report(reps)
        if bad:
            print(f"[nan] {bad}", file=sys.stderr)
    if "supervisor" in args.debug:
        from .core import conf as conf_mod
        from .core import supervisor as sup_mod

        conf_mod.set("debug.supervisor", True)
        sup_mod._ENABLED = True
    t0 = time.perf_counter()
    crash.breadcrumb("pipe", "export")
    out = export_image(raw, meta, xmp_path=xmp, output_path=args.output,
                       settings=settings)
    crash.breadcrumb("pipe", None)
    if "supervisor" in args.debug:
        from .core import supervisor as sup_mod

        bad = sup_mod.anomalies()
        print(f"[supervisor] {len(sup_mod.ring())} events, "
              f"{len(bad)} anomalies", file=sys.stderr)
        for r in bad[:20]:
            print(f"[supervisor] {r}", file=sys.stderr)
    if args.verbose:
        print(f"[export] {out.shape[2]}x{out.shape[1]} -> {args.output} "
              f"{time.perf_counter() - t0:.2f}s", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
