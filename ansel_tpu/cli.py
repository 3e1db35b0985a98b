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
import sys
import time


def main(argv=None):
    argv = sys.argv[1:] if argv is None else list(argv)
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

    from .io.rawfile import load_raw
    from .io.synthetic import synth_raw
    from .pipeline.export import ExportSettings, export_image

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
    out = export_image(raw, meta, xmp_path=xmp, output_path=args.output,
                       settings=settings)
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
