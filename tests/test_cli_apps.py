"""CLI maintenance modes — the reference's auxiliary apps
(src/apps/ansel-generate-cache, ansel-cltest) as ansel-tpu-cli modes."""

import os

import numpy as np
import pytest


def test_generate_cache(tmp_path, capsys):
    from ansel_tpu.cli import main
    from ansel_tpu.io.rawfile import save_raw
    from ansel_tpu.io.synthetic import synth_raw
    from ansel_tpu.library.db import Library

    folder = tmp_path / "roll"
    folder.mkdir()
    raw, meta, _ = synth_raw(h=96, w=128)
    save_raw(str(folder / "a.npz"), raw, meta)
    save_raw(str(folder / "b.npz"), raw, meta)

    libpath = tmp_path / "library.db"
    lib = Library(str(libpath))
    lib.import_film_roll(str(folder))
    lib.close()

    cache = tmp_path / "cache"
    rc = main(["--generate-cache", "--library", str(libpath),
               "--min-mip", "0", "--max-mip", "1",
               "--cache-dir", str(cache)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "generated 4 thumbnails" in out
    files = [f for f in os.listdir(cache) if f.endswith(".npz")]
    assert len(files) == 4


def test_devtest(capsys):
    from ansel_tpu.cli import main

    rc = main(["--devtest"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "backend" in out and "pallas pointwise kernel: OK" in out
