"""Library layer: SQLite DB, tags, collections, variables, crawler.

Reference behaviors: `src/common/database.c` (schema/import),
`collection.c` (query builder), `variables.c` (template expansion),
`src/control/crawler.c` (XMP reconciliation)."""

import os
import time

import numpy as np
import pytest

from ansel_tpu.library import Library
from ansel_tpu.library.collections import Collection
from ansel_tpu.library.crawler import crawl
from ansel_tpu.library.variables import expand


@pytest.fixture
def film(tmp_path):
    d = tmp_path / "roll_a"
    d.mkdir()
    for name in ("img_0001.dng", "img_0002.dng", "other.txt"):
        (d / name).write_bytes(b"II*\x00\x08\x00\x00\x00\x00\x00")
    return str(d)


def test_import_film_roll_and_exif_columns(film):
    lib = Library()
    ids = lib.import_film_roll(film)
    assert len(ids) == 2  # .txt skipped
    # idempotent
    assert lib.import_film_roll(film) == ids
    assert lib.image_path(ids[0]).endswith("img_0001.dng")


def test_ratings_labels_tags(film):
    lib = Library()
    ids = lib.import_film_roll(film)
    lib.set_rating(ids[0], 4)
    assert lib.rating(ids[0]) == 4
    lib.set_color_label(ids[0], 2)
    lib.attach_tag(ids[0], "travel|alps")
    lib.attach_tag(ids[1], "travel|sea")
    assert lib.image_tags(ids[0]) == ["travel|alps"]
    lib.detach_tag(ids[0], "travel|alps")
    assert lib.image_tags(ids[0]) == []


def test_collection_filters(film):
    lib = Library()
    ids = lib.import_film_roll(film)
    lib.set_rating(ids[0], 5)
    lib.attach_tag(ids[1], "keep")
    assert Collection(min_rating=4).run(lib) == [ids[0]]
    assert Collection(tag="keep").run(lib) == [ids[1]]
    assert Collection(filename_like="img_%").run(lib) == ids
    assert Collection(sort="filename", descending=True).run(lib) \
        == list(reversed(ids))


def test_history_roundtrip_via_db(film):
    from ansel_tpu.pipeline.engine import HistoryItem

    lib = Library()
    ids = lib.import_film_roll(film)
    hist = [HistoryItem("exposure", {"exposure": 1.25}),
            HistoryItem("vibrance", {"amount": 40.0})]
    lib.write_history(ids[0], hist)
    back = lib.read_history(ids[0])
    assert [h.op for h in back] == ["exposure", "vibrance"]
    from ansel_tpu.core.params import decode_blob

    p = decode_blob("exposure", back[0].version or 6, back[0].params)
    assert abs(p.exposure - 1.25) < 1e-6


def test_crawler_reimports_newer_sidecar(film):
    from ansel_tpu.io.xmp import XMPDocument, write_xmp
    from ansel_tpu.pipeline.engine import HistoryItem

    lib = Library()
    ids = lib.import_film_roll(film)
    xmp = lib.xmp_path(ids[0])
    write_xmp(xmp, XMPDocument(
        history=[HistoryItem("exposure", {"exposure": 0.5})]))
    rep = crawl(lib)
    assert ids[0] in rep.reimported
    assert [h.op for h in lib.read_history(ids[0])] == ["exposure"]
    # second crawl: no change
    assert crawl(lib).reimported == []


def test_variables_expansion(film):
    lib = Library()
    ids = lib.import_film_roll(film)
    lib.set_rating(ids[0], 3)
    lib.con.execute(
        "UPDATE images SET datetime_taken='2024:06:01 10:30:00', "
        "iso=400, maker='FUJI', model='X-T5' WHERE id=?", (ids[0],))
    out = expand("$(ROLL_NAME)/$(FILE_NAME)-$(EXIF_YEAR)$(EXIF_MONTH)"
                 "-iso$(EXIF_ISO)-$(MODEL)-$(STARS)$(UNKNOWN)",
                 lib, ids[0])
    assert out == "roll_a/img_0001-202406-iso400-X-T5-3"


def test_exif_reader_jpeg_roundtrip(tmp_path):
    from PIL import Image

    from ansel_tpu.io.exif import read_exif

    # build a JPEG carrying EXIF via PIL
    img = Image.new("RGB", (8, 8))
    exif = Image.Exif()
    exif[0x010F] = "TestMaker"
    exif[0x0110] = "TestCam X"
    exif[0x8827] = 800
    exif[0x0132] = "2023:12:24 08:15:30"
    p = str(tmp_path / "shot.jpg")
    img.save(p, exif=exif)
    ex = read_exif(p)
    assert ex.maker == "TestMaker"
    assert ex.model == "TestCam X"
    assert ex.iso == 800
    assert ex.datetime.startswith("2023:12:24")


def test_batch_export_end_to_end(tmp_path):
    """Collection -> scheduler export queue -> files on disk
    (libs/export.c + export_jobs.c flow)."""
    from ansel_tpu.io.rawfile import save_raw
    from ansel_tpu.io.synthetic import synth_raw
    from ansel_tpu.io.xmp import XMPDocument, write_xmp
    from ansel_tpu.library.export import batch_export
    from ansel_tpu.pipeline.engine import HistoryItem

    roll = tmp_path / "roll_b"
    roll.mkdir()
    raw, meta, _ = synth_raw(h=96, w=128)
    for i in range(2):
        save_raw(str(roll / f"shot_{i}.npz"), raw, meta)
    write_xmp(str(roll / "shot_0.npz.xmp"), XMPDocument(
        history=[HistoryItem("exposure", {"exposure": 1.0})]))

    lib = Library()
    lib.import_film_roll(str(roll))
    out = batch_export(lib, Collection(), str(tmp_path / "out"),
                       template="$(FILE_NAME)-exported")
    assert len(out) == 2
    for p in out:
        assert os.path.exists(p) and p.endswith("-exported.jpg")


def test_mipmap_cache_levels_and_lru(tmp_path):
    """Leveled thumbnail service with disk store (mipmap_cache.c)."""
    from ansel_tpu.io.rawfile import save_raw
    from ansel_tpu.io.synthetic import synth_raw
    from ansel_tpu.library.mipmap import MipmapCache

    roll = tmp_path / "roll_m"
    roll.mkdir()
    raw, meta, _ = synth_raw(h=256, w=384)
    p = str(roll / "shot.npz")
    save_raw(p, raw, meta)

    cache = MipmapCache(cache_dir=str(tmp_path / "mips"), mem_items=2)
    t0 = cache.get(p, 0)
    assert t0.dtype == np.uint8 and t0.shape[0] == 3
    assert max(t0.shape[1:]) <= 180
    assert cache.misses == 1
    # hit from memory
    _ = cache.get(p, 0)
    assert cache.hits == 1
    # disk round-trip after memory eviction
    _ = cache.get(p, 1)
    _ = cache.get(p, 2)
    _ = cache.get(p, 0)   # evicted from mem (mem_items=2) -> disk hit
    assert cache.hits == 2
    # invalidation clears both stores
    cache.invalidate(p)
    _ = cache.get(p, 0)
    assert cache.misses == 4


def test_initialscale_shrinks_working_size():
    """Reduced-size exports process downstream ops at export resolution
    (doc/resizing-scaling.md ROI scaling)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from ansel_tpu import HistoryItem
    from ansel_tpu.io.synthetic import synth_raw
    from ansel_tpu.pipeline.engine import compile_pipeline

    raw, meta, _ = synth_raw(h=256, w=384)
    pipe = compile_pipeline(meta, [HistoryItem("exposure",
                                               {"exposure": 0.5})],
                            scale=0.25)
    names = [s.name for s in pipe.pipe.stages]
    assert "initialscale" in names
    assert "finalscale" not in names
    i = names.index("initialscale")
    st = pipe.pipe.stages[i]
    assert st.plan.spec_out.width == 96
    # ops after initialscale plan at the reduced size
    post = pipe.pipe.stages[i + 1]
    assert post.plan.spec_in.width == 96
    out = np.asarray(pipe.output_array(raw))
    assert out.shape[1:] == (64, 96)


def test_presets_autoapply_rules(film):
    """Module presets with EXIF match rules (common/presets.c)."""
    from ansel_tpu.library.presets import (apply_auto_presets,
                                           auto_presets, load_preset,
                                           save_preset)
    from ansel_tpu.pipeline.engine import HistoryItem

    lib = Library()
    ids = lib.import_film_roll(film)
    lib.con.execute(
        "UPDATE images SET maker='FUJI', model='X-T5', iso=1600 "
        "WHERE id=?", (ids[0],))
    save_preset(lib, "punchy", "velvia", {"strength": 50.0})
    save_preset(lib, "high-iso-nr", "denoiseprofile",
                {"a": (4e-4,) * 3, "b": (1e-5,) * 3},
                autoapply=True, iso=(800.0, 1e9))
    save_preset(lib, "fuji-only", "vibrance", {"amount": 10.0},
                autoapply=True, maker="%FUJI%")
    save_preset(lib, "canon-only", "grain", {"strength": 30.0},
                autoapply=True, maker="%Canon%")

    # explicit load
    item = load_preset(lib, "punchy", "velvia")
    from ansel_tpu.core.params import decode_blob

    p = decode_blob("velvia", item.version or 1, item.params)
    assert abs(p.strength - 50.0) < 1e-6

    auto = {h.op for h in auto_presets(lib, ids[0])}
    assert auto == {"denoiseprofile", "vibrance"}  # canon rule excluded

    # history merge: explicit items win over presets of the same op
    hist = [HistoryItem("vibrance", {"amount": 99.0})]
    merged = apply_auto_presets(lib, ids[0], hist)
    assert [h.op for h in merged] == ["denoiseprofile", "vibrance"]
    assert merged[-1].params == {"amount": 99.0}


def _write_dummy_raw(path: str):
    from ansel_tpu.io.rawfile import save_raw
    from ansel_tpu.io.synthetic import synth_raw

    raw, meta, _ = synth_raw(h=64, w=96)
    save_raw(path, raw, meta)


def test_gpx_geotag(tmp_path):
    """GPX parse + timestamp interpolation onto library images
    (common/gpx.c semantics)."""
    from ansel_tpu.io.gpx import geotag_images, locate, parse_gpx
    from ansel_tpu.library.db import Library

    gpx = tmp_path / "track.gpx"
    gpx.write_text("""<?xml version="1.0"?>
<gpx xmlns="http://www.topografix.com/GPX/1/1"><trk><trkseg>
<trkpt lat="47.0" lon="8.0"><ele>400</ele>
  <time>2024-06-01T10:00:00Z</time></trkpt>
<trkpt lat="47.1" lon="8.2"><ele>500</ele>
  <time>2024-06-01T11:00:00Z</time></trkpt>
</trkseg></trk></gpx>""")
    pts = parse_gpx(str(gpx))
    assert len(pts) == 2
    import datetime as dt

    mid = dt.datetime(2024, 6, 1, 10, 30,
                      tzinfo=dt.timezone.utc).timestamp()
    lat, lon, ele = locate(pts, mid)
    assert abs(lat - 47.05) < 1e-6 and abs(lon - 8.1) < 1e-6
    assert abs(ele - 450.0) < 1e-6
    # through the library
    lib = Library()
    img = tmp_path / "a.npz"
    _write_dummy_raw(str(img))
    imgid = lib.import_image(str(img))
    lib.con.execute("UPDATE images SET datetime_taken=? WHERE id=?",
                    ("2024:06:01 10:30:00", imgid))
    out = geotag_images(lib, str(gpx))
    assert imgid in out
    row = lib.con.execute("SELECT latitude, longitude FROM images "
                          "WHERE id=?", (imgid,)).fetchone()
    assert abs(row["latitude"] - 47.05) < 1e-6


def test_undo_redo_history_and_rating(tmp_path):
    """UndoStack + HistoryEditor round-trips (common/undo.c analog)."""
    from ansel_tpu.library.db import Library
    from ansel_tpu.library.undo import HistoryEditor
    from ansel_tpu.pipeline.engine import HistoryItem

    lib = Library()
    img = tmp_path / "b.npz"
    _write_dummy_raw(str(img))
    imgid = lib.import_image(str(img))
    ed = HistoryEditor(lib)
    ed.write_history(imgid, [HistoryItem("exposure",
                                         {"exposure": 1.0})])
    ed.write_history(imgid, [HistoryItem("exposure",
                                         {"exposure": 2.0})])
    assert len(lib.read_history(imgid)) == 1
    ed.set_rating(imgid, 4)
    assert lib.rating(imgid) == 4
    assert ed.undo()                   # rating back to 0
    assert lib.rating(imgid) == 0
    assert ed.undo()                   # history back to 1.0 version
    h = lib.read_history(imgid)
    from ansel_tpu.core.params import params_class

    p = params_class("exposure").codec.decode(h[0].params)
    assert abs(p.exposure - 1.0) < 1e-6
    assert ed.redo()
    p = params_class("exposure").codec.decode(
        lib.read_history(imgid)[0].params)
    assert abs(p.exposure - 2.0) < 1e-6


def test_schema_v1_migrates_to_v2(tmp_path):
    """Opening a v1 db adds the geo columns (database.c migrations)."""
    import sqlite3

    from ansel_tpu.library import db as db_mod

    path = str(tmp_path / "old.db")
    lib = db_mod.Library(path)
    lib.con.execute("UPDATE db_info SET value='1' WHERE key='version'")
    # simulate v1: drop the geo columns
    for col in ("latitude", "longitude", "elevation"):
        lib.con.execute(f"ALTER TABLE images DROP COLUMN {col}")
    lib.con.commit()
    lib.close()
    lib2 = db_mod.Library(path)
    cols = [r[1] for r in lib2.con.execute("PRAGMA table_info(images)")]
    assert "latitude" in cols and "elevation" in cols


def test_gallery_export(tmp_path):
    """HTML gallery storage (imageio/storage/gallery.c analog)."""
    import os

    from ansel_tpu.library.db import Library
    from ansel_tpu.library.gallery import export_gallery

    roll = tmp_path / "roll_g"
    roll.mkdir()
    for i in range(2):
        _write_dummy_raw(str(roll / f"g_{i}.npz"))
    lib = Library()
    ids = lib.import_film_roll(str(roll))
    out = tmp_path / "site"
    index = export_gallery(lib, ids, str(out), title="Test roll")
    html_text = open(index).read()
    assert "Test roll" in html_text
    assert html_text.count("<figure>") == 2
    for i in range(2):
        assert os.path.exists(out / f"g_{i}.jpg")
        assert os.path.exists(out / "thumbs" / f"g_{i}.jpg")
