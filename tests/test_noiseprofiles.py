"""Bundled noise-profile database: known-camera lookup resolves to the
reference's measured a/b values, ISO interpolation is linear
(noiseprofiles.c:dt_noiseprofile_interpolate:389-405), and a missing
database warns loudly instead of silently returning {}.
"""

import json
import os

from ansel_tpu.core import log as log_mod
from ansel_tpu.io import noiseprofiles as npdb

_BUNDLED = os.path.join(os.path.dirname(npdb.__file__), "..", "data",
                        "noiseprofiles.json")


def test_bundled_db_loads():
    db = npdb.load()
    assert len(db) > 100  # hundreds of camera models ship in the snapshot
    assert ("canon", "eos-1ds") in db


def test_known_camera_exact_iso_matches_reference_values():
    # values straight from the bundled JSON (== reference data file)
    with open(_BUNDLED) as f:
        doc = json.load(f)
    canon = next(m for m in doc["noiseprofiles"] if m["maker"] == "Canon")
    model = next(m for m in canon["models"] if m["model"] == "EOS-1Ds")
    row = next(p for p in model["profiles"] if p["iso"] == 100)

    a, b = npdb.find("Canon", "EOS-1Ds", 100.0)
    assert a == tuple(row["a"])
    assert b == tuple(row["b"])


def test_iso_interpolation_linear():
    a50, b50 = npdb.find("Canon", "EOS-1Ds", 50.0)
    a100, b100 = npdb.find("Canon", "EOS-1Ds", 100.0)
    a75, b75 = npdb.find("Canon", "EOS-1Ds", 75.0)
    for k in range(3):
        assert abs(a75[k] - 0.5 * (a50[k] + a100[k])) < 1e-12
        assert abs(b75[k] - 0.5 * (b50[k] + b100[k])) < 1e-12


def test_substring_model_match():
    # raw decoders emit varying model strings; substring matching covers
    # "Canon EOS-1Ds" vs "EOS-1Ds"
    hit = npdb.find("canon", "Canon EOS-1Ds", 200.0)
    assert hit is not None


def test_missing_db_warns_loudly(monkeypatch, tmp_path):
    npdb.load.cache_clear()
    monkeypatch.setenv("ANSEL_TPU_DATA", str(tmp_path))
    monkeypatch.setattr(npdb, "_default_path", lambda: None)
    log_mod.clear()
    try:
        assert npdb.load() == {}
        recs = [m for (_t, _d, m) in log_mod.records("always")
                if "noiseprofiles" in m]
        assert recs, "missing database must log a loud warning"
    finally:
        npdb.load.cache_clear()


def test_unknown_camera_returns_none():
    assert npdb.find("NoSuchMaker", "NoSuchModel", 100.0) is None
