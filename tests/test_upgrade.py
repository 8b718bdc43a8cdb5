"""Format versioning + upgrade machinery (reference: src/upgrade.rs)."""

import json
import os

import pytest

from arroy_tpu import Database, Reader, UnknownVersion, Writer
from arroy_tpu.upgrade import upgrade_index
from arroy_tpu.version import CURRENT_VERSION, Version

from .util import random_vectors


def test_reader_reports_version(tmp_path):
    path = str(tmp_path / "db")
    x = random_vectors(30, 4, seed=1)
    db = Database(path)
    w = Writer(db, 0, 4)
    with db.write() as wtxn:
        for i in range(30):
            w.add_item(wtxn, i, x[i])
        w.builder(seed=1).build(wtxn)
    r = Reader.open(db.read(), 0, db)
    assert r.version() == CURRENT_VERSION


def test_upgrade_noop_at_current(tmp_path):
    path = str(tmp_path / "db")
    x = random_vectors(30, 4, seed=2)
    db = Database(path)
    w = Writer(db, 0, 4)
    with db.write() as wtxn:
        for i in range(30):
            w.add_item(wtxn, i, x[i])
        w.builder(seed=1).build(wtxn)
    upgrade_index(db, 0)
    r = Reader.open(db.read(), 0, db)
    assert r.version() == CURRENT_VERSION
    r.assert_validity()


def test_future_format_rejected(tmp_path):
    path = str(tmp_path / "db")
    x = random_vectors(10, 4, seed=3)
    db = Database(path)
    w = Writer(db, 0, 4)
    with db.write() as wtxn:
        for i in range(10):
            w.add_item(wtxn, i, x[i])
        w.builder(seed=1).build(wtxn)
    # simulate a database written by a future major version
    manifest_path = os.path.join(path, "MANIFEST.json")
    m = json.load(open(manifest_path))
    m["version"] = "99.0.0"
    json.dump(m, open(manifest_path, "w"))
    with pytest.raises(UnknownVersion):
        Database(path)


def test_version_ordering():
    assert Version(0, 9, 9) < Version(1, 0, 0) < Version(1, 0, 1)
    assert str(Version(1, 2, 3)) == "1.2.3"
    assert Version.parse("4.5.6") == Version(4, 5, 6)
