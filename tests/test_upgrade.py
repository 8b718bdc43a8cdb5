"""Format versioning + upgrade machinery (reference: src/upgrade.rs).

The committed asset `tests/assets/v1_0_npy` is a database written by the
v1.0.0 format (npy-layout generations) — the analog of the reference's
committed `src/tests/assets/v0_6/*.mdb` (src/tests/upgrade.rs:11-96).
"""

import json
import os
import shutil

import pytest

import numpy as np

from arroy_tpu import Database, Reader, UnknownVersion, Writer
from arroy_tpu.models.forest import KIND_SPLIT, KIND_SPLIT_NONE
from arroy_tpu.upgrade import upgrade_all, upgrade_index
from arroy_tpu.version import CURRENT_VERSION, V1_0_0, V1_1_0, Version

from .util import random_vectors

ASSET = os.path.join(os.path.dirname(__file__), "assets", "v1_0_npy")
ASSET_V1_1 = os.path.join(
    os.path.dirname(__file__), "assets", "v1_1_zero_normal"
)


def _copy_asset(tmp_path, src=ASSET):
    dst = str(tmp_path / "db")
    shutil.copytree(src, dst)
    return dst


def _zero_normal_splits(st) -> list[int]:
    f = st.forest
    split = np.nonzero(f.kind == KIND_SPLIT)[0]
    if f.normals is None or not split.size:
        return []
    rows = f.ptr[split]
    zero = ~np.any(f.normals[rows] != 0, axis=1)
    return [int(n) for n in split[zero]]


def test_v1_0_asset_reads_before_upgrade(tmp_path):
    """The loader reads the old format directly (the version-generic
    read-codec role, reference: src/node.rs:285-341)."""
    db = Database(_copy_asset(tmp_path))
    for idx, metric in ((0, "euclidean"), (1, "binary quantized cosine")):
        r = Reader.open(db.read(), idx, db, metric=metric)
        assert r.version() == V1_0_0
        r.assert_validity()
        got = r.nns(5).by_item(3)
        # BQ quantization can tie several items at distance 0 with item 3
        assert got and got[0][1] == pytest.approx(0.0)
        assert 3 in [i for i, d in got if d == pytest.approx(0.0)]


def test_upgrade_v1_0_to_current(tmp_path):
    """Real exercised migration: 1.0.0 npy -> 1.1.0 container, query
    parity across the upgrade (reference: src/tests/upgrade.rs:60-96)."""
    path = _copy_asset(tmp_path)
    db = Database(path)
    before = {
        idx: Reader.open(db.read(), idx, db, metric=m).nns(10).by_item(7)
        for idx, m in ((0, "euclidean"), (1, "binary quantized cosine"))
    }
    touched = upgrade_all(db)
    assert touched == [0, 1]

    # a fresh process sees container-format generations at 1.1.0
    db2 = Database(path)
    for idx, metric in ((0, "euclidean"), (1, "binary quantized cosine")):
        st = db2.read().state(idx)
        assert st.version == CURRENT_VERSION
        gen_dir = os.path.join(
            path, f"idx_{idx:05d}", f"gen_{st.generation:08d}"
        )
        meta = json.load(open(os.path.join(gen_dir, "meta.json")))
        assert meta["store"] == "container"
        assert meta["version"] == str(CURRENT_VERSION)
        assert os.path.exists(os.path.join(gen_dir, "state.atc"))
        r = Reader.open(db2.read(), idx, db2, metric=metric)
        r.assert_validity()
        assert r.nns(10).by_item(7) == before[idx]

    # idempotent
    assert upgrade_all(db2) == []


def test_v1_1_asset_reads_before_upgrade(tmp_path):
    """The v1.1 zero-normal pattern loads and queries as-is (the
    version-generic read-codec role) — both f32 and packed-BQ rows."""
    db = Database(_copy_asset(tmp_path, ASSET_V1_1))
    for idx, metric in ((0, "euclidean"), (1, "binary quantized cosine")):
        r = Reader.open(db.read(), idx, db, metric=metric)
        assert r.version() == V1_1_0
        r.assert_validity()
        st = db.read().state(idx)
        assert _zero_normal_splits(st), "asset lost its legacy pattern"
        got = r.nns(5).by_item(2)
        assert got and got[0][1] == pytest.approx(0.0)


def test_upgrade_v1_1_zero_normals_to_none(tmp_path):
    """The 1.1.0 → 1.2.0 migration is real node surgery: zero-normal
    KIND_SPLIT nodes become KIND_SPLIT_NONE, the normals matrix drops
    their rows, and query results are unchanged (the reference's
    0.6→0.7 zero-normal rewrite, src/upgrade.rs:249-258)."""
    path = _copy_asset(tmp_path, ASSET_V1_1)
    db = Database(path)
    before = {}
    legacy = {}
    for idx, metric in ((0, "euclidean"), (1, "binary quantized cosine")):
        st = db.read().state(idx)
        legacy[idx] = _zero_normal_splits(st)
        assert legacy[idx]
        before[idx] = {
            "nns": [
                Reader.open(db.read(), idx, db, metric=metric)
                .nns(10)
                .by_item(i)
                for i in (0, 2, 7)
            ],
            "rows": len(st.forest.normals),
            "none": int(np.sum(st.forest.kind == KIND_SPLIT_NONE)),
        }

    assert upgrade_all(db) == [0, 1]

    db2 = Database(path)  # fresh process
    for idx, metric in ((0, "euclidean"), (1, "binary quantized cosine")):
        st = db2.read().state(idx)
        assert st.version == CURRENT_VERSION
        # surgery happened: no zero-normal splits remain, each legacy
        # node is now KIND_SPLIT_NONE, and its row left the matrix
        assert _zero_normal_splits(st) == []
        for nid in legacy[idx]:
            assert int(st.forest.kind[nid]) == KIND_SPLIT_NONE
        assert len(st.forest.normals) == before[idx]["rows"] - len(legacy[idx])
        assert int(np.sum(st.forest.kind == KIND_SPLIT_NONE)) == (
            before[idx]["none"] + len(legacy[idx])
        )
        # live split rows survived intact and ptr was fixed up
        live = np.nonzero(st.forest.kind == KIND_SPLIT)[0]
        assert np.all(st.forest.ptr[live] == np.arange(live.size))
        r = Reader.open(db2.read(), idx, db2, metric=metric)
        r.assert_validity()
        # nns parity across the upgrade.  The duplicate-heavy asset
        # corpus floods ties at distance 0, and tie order is not part of
        # the contract (the queue capacity legitimately shrinks with
        # n_splits): distances must match exactly, ids must match
        # wherever the distance is unique.
        after = [r.nns(10).by_item(i) for i in (0, 2, 7)]
        for rows_a, rows_b in zip(after, before[idx]["nns"]):
            da = [d for _, d in rows_a]
            db_ = [d for _, d in rows_b]
            assert da == pytest.approx(db_)
            for (ia, d1), (ib, d2) in zip(rows_a, rows_b):
                if da.count(d1) == 1:
                    assert ia == ib, (d1, ia, ib)
        # stats now classifies the legacy nodes as dummy normals
        assert sum(t.dummy_normals for t in r.stats().tree_stats) >= len(
            legacy[idx]
        )

    assert upgrade_all(db2) == []  # idempotent


def test_upgrade_chain_v1_0_runs_both_steps(tmp_path):
    """A v1.0 database walks the full chain to 1.2.0 in one call."""
    path = _copy_asset(tmp_path)
    db = Database(path)
    upgrade_all(db)
    for idx in (0, 1):
        st = Database(path).read().state(idx)
        assert st.version == CURRENT_VERSION
        assert _zero_normal_splits(st) == []


def test_upgraded_index_keeps_working_incrementally(tmp_path):
    """Post-upgrade the index accepts incremental updates like any other."""
    path = _copy_asset(tmp_path)
    db = Database(path)
    upgrade_index(db, 0)
    w = Writer(db, 0, 8)
    x = random_vectors(4, 8, seed=9)
    with db.write() as t:
        for i in range(4):
            w.add_item(t, 100 + i, x[i])
        w.del_item(t, 0)
        w.builder(seed=5).build(t)
    r = Reader.open(db.read(), 0, db)
    assert r.version() == CURRENT_VERSION
    r.assert_validity()
    assert not r.contains_item(0)
    assert r.contains_item(103)


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
