"""Persistence: atomic generation publishing, reload, multi-index."""

import os

import numpy as np
import pytest

from arroy_tpu import Database, Reader, Writer

from .util import random_vectors, recall


def test_save_and_reload(tmp_path):
    path = str(tmp_path / "db")
    x = random_vectors(120, 8, seed=1)
    db = Database(path)
    w = Writer(db, 0, 8)
    with db.write() as wtxn:
        for i in range(120):
            w.add_item(wtxn, i, x[i])
        w.builder(seed=1).n_trees(3).build(wtxn)
    r = Reader.open(db.read(), 0, db)
    want = r.nns(10).search_k(10**6).by_item(5)

    db2 = Database(path)
    r2 = Reader.open(db2.read(), 0, db2)
    assert r2.n_items() == 120
    assert r2.n_trees() == 3
    r2.assert_validity()
    got = r2.nns(10).search_k(10**6).by_item(5)
    assert got == want


def test_reload_preserves_updated_set(tmp_path):
    from arroy_tpu import NeedBuild

    path = str(tmp_path / "db")
    x = random_vectors(50, 4, seed=2)
    db = Database(path)
    w = Writer(db, 0, 4)
    with db.write() as wtxn:
        for i in range(50):
            w.add_item(wtxn, i, x[i])
        w.builder(seed=1).n_trees(2).build(wtxn)
    with db.write() as wtxn:
        w.del_item(wtxn, 0)
    # pending update survives reload and still blocks readers
    db2 = Database(path)
    with pytest.raises(NeedBuild):
        Reader.open(db2.read(), 0, db2)
    w2 = Writer(db2, 0, 4)
    with db2.write() as wtxn:
        w2.builder(seed=2).n_trees(2).build(wtxn)
    r = Reader.open(db2.read(), 0, db2)
    assert r.n_items() == 49


def test_multi_index(tmp_path):
    path = str(tmp_path / "db")
    db = Database(path)
    xa = random_vectors(60, 4, seed=3)
    xb = random_vectors(40, 6, seed=4)
    wa = Writer(db, 0, 4, metric="euclidean")
    wb = Writer(db, 7, 6, metric="cosine")
    with db.write() as wtxn:
        for i in range(60):
            wa.add_item(wtxn, i, xa[i])
        for i in range(40):
            wb.add_item(wtxn, i, xb[i])
        wa.builder(seed=1).n_trees(2).build(wtxn)
        wb.builder(seed=1).n_trees(2).build(wtxn)
    db2 = Database(path)
    ra = Reader.open(db2.read(), 0, db2, metric="euclidean")
    rb = Reader.open(db2.read(), 7, db2, metric="cosine")
    assert ra.n_items() == 60 and ra.dimensions() == 4
    assert rb.n_items() == 40 and rb.dimensions() == 6
    ra.assert_validity()
    rb.assert_validity()


def test_commit_is_atomic_generation(tmp_path):
    path = str(tmp_path / "db")
    x = random_vectors(30, 4, seed=5)
    db = Database(path)
    w = Writer(db, 0, 4)
    with db.write() as wtxn:
        for i in range(30):
            w.add_item(wtxn, i, x[i])
        w.builder(seed=1).n_trees(1).build(wtxn)
    manifest = os.path.join(path, "MANIFEST.json")
    assert os.path.exists(manifest)
    # a second commit bumps the generation and GCs the old one
    with db.write() as wtxn:
        w.add_item(wtxn, 100, x[0])
        w.builder(seed=2).n_trees(1).build(wtxn)
    gens = os.listdir(os.path.join(path, "idx_00000"))
    assert len(gens) == 1


def test_bq_roundtrip(tmp_path):
    path = str(tmp_path / "db")
    x = random_vectors(80, 40, seed=6)
    db = Database(path)
    w = Writer(db, 0, 40, metric="binary quantized euclidean")
    with db.write() as wtxn:
        for i in range(80):
            w.add_item(wtxn, i, x[i])
        w.builder(seed=1).n_trees(2).build(wtxn)
    db2 = Database(path)
    r = Reader.open(db2.read(), 0, db2, metric="binary quantized euclidean")
    # stored vectors decode to ±1
    v = r.item_vector(3)
    assert set(np.unique(v)) <= {-1.0, 1.0}
    r.assert_validity()


def test_drop_and_recreate_persists_new_data(tmp_path):
    """Regression: per-state generation counters restarted at 0 after
    drop_index+recreate, colliding with the old on-disk generation —
    save() skipped the write and the dropped corpus survived."""
    import numpy as np

    from arroy_tpu import Database, Reader, Writer

    root = str(tmp_path / "db")
    db = Database(root)
    w = Writer(db, 0, 8)
    with db.write() as t:
        w.add_items(t, np.arange(5, dtype=np.uint32), np.eye(5, 8, dtype=np.float32))
        w.builder(seed=1).n_trees(2).build(t)

    with db.write() as t:
        t.drop_index(0)
        w2 = Writer(db, 0, 8)
        w2.add_items(
            t, np.asarray([100, 101, 102], np.uint32), np.eye(3, 8, dtype=np.float32)
        )
        w2.builder(seed=2).n_trees(2).build(t)

    # same process: the device cache must not serve the dropped corpus
    r = Reader.open(db.read(), 0, db)
    assert sorted(int(i) for i in r.item_ids()) == [100, 101, 102]
    got = r.nns(3).by_vector(np.eye(1, 8, dtype=np.float32)[0])
    assert {i for i, _ in got} <= {100, 101, 102}

    # fresh process image: disk must hold the new corpus too
    db2 = Database(root)
    r2 = Reader.open(db2.read(), 0, db2)
    assert sorted(int(i) for i in r2.item_ids()) == [100, 101, 102]


def test_drop_only_commit_removes_index_from_disk(tmp_path):
    import numpy as np

    from arroy_tpu import Database, Writer

    root = str(tmp_path / "db")
    db = Database(root)
    w = Writer(db, 0, 4)
    with db.write() as t:
        w.add_items(t, np.arange(3, dtype=np.uint32), np.eye(3, 4, dtype=np.float32))
        w.builder(seed=1).n_trees(1).build(t)
    with db.write() as t:
        t.drop_index(0)
    db2 = Database(root)
    assert db2.read().state(0) is None
