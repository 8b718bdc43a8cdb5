"""Incremental insert/delete without full rebuild + MVCC snapshots.

Mirrors the reference incremental-update tests
(src/tests/writer.rs:391-758,1123-1241).
"""

import numpy as np
import pytest

from arroy_tpu import Database, NeedBuild, Reader, Writer

from .util import build_db, random_vectors


def test_incremental_add_items():
    x = random_vectors(300, 8, seed=1)
    db = Database()
    w = Writer(db, 0, 8)
    with db.write() as wtxn:
        for i in range(200):
            w.add_item(wtxn, i, x[i])
        w.builder(seed=1).n_trees(4).build(wtxn)
    with db.write() as wtxn:
        for i in range(200, 300):
            w.add_item(wtxn, i, x[i])
        w.builder(seed=2).n_trees(4).build(wtxn)
    r = Reader.open(db.read(), 0, db)
    assert r.n_items() == 300
    r.assert_validity()
    got = r.nns(5).by_item(250)
    assert got[0][0] == 250


def test_incremental_delete_items():
    x = random_vectors(300, 8, seed=2)
    db = Database()
    w = Writer(db, 0, 8)
    with db.write() as wtxn:
        for i in range(300):
            w.add_item(wtxn, i, x[i])
        w.builder(seed=1).n_trees(4).build(wtxn)
    with db.write() as wtxn:
        for i in range(100):
            w.del_item(wtxn, i)
        w.builder(seed=2).n_trees(4).build(wtxn)
    r = Reader.open(db.read(), 0, db)
    assert r.n_items() == 200
    r.assert_validity()
    got = r.nns(300).search_k(10**6).by_item(150)
    assert all(i >= 100 for i, _ in got)
    assert len(got) == 200


def test_delete_down_to_single_descendant():
    # deleting most items collapses the forest to the tiny-corpus path
    x = random_vectors(100, 8, seed=3)
    db = Database()
    w = Writer(db, 0, 8)
    with db.write() as wtxn:
        for i in range(100):
            w.add_item(wtxn, i, x[i])
        w.builder(seed=1).n_trees(4).build(wtxn)
    with db.write() as wtxn:
        for i in range(5, 100):
            w.del_item(wtxn, i)
        w.builder(seed=2).build(wtxn)
    r = Reader.open(db.read(), 0, db)
    assert r.n_items() == 5
    assert r.n_trees() == 1
    r.assert_validity()


def test_delete_everything():
    x = random_vectors(60, 8, seed=4)
    db = Database()
    w = Writer(db, 0, 8)
    with db.write() as wtxn:
        for i in range(60):
            w.add_item(wtxn, i, x[i])
        w.builder(seed=1).n_trees(2).build(wtxn)
    with db.write() as wtxn:
        for i in range(60):
            w.del_item(wtxn, i)
        w.builder(seed=2).build(wtxn)
    r = Reader.open(db.read(), 0, db)
    assert r.n_items() == 0
    assert r.nns(5).by_vector(x[0]) == []


def test_untouched_subtrees_keep_node_ids():
    # arroy's "don't rebuild what didn't change": node ids of untouched
    # regions survive an incremental build (src/tests/writer.rs:1123-1241)
    x = random_vectors(400, 8, seed=5)
    db = Database()
    w = Writer(db, 0, 8)
    with db.write() as wtxn:
        for i in range(400):
            w.add_item(wtxn, i, x[i])
        w.builder(seed=1).n_trees(2).build(wtxn)
    r1 = Reader.open(db.read(), 0, db)
    used1 = set(int(i) for i in r1._state.forest.used_node_ids())
    roots1 = list(r1._state.forest.roots)
    with db.write() as wtxn:
        w.add_item(wtxn, 400, random_vectors(1, 8, seed=6)[0])
        w.builder(seed=2).n_trees(2).build(wtxn)
    r2 = Reader.open(db.read(), 0, db)
    used2 = set(int(i) for i in r2._state.forest.used_node_ids())
    # roots unchanged, and the overwhelming majority of node ids survive
    assert list(r2._state.forest.roots) == roots1
    assert len(used1 & used2) / len(used1) > 0.8
    r2.assert_validity()


def test_node_id_recycling():
    # ids freed by deletions are reused before the counter grows
    x = random_vectors(300, 4, seed=7)
    db = Database()
    w = Writer(db, 0, 4)
    with db.write() as wtxn:
        for i in range(300):
            w.add_item(wtxn, i, x[i])
        w.builder(seed=1).n_trees(4).build(wtxn)
    r1 = Reader.open(db.read(), 0, db)
    max1 = int(r1._state.forest.used_node_ids().max())
    with db.write() as wtxn:
        for i in range(150):
            w.del_item(wtxn, i)
        w.builder(seed=2).n_trees(4).build(wtxn)
    with db.write() as wtxn:
        for i in range(150):
            w.add_item(wtxn, i, x[i])
        w.builder(seed=3).n_trees(4).build(wtxn)
    r3 = Reader.open(db.read(), 0, db)
    max3 = int(r3._state.forest.used_node_ids().max())
    # the node-id space did not balloon: holes were recycled
    assert max3 <= max1 + int(max1 * 0.5) + 8
    r3.assert_validity()


def test_mvcc_query_during_write():
    x = random_vectors(100, 8, seed=8)
    db = Database()
    w = Writer(db, 0, 8)
    with db.write() as wtxn:
        for i in range(100):
            w.add_item(wtxn, i, x[i])
        w.builder(seed=1).n_trees(2).build(wtxn)
    r = Reader.open(db.read(), 0, db)  # snapshot taken here
    wtxn = db.write()
    w.del_item(wtxn, 0)
    w.add_item(wtxn, 500, x[0])
    # the open reader still sees the old committed state
    got = r.nns(3).by_item(0)
    assert got[0][0] == 0
    assert r.n_items() == 100
    wtxn.abort()


def test_abort_rolls_back():
    x = random_vectors(50, 8, seed=9)
    db, w, r = build_db(x, n_trees=2)
    wtxn = db.write()
    w.del_item(wtxn, 0)
    wtxn.abort()
    r2 = Reader.open(db.read(), 0, db)  # no NeedBuild: the delete was rolled back
    assert r2.n_items() == 50


def test_overwrite_vector_moves_item():
    x = random_vectors(200, 8, seed=10)
    db = Database()
    w = Writer(db, 0, 8)
    with db.write() as wtxn:
        for i in range(200):
            w.add_item(wtxn, i, x[i])
        w.builder(seed=1).n_trees(4).build(wtxn)
    # move item 0 exactly onto item 150
    with db.write() as wtxn:
        w.add_item(wtxn, 0, x[150])
        w.builder(seed=2).n_trees(4).build(wtxn)
    r = Reader.open(db.read(), 0, db)
    r.assert_validity()
    got = r.nns(2).search_k(10**6).by_item(150)
    assert {i for i, _ in got} == {0, 150}


def test_dot_product_preprocess_recomputed_incrementally():
    # the Bachrach extra dimension depends on the corpus max norm; adding
    # a much larger vector changes every item's embedding and the next
    # build must recompute it (reference: dot_product preprocess runs per
    # build over the current items)
    x = random_vectors(100, 8, seed=20)
    db = Database()
    w = Writer(db, 0, 8, metric="dot-product")
    with db.write() as wtxn:
        for i in range(100):
            w.add_item(wtxn, i, x[i])
        w.builder(seed=1).n_trees(3).build(wtxn)
    r1 = Reader.open(db.read(), 0, db, metric="dot-product")
    got1 = r1.nns(5).search_k(10**6).by_vector(x[0])
    exact1 = r1.exact_by_vectors(x[0][None], 5)[0]
    assert [i for i, _ in got1] == [i for i, _ in exact1]

    with db.write() as wtxn:
        w.add_item(wtxn, 500, (x[1] * 50.0))  # new max-norm item
        w.builder(seed=2).n_trees(3).build(wtxn)
    r2 = Reader.open(db.read(), 0, db, metric="dot-product")
    r2.assert_validity()
    got2 = r2.nns(5).search_k(10**6).by_vector(x[0])
    exact2 = r2.exact_by_vectors(x[0][None], 5)[0]
    assert [i for i, _ in got2] == [i for i, _ in exact2]
    assert got2[0][0] == 500  # the huge vector dominates by dot product


def test_route_chunking_matches_single_chunk(monkeypatch):
    """Multi-chunk device routing must land items on the same leaves as
    one big chunk (margins are deterministic; only the random-side
    threefry stream is per-chunk, and these trees have real normals)."""
    import arroy_tpu.builder as builder_mod

    def run(chunk):
        if chunk:
            monkeypatch.setattr(builder_mod, "_ROUTE_CHUNK", chunk)
        x = random_vectors(400, 8, seed=31)
        db = Database()
        w = Writer(db, 0, 8)
        with db.write() as wtxn:
            w.add_items(wtxn, np.arange(300, dtype=np.uint32), x[:300])
            w.builder(seed=7).n_trees(3).build(wtxn)
        with db.write() as wtxn:
            w.add_items(wtxn, np.arange(300, 400, dtype=np.uint32), x[300:])
            w.builder(seed=8).n_trees(3).build(wtxn)
        r = Reader.open(db.read(), 0, db)
        r.assert_validity()
        f = r._state.forest
        return {nid: tuple(f.leaves[nid].tolist()) for nid in f.leaves}

    # 300 lanes over 3 roots = 900 entries; chunk=256 forces 4 chunks
    assert run(None) == run(256)


def test_device_mirror_incremental_sync():
    """The persistent device mirror must be bit-identical to a fresh
    upload after puts, deletes, capacity growth, and clone divergence."""
    from arroy_tpu.metrics import resolve_metric
    from arroy_tpu.models.items import ItemStore

    met = resolve_metric("euclidean")
    s = ItemStore(met, 4)
    rng = np.random.default_rng(3)
    s.put_many(np.arange(10), rng.standard_normal((10, 4)).astype(np.float32))
    r1, n1, e1 = s.device_arrays()  # full upload
    np.testing.assert_array_equal(np.asarray(r1), s.rows())

    # dirty patch: overwrite 3, delete 1
    s.put(2, rng.standard_normal(4).astype(np.float32))
    s.delete(7)
    r2, n2, e2 = s.device_arrays()
    np.testing.assert_array_equal(np.asarray(r2), s.rows())
    np.testing.assert_array_equal(np.asarray(n2), s.norms())

    # capacity growth (put beyond current capacity pads the mirror)
    s.put_many(
        np.arange(100, 300), rng.standard_normal((200, 4)).astype(np.float32)
    )
    r3, _, _ = s.device_arrays()
    np.testing.assert_array_equal(np.asarray(r3), s.rows())

    # clone divergence: both clones sync; each must still match itself
    a, b = s.clone(), s.clone()
    a.put(0, np.ones(4, np.float32))
    ra, _, _ = a.device_arrays()
    np.testing.assert_array_equal(np.asarray(ra), a.rows())
    b.put(0, np.full(4, 2.0, np.float32))
    rb, _, _ = b.device_arrays()  # epoch mismatch -> full re-upload
    np.testing.assert_array_equal(np.asarray(rb), b.rows())
    # and the original, never mutated since its sync, still matches
    rs, _, _ = s.device_arrays()
    np.testing.assert_array_equal(np.asarray(rs), s.rows())


def test_device_mirror_idempotent_readd_is_free():
    """Re-upserting identical vectors must not dirty the device mirror
    (idempotent ingestion — and the warm-rebuild benchmark — must not
    re-pay the full host->device transfer), while any changed row, norm
    or preprocessed extra must."""
    from arroy_tpu.metrics import resolve_metric
    from arroy_tpu.models.items import ItemStore

    met = resolve_metric("euclidean")
    s = ItemStore(met, 4)
    rng = np.random.default_rng(7)
    x = rng.standard_normal((50, 4)).astype(np.float32)
    s.put_many(np.arange(50), x)
    s.device_arrays()
    assert not s._dirty

    # bytewise-identical re-add: nothing dirties, the epoch holds
    ep = s._epoch
    s.put_many(np.arange(50), x.copy())
    assert not s._dirty and s._epoch == ep

    # one changed row (and duplicate ids resolving last-wins to the OLD
    # value) dirty exactly the changed slot
    items = np.array([3, 3], np.uint32)
    vecs = np.stack([x[3] + 1.0, x[3]])
    s.put_many(items, vecs)  # last wins == old content -> clean
    assert not s._dirty
    s.put_many(np.array([5]), x[5:6] + 1.0)
    assert s._dirty == {int(s.slots_of(np.array([5]))[0])}
    r, n, e = s.device_arrays()
    np.testing.assert_array_equal(np.asarray(r), s.rows())
    np.testing.assert_array_equal(np.asarray(n), s.norms())

    # preprocessed extras reset to 0 by a re-add counts as a change
    sl = s.slots_of(np.arange(50))
    s.set_preprocess(s.norms()[sl], np.ones(50, np.float32), sl)
    s.device_arrays()
    s.put_many(np.arange(50), x)
    assert len(s._dirty) == 50
    _, _, e2 = s.device_arrays()
    np.testing.assert_array_equal(np.asarray(e2), s.extras())


def test_device_mirror_mostly_dirty_full_upload():
    """A mostly-dirty mirror takes the full-upload path; the result must
    still be bit-identical to the host arrays."""
    from arroy_tpu.metrics import resolve_metric
    from arroy_tpu.models.items import ItemStore

    met = resolve_metric("euclidean")
    s = ItemStore(met, 4)
    rng = np.random.default_rng(9)
    s.put_many(np.arange(64), rng.standard_normal((64, 4)).astype(np.float32))
    s.device_arrays()
    s.put_many(np.arange(40), rng.standard_normal((40, 4)).astype(np.float32))
    assert len(s._dirty) * 4 >= s.rows().shape[0]  # takes the full path
    r, n, e = s.device_arrays()
    np.testing.assert_array_equal(np.asarray(r), s.rows())
    np.testing.assert_array_equal(np.asarray(n), s.norms())
    np.testing.assert_array_equal(np.asarray(e), s.extras())
