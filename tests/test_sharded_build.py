"""Sharded single-forest build (parallel/build.py).

The VERDICT-r1 item-5 contract: building ONE forest with the per-level
compute sharded over a mesh must (a) produce a valid forest, (b) be
bit-identical for any mesh size (all cross-shard reductions are integer
or sum-with-zeros), and (c) serve queries at normal recall.
"""

import jax
import numpy as np
import pytest

from arroy_tpu import Database, Reader, Writer
from arroy_tpu.parallel.mesh import make_mesh

from .util import random_vectors


def _build(x, mesh, metric="euclidean", n_trees=4, split_after=32, seed=42):
    m, d = x.shape
    db = Database()
    w = Writer(db, 0, d, metric=metric)
    with db.write() as wtxn:
        w.add_items(wtxn, np.arange(m, dtype=np.uint32), x)
        b = w.builder(seed=seed).n_trees(n_trees).split_after(split_after)
        if mesh is not None:
            b.mesh(mesh)
        b.build(wtxn)
    return db


def _forests_equal(fa, fb):
    assert np.array_equal(fa.kind, fb.kind)
    assert np.array_equal(fa.left, fb.left)
    assert np.array_equal(fa.right, fb.right)
    assert np.array_equal(fa.ptr, fb.ptr)
    assert np.array_equal(fa.normals, fb.normals)
    assert np.array_equal(fa.aux, fb.aux)
    assert set(fa.leaves) == set(fb.leaves)
    for k in fa.leaves:
        assert np.array_equal(fa.leaves[k], fb.leaves[k])
    assert fa.roots == fb.roots


@pytest.mark.parametrize("metric", ["euclidean", "cosine", "dot-product", "binary quantized cosine"])
def test_mesh_size_invariance(metric):
    x = random_vectors(600, 16, seed=5)
    db1 = _build(x, make_mesh(1), metric=metric, n_trees=2, split_after=8)
    db8 = _build(x, make_mesh(8), metric=metric, n_trees=2, split_after=8)
    _forests_equal(db1.read().state(0).forest, db8.read().state(0).forest)


def test_sharded_build_validity_and_recall():
    x = random_vectors(2000, 16, seed=0)
    db = _build(x, make_mesh(8), n_trees=4, split_after=32)
    r = Reader.open(db.read(), 0, db)
    r.assert_validity()
    got = r.searcher(10, search_k=2000)(x[:32])
    exact = r.exact_by_vectors(x[:32], 10)
    hits = sum(
        len(set(i for i, _ in g) & set(i for i, _ in e)) for g, e in zip(got, exact)
    )
    assert hits / 320 >= 0.95


def test_sharded_build_duplicate_vectors_random_fallback():
    # all-identical vectors can never split by hyperplane: the 0.99
    # imbalance fallback must kick in (KIND_SPLIT_NONE) and terminate
    x = np.ones((100, 8), np.float32)
    db = _build(x, make_mesh(4), n_trees=2, split_after=4)
    r = Reader.open(db.read(), 0, db)
    r.assert_validity()
    st = r.stats()
    assert sum(t.dummy_normals for t in st.tree_stats) > 0


def test_sharded_build_then_incremental_update():
    # a mesh-built forest must interoperate with the normal incremental path
    x = random_vectors(500, 8, seed=2)
    db = _build(x, make_mesh(8), n_trees=2, split_after=16)
    w = Writer(db, 0, 8)
    with db.write() as wtxn:
        w.del_item(wtxn, 0)
        w.add_item(wtxn, 1000, x[0])
        w.builder(seed=7).n_trees(2).build(wtxn)  # single-chip incremental pass
    r = Reader.open(db.read(), 0, db)
    r.assert_validity()
    assert not r.contains_item(0)
    assert r.contains_item(1000)
    got = r.nns(5).search_k(10**6).by_item(1000)
    assert got[0][0] == 1000
