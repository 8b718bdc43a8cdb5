"""Forest-build correctness: determinism, validity, exactness, recall."""

import numpy as np
import pytest

from arroy_tpu import Reader
from arroy_tpu.models.forest import KIND_LEAF

from .util import build_db, random_vectors, recall

ALL_NAMES = [
    "euclidean",
    "manhattan",
    "cosine",
    "dot-product",
    "binary quantized euclidean",
    "binary quantized manhattan",
    "binary quantized cosine",
]


@pytest.mark.parametrize("metric", ALL_NAMES)
def test_build_valid_and_exhaustive_exact(metric):
    x = random_vectors(150, 16, seed=1)
    db, w, r = build_db(x, metric=metric, n_trees=4, seed=5)
    r.assert_validity()
    got = r.nns(10).search_k(10**8).by_vectors(x[:8])
    exact = r.exact_by_vectors(x[:8], 10)
    for g, e in zip(got, exact):
        # distances must agree pairwise; id order may differ only on ties
        gd = [d for _, d in g]
        ed = [d for _, d in e]
        np.testing.assert_allclose(gd, ed, rtol=1e-5, atol=1e-5)
        assert set(i for i, _ in g) | set(i for i, _ in e) == set(
            i for i, _ in g
        ) | set(i for i, _ in e)


def test_build_deterministic_same_seed():
    x = random_vectors(200, 8, seed=2)
    _, _, r1 = build_db(x, n_trees=3, seed=77)
    _, _, r2 = build_db(x, n_trees=3, seed=77)
    f1, f2 = r1._state.forest, r2._state.forest
    assert f1.roots == f2.roots
    np.testing.assert_array_equal(f1.kind, f2.kind)
    np.testing.assert_array_equal(f1.left, f2.left)
    np.testing.assert_array_equal(f1.right, f2.right)
    assert set(f1.leaves) == set(f2.leaves)
    for nid in f1.leaves:
        np.testing.assert_array_equal(f1.leaves[nid], f2.leaves[nid])
    np.testing.assert_array_equal(f1.normals, f2.normals)


def test_build_differs_across_seeds():
    x = random_vectors(200, 8, seed=2)
    _, _, r1 = build_db(x, n_trees=3, seed=1)
    _, _, r2 = build_db(x, n_trees=3, seed=2)
    f1, f2 = r1._state.forest, r2._state.forest
    same = (
        f1.normals.shape == f2.normals.shape
        and bool(np.all(f1.normals == f2.normals))
    )
    assert not same


def test_leaf_capacity_respected():
    x = random_vectors(400, 8, seed=3)
    db, w, r = build_db(x, n_trees=2, split_after=25)
    f = r._state.forest
    for nid, items in f.leaves.items():
        assert len(items) <= 25


def test_split_after_default_is_dimensions():
    x = random_vectors(100, 16, seed=4)
    db, w, r = build_db(x, n_trees=2)
    f = r._state.forest
    for nid, items in f.leaves.items():
        assert len(items) <= 16


@pytest.mark.parametrize("metric", ["euclidean", "cosine"])
def test_recall_at_default_search_k(metric):
    x = random_vectors(1000, 32, seed=5)
    db, w, r = build_db(x, metric=metric, n_trees=10, seed=6)
    q = x[:64]
    got = r.nns(10).search_k(10 * 10 * 20).by_vectors(q)
    exact = r.exact_by_vectors(q, 10)
    assert recall(got, exact) > 0.9


def test_bq_recall_with_oversampling():
    # binary quantization loses precision; with x3 oversampling the BQ
    # forest should still recover most of the BQ-exact neighbors
    x = random_vectors(500, 64, seed=7)
    db, w, r = build_db(x, metric="binary quantized cosine", n_trees=8, seed=8)
    got = r.nns(10).search_k(8 * 10 * 20).by_vectors(x[:32])
    exact = r.exact_by_vectors(x[:32], 10)
    assert recall(got, exact) > 0.75


def test_many_duplicate_vectors():
    # identical points force imbalance retries + random splits
    x = np.tile(random_vectors(4, 8, seed=9), (50, 1))
    db, w, r = build_db(x, n_trees=3, seed=10)
    r.assert_validity()
    got = r.nns(5).by_item(0)
    assert got[0][1] == pytest.approx(0.0, abs=1e-6)


def test_all_zero_vectors():
    x = np.zeros((100, 8), np.float32)
    db, w, r = build_db(x, n_trees=2, seed=11)
    r.assert_validity()
    got = r.nns(3).by_item(0)
    assert len(got) == 3


@pytest.mark.parametrize("corpus", ["gaussian", "duplicates"])
def test_lane_compaction_valid_deterministic_complete(monkeypatch, corpus):
    """Active-lane compaction (builder._compact_lanes): with thresholds
    forced tiny the frame compacts repeatedly mid-build.  The compacted
    build must stay valid, be run-to-run deterministic, put every item
    in every tree exactly once, and keep recall.  The duplicates corpus
    exercises random-fallback splits + zero-length leaf spans across
    compaction flushes."""
    import arroy_tpu.builder as builder_mod
    from .test_golden import dump_index

    monkeypatch.setattr(builder_mod, "_COMPACT_MIN_LANES", 512)
    monkeypatch.setattr(builder_mod, "_MARGIN_CHUNK", 1024)

    if corpus == "gaussian":
        x = random_vectors(3000, 16, seed=31)
    else:
        x = np.tile(random_vectors(8, 16, seed=32), (300, 1))
    _, _, r1 = build_db(x, n_trees=6, seed=33)
    r1.assert_validity()
    f = r1._state.forest
    assert len(f.roots) == 6
    for root in f.roots:
        items = []
        stack = [int(root)]
        while stack:
            nid = stack.pop()
            if nid in f.leaves:
                items.extend(int(i) for i in f.leaves[nid])
            else:
                stack.extend((int(f.left[nid]), int(f.right[nid])))
        assert sorted(items) == list(range(len(x))), "tree lost/duped items"

    _, _, r2 = build_db(x, n_trees=6, seed=33)
    assert dump_index(r1) == dump_index(r2), "compacted build not deterministic"

    if corpus == "gaussian":
        got = r1.nns(10).search_k(10**6).by_vectors(x[:8])
        exact = r1.exact_by_vectors(x[:8], 10)
        assert recall(got, exact) > 0.95


def test_lane_compaction_streaming_budget_build(monkeypatch):
    """Compaction under the low-memory streaming path: perm holds LOCAL
    batch indices there, so the flush must resolve ids through the
    remapped slot map.  Budget 2048 items -> 2048-lane skeleton batches;
    with the chunk floor at 512 the frame compacts once the active
    lanes drop under 1024."""
    import arroy_tpu.builder as builder_mod
    from arroy_tpu import Database, Writer

    monkeypatch.setattr(builder_mod, "_COMPACT_MIN_LANES", 512)
    monkeypatch.setattr(builder_mod, "_MARGIN_CHUNK", 512)
    x = random_vectors(3000, 8, seed=35)
    db = Database()
    w = Writer(db, 0, 8)
    with db.write() as wtxn:
        w.add_items(wtxn, np.arange(3000, dtype=np.uint32), x)
        # budget ~2/3 of the corpus: skeleton-from-sample + batched routing
        w.builder(seed=36).n_trees(3).available_memory(2048 * 8 * 4).build(wtxn)
    r = Reader.open(db.read(), 0, db)
    r.assert_validity()
    f = r._state.forest
    for root in f.roots:
        items = []
        stack = [int(root)]
        while stack:
            nid = stack.pop()
            if nid in f.leaves:
                items.extend(int(i) for i in f.leaves[nid])
            else:
                stack.extend((int(f.left[nid]), int(f.right[nid])))
        assert sorted(items) == list(range(3000)), "tree lost/duped items"


def test_grow_group_batching_keeps_trees_diverse(monkeypatch):
    """Seeds are grown in bounded groups (one grow pass per group); trees
    in different groups must still differ — a shared RNG key across
    groups would grow byte-identical trees from identical item sets."""
    import arroy_tpu.writer as writer_mod

    # cap = max(1 * split_after, dims + 1) = 17 < 120 items => every
    # seed (tree) lands in its own group
    monkeypatch.setattr(writer_mod, "_GROW_GROUP_SPLITS", 1)
    x = random_vectors(120, 16, seed=21)
    db, w, r = build_db(x, n_trees=4, seed=22)
    r.assert_validity()
    f = r._state.forest
    assert len(f.roots) == 4

    def tree_shape(root):
        # frozenset of leaf tuples — identical trees have identical shapes
        out = []
        stack = [root]
        while stack:
            nid = stack.pop()
            if nid in f.leaves:
                out.append(tuple(f.leaves[nid].tolist()))
            else:
                stack.extend((int(f.left[nid]), int(f.right[nid])))
        return frozenset(out)

    shapes = [tree_shape(rt) for rt in f.roots]
    assert len(set(shapes)) > 1, "grouped grow produced identical trees"

    # and recall is sane
    got = r.nns(10).search_k(10**6).by_vectors(x[:8])
    exact = r.exact_by_vectors(x[:8], 10)
    assert recall(got, exact) > 0.95


def test_grow_group_batching_matches_single_group():
    """With everything in one group (the default for small builds) the
    grouped path must be byte-identical to the ungrouped one."""
    x = random_vectors(300, 8, seed=23)
    _, _, r1 = build_db(x, n_trees=3, seed=24)
    f1 = r1._state.forest
    # independent build, same params: grouping thresholds don't change
    _, _, r2 = build_db(x, n_trees=3, seed=24)
    f2 = r2._state.forest
    assert f1.roots == f2.roots
    for nid in f1.leaves:
        np.testing.assert_array_equal(f1.leaves[nid], f2.leaves[nid])


def test_two_means_tie_updates_neither_centroid():
    """reference: src/distance/mod.rs:158-166 — `if di < dj {p} else if
    dj < di {q}`: an EXACT tie updates NEITHER centroid.  Ties are the
    norm for BQ metrics (integer training distances), so craft one: both
    centroid seeds are hamming-equidistant from every refinement draw."""
    import jax.numpy as jnp

    from arroy_tpu.builder import _two_means_core
    from arroy_tpu.metrics import BinaryQuantizedEuclidean as BQE
    from arroy_tpu.ops.binary import pack_bits_np

    d = 64
    p = np.ones(d, np.float32)               # +1^64
    q = -np.ones(d, np.float32)              # -1^64
    k = np.concatenate([np.ones(d // 2, np.float32), -np.ones(d // 2, np.float32)])
    rows = np.stack([p, q] + [k] * 10)       # [12, 64] -> packed [12, 2]
    srows = jnp.asarray(pack_bits_np(rows))[None]          # [1, 12, 2]
    zeros = jnp.zeros((1, 12), jnp.float32)
    normals, aux = _two_means_core(BQE, d, srows, zeros, zeros)
    # every draw ties (hamming 32 from both seeds) -> centroids stay at
    # the seeds -> normal = sign(p - q) = +1^64, bias = 0 exactly.
    expect_bits = np.asarray(pack_bits_np(np.ones((1, d), np.float32)))
    np.testing.assert_array_equal(np.asarray(normals[0])[None], expect_bits)
    assert float(aux[0]) == 0.0
