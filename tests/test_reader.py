"""Reader behavior: errors, search_k extremes, filters, empty DBs.

Mirrors the reference reader tests (src/tests/reader.rs).
"""

import numpy as np
import pytest

from arroy_tpu import (
    Database,
    InvalidVecDimension,
    ItemSet,
    MissingMetadata,
    NeedBuild,
    Reader,
    UnmatchingDistance,
    Writer,
)

from .util import build_db, random_vectors


def test_open_unbuilt_is_missing_metadata():
    db = Database()
    with pytest.raises(MissingMetadata):
        Reader.open(db.read(), 0, db)


def test_open_wrong_distance():
    x = random_vectors(20, 4)
    db, w, r = build_db(x, metric="euclidean", n_trees=1)
    with pytest.raises(UnmatchingDistance):
        Reader.open(db.read(), 0, db, metric="cosine")


def test_open_needs_build_after_update():
    x = random_vectors(20, 4)
    db, w, r = build_db(x, n_trees=1)
    with db.write() as wtxn:
        w.del_item(wtxn, 0)
    with pytest.raises(NeedBuild):
        Reader.open(db.read(), 0, db)


def test_query_wrong_dimensions():
    x = random_vectors(20, 4)
    db, w, r = build_db(x, n_trees=1)
    with pytest.raises(InvalidVecDimension):
        r.nns(5).by_vector([1.0, 2.0])


def test_by_item_missing_returns_none():
    x = random_vectors(20, 4)
    db, w, r = build_db(x, n_trees=1)
    assert r.nns(5).by_item(999) is None


def test_two_dimension_on_a_line():
    # reference: src/tests/reader.rs line geometry sanity
    x = np.stack([np.arange(100, dtype=np.float32), np.zeros(100, np.float32)], axis=1)
    db, w, r = build_db(x, n_trees=10, seed=7)
    got = r.nns(5).search_k(1000).by_item(0)
    ids = [i for i, _ in got]
    assert ids[0] == 0
    assert set(ids) == {0, 1, 2, 3, 4}


def test_search_k_extremes():
    x = random_vectors(100, 8)
    db, w, r = build_db(x, n_trees=4)
    tiny = r.nns(10).search_k(1).by_item(0)
    assert len(tiny) >= 1
    huge = r.nns(10).search_k(10**9).by_item(0)
    exact = r.exact_by_vectors(x[0][None], 10)[0]
    assert [i for i, _ in huge] == [i for i, _ in exact]


def test_filtered_search():
    # reference: src/tests/reader.rs:194-227
    x = random_vectors(100, 8)
    db, w, r = build_db(x, n_trees=4)
    cands = ItemSet([1, 3, 4, 5, 6, 7, 8, 9, 15, 16])
    got = r.nns(20).candidates(cands).by_item(6)
    ids = [i for i, _ in got]
    assert set(ids) <= set(cands)
    assert len(ids) == len(cands)  # count > filter size → returns all of them
    # parity with exact search restricted to the filter
    exact = r.exact_by_vectors(x[6][None], 100)[0]
    exact_filtered = [i for i, _ in exact if i in cands][: len(cands)]
    assert set(ids) == set(exact_filtered)


def test_filter_single_candidate():
    x = random_vectors(50, 8)
    db, w, r = build_db(x, n_trees=2)
    got = r.nns(5).candidates(ItemSet([17])).by_item(3)
    assert [i for i, _ in got] == [17]


def test_empty_db_query():
    db = Database()
    w = Writer(db, 0, 4)
    with db.write() as wtxn:
        w.builder(seed=1).build(wtxn)
    r = Reader.open(db.read(), 0, db)
    assert r.n_items() == 0
    assert r.nns(5).by_vector([0.0, 0.0, 0.0, 0.0]) == []
    assert r.is_empty()


def test_distances_returned_are_normalized():
    x = random_vectors(50, 8)
    # euclidean: sqrt of squared distance
    db, w, r = build_db(x, n_trees=4)
    got = r.nns(3).search_k(10_000).by_vector(x[0])
    assert got[0][0] == 0
    assert got[0][1] == pytest.approx(0.0, abs=1e-5)
    d1 = np.linalg.norm(x[got[1][0]] - x[0])
    assert got[1][1] == pytest.approx(d1, rel=1e-4)


def test_cosine_query():
    x = random_vectors(80, 8)
    db, w, r = build_db(x, metric="cosine", n_trees=4)
    got = r.nns(5).search_k(10_000).by_vector(x[3])
    assert got[0][0] == 3
    assert got[0][1] == pytest.approx(0.0, abs=1e-5)
    exact = r.exact_by_vectors(x[3][None], 5)[0]
    assert [i for i, _ in got] == [i for i, _ in exact]


def test_dot_product_query():
    x = random_vectors(80, 8)
    db, w, r = build_db(x, metric="dot-product", n_trees=4)
    got = r.nns(5).search_k(10_000).by_vector(x[3])
    exact = r.exact_by_vectors(x[3][None], 5)[0]
    assert [i for i, _ in got] == [i for i, _ in exact]
    # returned value is the dot product itself (descending)
    dots = x @ x[3]
    best = int(np.argmax(dots))
    assert got[0][0] == best
    assert got[0][1] == pytest.approx(float(dots[best]), rel=1e-4)


def test_iter_items():
    x = random_vectors(10, 4)
    db, w, r = build_db(x, n_trees=1)
    items = dict(r.iter())
    assert set(items) == set(range(10))
    np.testing.assert_allclose(items[3], x[3], rtol=1e-6)


def test_stats():
    x = random_vectors(300, 8)
    db, w, r = build_db(x, n_trees=4, seed=11)
    s = r.stats()
    assert s.leaf == 300
    assert len(s.tree_stats) == 4
    for ts in s.tree_stats:
        assert ts.depth >= 1
        assert ts.split_nodes >= 1
        assert ts.descendants >= 1


def test_plot_dot_output():
    x = random_vectors(100, 8)
    db, w, r = build_db(x, n_trees=2)
    dot = r.plot_internals_tree_nodes()
    assert dot.startswith("digraph {")
    assert "root [color=blue]" in dot


def test_exact_fast_matches_oracle_ranking():
    from .util import build_db, random_vectors
    import numpy as np

    x = random_vectors(400, 32, seed=12)
    db, w, r = build_db(x, n_trees=2)
    q = random_vectors(8, 32, seed=13)  # queries distinct from items
    a = r.exact_by_vectors(q, 10)
    b = r.exact_by_vectors(q, 10, fast=True)
    for ra, rb in zip(a, b):
        # ranking-equivalent; distances agree to matmul cancellation noise
        assert [i for i, _ in ra] == [i for i, _ in rb]
        np.testing.assert_allclose(
            [d for _, d in ra], [d for _, d in rb], rtol=1e-3, atol=5e-3
        )


def test_oversampling_multiplies_search_k():
    # reference: src/reader.rs:330-335 — search_k defaults to count*n_trees,
    # multiplied by oversampling (or the metric's DEFAULT_OVERSAMPLING)
    x = random_vectors(300, 8, seed=14)
    db, w, r = build_db(x, n_trees=4)
    q = x[5]
    base = r.nns(10).search_k(10 * 4 * 3).by_vector(q)
    over = r.nns(10).oversampling(3).by_vector(q)  # 10*4 default * 3
    assert base == over


def test_bq_default_oversampling_is_3():
    # BQ metrics default to x3 oversampling
    # (reference: src/distance/binary_quantized_cosine.rs:36)
    x = random_vectors(300, 16, seed=15)
    db, w, r = build_db(x, metric="binary quantized cosine", n_trees=4)
    q = x[5]
    # default effective search_k = (count * n_trees) * 3; an explicit
    # search_k is ALSO multiplied by the metric default, so search_k(40)
    # is the equivalent explicit request (reference: src/reader.rs:330-335)
    default = r.nns(10).by_vector(q)
    explicit = r.nns(10).search_k(10 * 4).by_vector(q)
    assert default == explicit
