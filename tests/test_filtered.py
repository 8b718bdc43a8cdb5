"""Filtered-search paths: the small-filter exact bypass and the
selectivity-scaled pop budget (reference: src/reader.rs:345-360 — the
reference intersects its roaring candidates at every popped leaf)."""

import numpy as np

from arroy_tpu.utils.itemset import ItemSet

from .util import build_db, random_vectors


def _exact_filtered(r, q, cand_ids, k):
    exact = r.exact_by_vectors(q[None], r.n_items())[0]
    return [i for i, _ in exact if i in cand_ids][:k]


def test_small_filter_bypass_matches_exact():
    # filter pool <= search_k: make_search_fn skips traversal and re-scores
    # the whole filter set — results must equal exact search over the filter
    x = random_vectors(2000, 16, seed=11)
    db, w, r = build_db(x, n_trees=4, seed=11)
    cand = list(range(0, 2000, 40))  # 50 items
    got = r.nns(10).search_k(400).candidates(ItemSet(cand)).by_vector(x[123])
    ids = [i for i, _ in got]
    assert ids == _exact_filtered(r, x[123], set(cand), 10)


def test_small_filter_bypass_distances_are_normalized():
    x = random_vectors(500, 8, seed=5)
    db, w, r = build_db(x, n_trees=2, seed=5)
    got = r.nns(3).search_k(100).candidates(ItemSet([7])).by_vector(x[7])
    assert got[0][0] == 7
    assert abs(got[0][1]) < 1e-5  # normalized euclidean distance to itself


def test_mid_filter_traversal_recall(monkeypatch):
    # filter pool > search_k: traversal runs with a selectivity-scaled pop
    # budget instead of a full-forest walk; recall must stay high.
    # (Filtered searches on supported metrics route to the exact engine
    # at any scale; disable that to exercise the traversal's filtered
    # loop, which custom metrics still rely on.)
    import arroy_tpu.search as sm

    monkeypatch.setattr(sm, "exact_engine_supported", lambda m: False)
    m = 3000
    x = random_vectors(m, 16, seed=7)
    db, w, r = build_db(x, n_trees=6, seed=7)
    rng = np.random.default_rng(0)
    cand = np.sort(rng.choice(m, size=m // 2, replace=False))  # 50% selectivity
    cand_set = set(int(c) for c in cand)
    sk = 600  # < len(cand) so the bypass does not trigger
    hits = total = 0
    for q in range(5):
        got = r.nns(10).search_k(sk).candidates(ItemSet(cand)).by_vector(x[q])
        ids = [i for i, _ in got]
        assert set(ids) <= cand_set
        want = _exact_filtered(r, x[q], cand_set, 10)
        hits += len(set(ids) & set(want))
        total += len(want)
    assert hits / total >= 0.8, hits / total


def test_filter_budget_scales_with_selectivity():
    from arroy_tpu.search import pops_budget

    db, w, r = build_db(random_vectors(4000, 8, seed=3), n_trees=4, seed=3)
    dev = r._device()
    full = pops_budget(dev, 100, False, 1.0)
    half = pops_budget(dev, 100, False, 0.5)
    tenth = pops_budget(dev, 100, False, 0.1)
    assert full <= half <= tenth <= dev.n_nodes + len(dev.roots)
    assert half >= 2 * 100 * 2  # ~1/selectivity growth


def test_filtered_nns_is_traversal_semantic():
    """PARITY deviation 9 contract: `nns()` (the reference API shape)
    keeps traversal semantics for filtered queries — same results as an
    explicit `searcher(engine="forest")`, honoring the search_k budget —
    while `searcher()` (engine="auto") serves the masked exact engine at
    recall 1.0 over the filter set."""
    m = 3000
    x = random_vectors(m, 16, seed=9)
    db, w, r = build_db(x, n_trees=6, seed=9)
    rng = np.random.default_rng(1)
    cand = np.sort(rng.choice(m, size=m // 2, replace=False))
    cand_set = set(int(c) for c in cand)
    sk = 600  # < |filter|: the budget matters

    for q in range(3):
        via_nns = r.nns(10).search_k(sk).candidates(ItemSet(cand)).by_vector(x[q])
        forest = r.searcher(
            10, search_k=sk, candidates=ItemSet(cand), engine="forest"
        )(x[q][None])[0]
        assert via_nns == forest  # nns() == the reference-semantic traversal

        auto = r.searcher(10, search_k=sk, candidates=ItemSet(cand))(x[q][None])[0]
        want = _exact_filtered(r, x[q], cand_set, 10)
        assert [i for i, _ in auto] == want  # searcher() auto == exact
