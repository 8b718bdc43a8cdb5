"""The compiled serving handle (Reader.searcher)."""

import jax
import numpy as np

from arroy_tpu import ItemSet

from .util import build_db, random_vectors


def test_searcher_matches_query_builder():
    x = random_vectors(300, 16, seed=1)
    db, w, r = build_db(x, n_trees=4)
    q = x[:16]
    want = r.nns(5).search_k(2000).by_vectors(q)
    s = r.searcher(5, search_k=2000, rescore="exact")
    got = s(q)
    assert got == want


def test_searcher_device_fn_pipeline():
    x = random_vectors(200, 16, seed=2)
    db, w, r = build_db(x, n_trees=2)
    s = r.searcher(5, search_k=500)
    dq = s.prepare_queries(x[:8])
    outs = [s.device_fn(*dq) for _ in range(3)]
    jax.block_until_ready(outs)
    ids = np.asarray(outs[-1][0])
    assert ids.shape[0] == 8
    assert int(ids[0][0]) == 0


def test_searcher_with_candidates():
    x = random_vectors(150, 8, seed=3)
    db, w, r = build_db(x, n_trees=2)
    filt = ItemSet([2, 4, 8, 16, 32])
    s = r.searcher(5, search_k=10**6, candidates=filt)
    got = s(x[:4])
    for row in got:
        assert set(i for i, _ in row) <= {2, 4, 8, 16, 32}
        assert len(row) == 5


def test_searcher_snapshot_isolation():
    from arroy_tpu import Reader

    x = random_vectors(100, 8, seed=4)
    db, w, r = build_db(x, n_trees=2)
    s = r.searcher(3, search_k=10**6)
    with db.write() as wtxn:
        w.del_item(wtxn, 0)
        w.builder(seed=9).n_trees(2).build(wtxn)
    # the old handle still answers from its snapshot
    got = s(x[:1])
    assert got[0][0][0] == 0
    # a new reader sees the delete
    r2 = Reader.open(db.read(), 0, db)
    got2 = r2.searcher(3, search_k=10**6)(x[:1])
    assert got2[0][0][0] != 0


def test_searcher_on_empty_index():
    from arroy_tpu import Database, Reader, Writer

    db = Database()
    w = Writer(db, 0, 4)
    with db.write() as wtxn:
        w.builder(seed=1).build(wtxn)
    r = Reader.open(db.read(), 0, db)
    s = r.searcher(5)
    assert s(np.zeros((3, 4), np.float32)) == [[], [], []]


def test_device_footprint_accounting():
    from arroy_tpu.device import DeviceIndex

    from .util import build_db, random_vectors

    x = random_vectors(600, 48, seed=11)
    db, w, r = build_db(x, metric="euclidean", n_trees=4)
    dev = r._device()
    actual = dev.nbytes()
    # at minimum the item matrix itself
    assert actual >= 600 * 48 * 4
    est = DeviceIndex.estimate_nbytes(r.metric, 48, 600, 4)
    # the pre-build estimate brackets reality within ~5x either way
    assert est / 5 <= actual <= est * 5


def test_rescore_matmul_scan_matches_exact():
    """The chunked matmul re-score (big-corpus mode), forced by shrinking
    the matrix budget, must rank like the exact gather re-score."""
    import arroy_tpu.search as sm
    import pytest

    mp = pytest.MonkeyPatch()
    x = random_vectors(600, 16, seed=9)
    db, w, r = build_db(x, n_trees=3)
    q = x[:12]
    want = r.searcher(5, search_k=10**6, rescore="exact")(q)
    try:
        mp.setattr(sm, "_RESCORE_MATRIX_BYTES", 1)
        mp.setattr(sm, "_EXACT_SCAN_CHUNK", 128)
        assert (
            sm.rescore_mode(r._state and r.metric or r.metric, 12, 1024, 600)
            == "matmul_scan"
        )
        got = r.searcher(5, search_k=10**6)(q)
    finally:
        mp.undo()
    for g, e in zip(got, want):
        assert [i for i, _ in g] == [i for i, _ in e]
        for (_, gd), (_, ed) in zip(g, e):
            # matmul distances carry f32 cancellation noise near zero
            # (documented caveat shared with _rescore_matmul)
            assert gd == pytest.approx(ed, rel=1e-4, abs=5e-3)


def test_two_tier_traversal_fallback_matches():
    """Force the optimistic small-queue pass to truncate on every query:
    the device-side fallback must reproduce the single-tier results."""
    import arroy_tpu.search as sm
    import pytest

    x = random_vectors(800, 16, seed=13)
    db, w, r = build_db(x, n_trees=4)
    q = x[:16]
    want = r.searcher(5, search_k=400, rescore="exact")(q)
    mp = pytest.MonkeyPatch()
    try:
        # pmax_small = min(pmax, 0*... + 1) = 1 -> truncates immediately
        mp.setattr(sm, "_SMALL_POPS_MULT", 0)
        mp.setattr(sm, "_SMALL_POPS_PAD", 1)
        got = r.searcher(5, search_k=400, rescore="exact")(q)
    finally:
        mp.undo()
    assert got == want


def test_two_tier_traversal_small_path_matches():
    """When the small queue suffices, results must equal the full path."""
    import arroy_tpu.search as sm
    import pytest

    x = random_vectors(800, 16, seed=14)
    db, w, r = build_db(x, n_trees=4)
    q = x[:16]
    want = r.searcher(5, search_k=60, rescore="exact")(q)
    mp = pytest.MonkeyPatch()
    try:
        # generous small budget, but force two_tier on by making the full
        # budget look huge relative to it
        mp.setattr(sm, "_SMALL_POPS_MULT", 8)
        mp.setattr(sm, "_SMALL_POPS_PAD", 64)
        got = r.searcher(5, search_k=60, rescore="exact")(q)
    finally:
        mp.undo()
    assert got == want


def test_multipop_traversal_recall_guard():
    """multipop=P deviates from strict best-first order (PARITY.md
    deviation): at equal search_k its recall must stay within a small
    delta of the single-pop reference order."""
    x = random_vectors(3000, 16, seed=21)
    db, w, r = build_db(x, n_trees=5)
    q = x[:32]
    oracle = r.exact_by_vectors(q, 10)
    o_sets = [set(i for i, _ in o) for o in oracle]

    def rec(got):
        return sum(
            len({i for i, _ in g} & s) for g, s in zip(got, o_sets)
        ) / (len(q) * 10)

    r1 = rec(r.searcher(10, search_k=600, engine="forest", multipop=1)(q))
    r8 = rec(r.searcher(10, search_k=600, engine="forest", multipop=8)(q))
    assert r8 >= r1 - 0.05, (r8, r1)


def test_multipop_exhaustive_matches_single_pop():
    # search_k >= n_items: both pop orders collect every item, so the
    # re-scored results must be identical
    x = random_vectors(500, 8, seed=22)
    db, w, r = build_db(x, n_trees=3)
    q = x[:8]
    a = r.searcher(5, search_k=10**6, engine="forest", multipop=1, rescore="exact")(q)
    b = r.searcher(5, search_k=10**6, engine="forest", multipop=8, rescore="exact")(q)
    assert a == b


def test_multipop_auto_resolution(monkeypatch):
    from arroy_tpu.search import resolve_multipop

    # auto = strict best-first at every scale (on-chip measurement:
    # P>1 is a large serving regression; results/forest_probe_r03.log)
    assert resolve_multipop(1000, "auto") == 1
    assert resolve_multipop(300_000, "auto") == 1
    assert resolve_multipop(300_000, 4) == 4
    monkeypatch.setenv("ARROY_MULTIPOP", "2")
    assert resolve_multipop(1000, "auto") == 2
