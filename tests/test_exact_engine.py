"""The exact serving engine (`Searcher(engine="exact")`).

On the MXU brute force beats the traversal outright for small/medium
corpora, so it is a first-class engine, not just the recall oracle.
Checks: parity with the oracle for every metric family, filter masking,
bf16 two-stage recall, and the auto engine rule.
"""

import numpy as np
import pytest

from arroy_tpu import Database, Reader, Writer
from arroy_tpu.utils.itemset import ItemSet

METRICS = [
    "euclidean",
    "cosine",
    "dot-product",
    "manhattan",
    "binary quantized euclidean",
]


def _build(metric, m=300, d=16, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((m, d)).astype(np.float32)
    db = Database()
    w = Writer(db, 0, d, metric=metric)
    with db.write() as t:
        w.add_items(t, np.arange(m, dtype=np.uint32), x)
        w.builder(seed=1).n_trees(4).build(t)
    r = Reader.open(db.read(), 0, db, metric=metric)
    q = rng.standard_normal((8, d)).astype(np.float32)
    return r, q


@pytest.mark.parametrize("metric", METRICS)
def test_exact_engine_matches_oracle(metric):
    r, q = _build(metric)
    oracle = r.exact_by_vectors(q, 10)
    s = r.searcher(10, engine="exact", precision="f32")
    got = s(q)
    for o, g in zip(oracle, got):
        # same ids at the same ranks modulo distance ties
        od = {i: d for i, d in o}
        assert len(g) == len(o)
        for (gi, gd), (oi, odist) in zip(g, o):
            assert gd == pytest.approx(odist, rel=1e-4, abs=1e-4)
            assert gi in od or gd == pytest.approx(odist, rel=1e-4, abs=1e-4)


def test_exact_engine_bf16_recall():
    r, q = _build("euclidean", m=2000, d=64, seed=3)
    oracle = r.exact_by_vectors(q, 10)
    s = r.searcher(10, engine="exact", precision="bf16")
    got = s(q)
    hits = sum(
        len({i for i, _ in g} & {i for i, _ in o}) for g, o in zip(got, oracle)
    )
    assert hits / (len(q) * 10) >= 0.95


def test_exact_engine_filtered():
    r, q = _build("euclidean", m=500, d=16, seed=5)
    allowed = ItemSet(np.arange(0, 500, 7, dtype=np.uint32))
    s = r.searcher(10, engine="exact", candidates=allowed, precision="f32")
    got = s(q)
    allow = set(range(0, 500, 7))
    for row in got:
        assert row and all(i in allow for i, _ in row)
    # parity with the filtered reference path
    ref = r.nns(10).search_k(10**6).candidates(allowed).by_vector(q[0])
    assert [i for i, _ in got[0]] == [i for i, _ in ref]


def test_auto_engine_picks_exact_small_and_forest_large(monkeypatch):
    r, q = _build("euclidean", m=200, d=8, seed=7)
    s = r.searcher(5, engine="auto")
    assert s.engine == "exact"
    monkeypatch.setenv("ARROY_EXACT_MAX_ITEMS", "100")
    s2 = r.searcher(5, engine="auto")
    assert s2.engine == "forest"


def test_default_searcher_is_auto_exact():
    """searcher()'s default engine is "auto", which resolves to the
    measured-fastest (exact) engine for supported metrics at any scale
    (VERDICT r2 item 1: the default serving path must match the
    measurements)."""
    r, q = _build("euclidean", m=400, d=8, seed=21)
    s = r.searcher(5)
    assert s.engine == "exact"
    oracle = r.exact_by_vectors(q, 5)
    got = s(q)
    for o, g in zip(oracle, got):
        assert [i for i, _ in g] == [i for i, _ in o]


def test_filtered_search_routes_exact_at_any_scale(monkeypatch):
    """Filtered searches on engine="auto" route through the exact engine
    regardless of corpus size (the >262k gate is gone): force the
    streaming-scan path with a tiny matrix budget and check exact
    filtered results.  (engine="forest" keeps traversal semantics for
    filters — pinned by test_filtered_nns_is_traversal_semantic.)"""
    import arroy_tpu.search as search_mod

    monkeypatch.setattr(search_mod, "_EXACT_DOTS_BYTES", 1)
    monkeypatch.setattr(search_mod, "_EXACT_SCAN_CHUNK", 128)
    r, q = _build("euclidean", m=900, d=16, seed=29)
    allowed = ItemSet(np.arange(0, 900, 3, dtype=np.uint32))
    got = r.searcher(10, search_k=100, engine="auto", candidates=allowed)(q)
    allow = set(range(0, 900, 3))
    oracle = r.exact_by_vectors(q, 900)
    for row, orc in zip(got, oracle):
        assert row and all(i in allow for i, _ in row)
        want = [i for i, _ in orc if i in allow][:10]
        assert [i for i, _ in row] == want


def test_exact_engine_empty_filter_and_dot():
    r, q = _build("dot-product", m=128, d=8, seed=11)
    oracle = r.exact_by_vectors(q, 5)
    s = r.searcher(5, engine="exact", precision="f32")
    got = s(q)
    for o, g in zip(oracle, got):
        assert [i for i, _ in g] == [i for i, _ in o]


@pytest.mark.parametrize("decode_budget", [0, 4 << 30])
@pytest.mark.parametrize(
    "metric",
    [
        "binary quantized euclidean",
        "binary quantized manhattan",
        "binary quantized cosine",
    ],
)
def test_exact_bq_scan_path_matches_matrix(metric, decode_budget, monkeypatch):
    """Both streaming BQ kernels (popcount over packed words, and the
    MXU ±1-bf16-decode matmul), forced by shrinking the distance-matrix
    budget, must agree with the full [B, M] popcount matrix exactly —
    hamming counts are exact integers on every path."""
    import arroy_tpu.search as search_mod

    r, q = _build(metric, m=700, d=24, seed=17)
    full = r.searcher(10, engine="exact")(q)
    monkeypatch.setattr(search_mod, "_EXACT_DOTS_BYTES", 1)  # force scan
    monkeypatch.setattr(search_mod, "_EXACT_SCAN_CHUNK", 128)
    monkeypatch.setattr(search_mod, "_BQ_DECODE_BYTES", decode_budget)
    scanned = r.searcher(10, engine="exact")(q)
    for f, s in zip(full, scanned):
        assert [i for i, _ in f] == [i for i, _ in s]
        for (_, fd), (_, sd) in zip(f, s):
            assert fd == pytest.approx(sd, rel=0, abs=0)


def test_exact_bq_scan_filtered(monkeypatch):
    import arroy_tpu.search as search_mod

    monkeypatch.setattr(search_mod, "_EXACT_DOTS_BYTES", 1)
    monkeypatch.setattr(search_mod, "_EXACT_SCAN_CHUNK", 128)
    r, q = _build("binary quantized euclidean", m=600, d=24, seed=19)
    allowed = ItemSet(np.arange(0, 600, 5, dtype=np.uint32))
    got = r.searcher(10, engine="exact", candidates=allowed)(q)
    allow = set(range(0, 600, 5))
    for row in got:
        assert row and all(i in allow for i, _ in row)


def test_exact_scan_path_matches_oracle(monkeypatch):
    """The chunked/streaming exact path (large-corpus mode), forced by
    shrinking the dot-matrix budget, must agree with the oracle."""
    import arroy_tpu.search as search_mod

    monkeypatch.setattr(search_mod, "_EXACT_DOTS_BYTES", 1)  # force scan
    monkeypatch.setattr(search_mod, "_EXACT_SCAN_CHUNK", 128)
    for metric in ("euclidean", "cosine", "dot-product"):
        r, q = _build(metric, m=700, d=24, seed=13)
        oracle = r.exact_by_vectors(q, 10)
        got = r.searcher(10, engine="exact", precision="f32x1")(q)
        hits = sum(
            len({i for i, _ in g} & {i for i, _ in o})
            for g, o in zip(got, oracle)
        )
        assert hits / (len(q) * 10) >= 0.95, metric
        # distances exact (f32 re-score stage)
        for g, o in zip(got, oracle):
            assert g[0][1] == pytest.approx(o[0][1], rel=1e-4, abs=1e-4)


def test_bf16_resident_serving(monkeypatch):
    """ARROY_SERVING_DTYPE=bf16 holds the item matrix in bfloat16 (half
    the HBM — the 4M x 768 configuration) and the exact engine re-scores
    from bf16 rows; recall vs a host f32 oracle must stay high."""
    import jax.numpy as jnp

    from arroy_tpu import Database, Reader, Writer

    rng = np.random.default_rng(31)
    m, d = 600, 32
    x = rng.standard_normal((m, d)).astype(np.float32)
    db = Database()
    w = Writer(db, 0, d)
    with db.write() as t:
        w.add_items(t, np.arange(m, dtype=np.uint32), x)
        w.builder(seed=1).n_trees(2).build(t)
    monkeypatch.setenv("ARROY_SERVING_DTYPE", "bf16")
    r = Reader.open(db.read(), 0, db)
    s = r.searcher(10, engine="exact", precision="bf16")
    assert s._dev.rows.dtype == jnp.bfloat16
    q = x[:8] + 0.01 * rng.standard_normal((8, d)).astype(np.float32)
    got = s(q)
    d2 = ((x[None, :, :] - q[:, None, :]) ** 2).sum(-1)
    want = np.argsort(d2, axis=1)[:, :10]
    hits = sum(
        len({i for i, _ in g} & set(map(int, wr))) for g, wr in zip(got, want)
    )
    assert hits / 80 >= 0.9, hits / 80


@pytest.mark.parametrize("precision", ["bf16", "int8"])
@pytest.mark.parametrize("cut_dtype", ["f32", "bf16"])
def test_exact_engine_cut_dtype_knob(monkeypatch, precision, cut_dtype):
    """ARROY_CUT_DTYPE forces the [B, M] cut-score matrix dtype for the
    two-stage modes (defaults are per-precision from the on-chip race,
    results/cut_dtype_r05.jsonl); either setting must keep top-k recall
    — bf16 rounding only reorders candidates near rank c, which the
    exact f32 re-score of the top-c washes out."""
    monkeypatch.setenv("ARROY_CUT_DTYPE", cut_dtype)
    r, q = _build("euclidean", m=2000, d=64, seed=7)
    oracle = r.exact_by_vectors(q, 10)
    s = r.searcher(10, engine="exact", precision=precision)
    got = s(q)
    hits = sum(
        len({i for i, _ in g} & {i for i, _ in o}) for g, o in zip(got, oracle)
    )
    assert hits / (len(q) * 10) >= 0.95


@pytest.mark.parametrize("metric", ["euclidean", "cosine", "dot-product"])
def test_exact_engine_int8_precision(metric):
    """Two-stage int8 (quantized MXU dots + exact f32 re-score): top-k
    must match the oracle on separable data — the ~0.4% dot error only
    reorders candidates near rank c, which the re-score fixes."""
    r, q = _build(metric, m=600, d=24, seed=33)
    oracle = r.exact_by_vectors(q, 10)
    s = r.searcher(10, engine="exact", precision="int8")
    got = s(q)
    hits = sum(
        len(set(i for i, _ in o) & set(i for i, _ in g))
        for o, g in zip(oracle, got)
    )
    assert hits / (len(q) * 10) >= 0.95, hits
