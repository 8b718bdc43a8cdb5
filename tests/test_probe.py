"""Leaf-probe serving engine (probe.py): recall, dedup, metric coverage.

The probe engine is a documented deviation from the reference's
best-first traversal (PARITY.md): candidate selection is by per-tree
centroid-ranked blocks.  These tests pin (a) recall against the exact
oracle at a generous candidate budget, (b) no duplicate ids in results,
(c) parity of the result FORMAT with the classic engine, (d) behavior
across metrics and corpus edge cases.
"""

import numpy as np
import pytest

from arroy_tpu import Database, Reader, Writer


def _build(m=3000, dims=32, trees=8, metric="euclidean", seed=7):
    rng = np.random.default_rng(seed)
    parents = rng.standard_normal((16, dims)).astype(np.float32)
    pa, pb = rng.integers(16, size=m), rng.integers(16, size=m)
    mask = rng.random((m, dims)) < 0.5
    x = np.where(mask, parents[pa], parents[pb]).astype(np.float32)
    x += 0.05 * rng.standard_normal((m, dims)).astype(np.float32)
    db = Database()
    w = Writer(db, 0, dims, metric=metric)
    with db.write() as t:
        w.add_items(t, np.arange(m, dtype=np.uint32), x)
        w.builder(seed=seed).n_trees(trees).build(t)
    r = Reader.open(db.read(), 0, db, metric=metric)
    q = x[rng.integers(m, size=64)] + 0.01 * rng.standard_normal(
        (64, dims)
    ).astype(np.float32)
    return db, r, q


@pytest.mark.parametrize("metric", ["euclidean", "cosine", "dot-product"])
def test_probe_recall_vs_oracle(metric):
    db, r, q = _build(metric=metric)
    exact = r.exact_by_vectors(q, 10)
    ex = [set(i for i, _ in row) for row in exact]
    s = r.searcher(10, search_k=1200, engine="forest", traversal="probe",
                   probe_trees=4, probe_block=16)
    got = s(q)
    rec = np.mean([len(set(i for i, _ in g) & e) / 10 for g, e in zip(got, ex)])
    assert rec >= 0.9, f"{metric}: probe recall {rec}"


def test_probe_manhattan_l2_selection():
    # manhattan ranks blocks/slots by the L2 proxy then re-scores exact
    # L1 — recall bar is lower but must still be useful
    db, r, q = _build(metric="manhattan")
    exact = r.exact_by_vectors(q, 10)
    ex = [set(i for i, _ in row) for row in exact]
    s = r.searcher(10, search_k=1500, engine="forest", traversal="probe",
                   probe_trees=4, probe_block=16)
    got = s(q)
    rec = np.mean([len(set(i for i, _ in g) & e) / 10 for g, e in zip(got, ex)])
    assert rec >= 0.8, f"manhattan probe recall {rec}"


def test_probe_no_duplicate_ids():
    db, r, q = _build(trees=6)
    s = r.searcher(20, search_k=2000, engine="forest", traversal="probe",
                   probe_trees=6, probe_block=16)
    for row in s(q):
        ids = [i for i, _ in row]
        assert len(ids) == len(set(ids))


def test_probe_distances_match_reference_formulas():
    db, r, q = _build(metric="cosine")
    s = r.searcher(5, search_k=2000, engine="forest", traversal="probe",
                   probe_trees=4, probe_block=16)
    exact = {
        (qi, i): d
        for qi, row in enumerate(r.exact_by_vectors(q, 3000))
        for i, d in row
    }
    for qi, row in enumerate(s(q)):
        for i, d in row:
            assert abs(d - exact[(qi, i)]) < 1e-4


def test_probe_sorted_ascending():
    db, r, q = _build()
    s = r.searcher(10, search_k=1000, engine="forest", traversal="probe",
                   probe_block=16)
    for row in s(q):
        ds = [d for _, d in row]
        assert ds == sorted(ds)


def test_probe_tiny_corpus_and_few_trees():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((40, 8)).astype(np.float32)
    db = Database()
    w = Writer(db, 0, 8)
    with db.write() as t:
        w.add_items(t, np.arange(40, dtype=np.uint32), x)
        w.builder(seed=3).n_trees(2).build(t)
    r = Reader.open(db.read(), 0, db)
    s = r.searcher(5, search_k=40, engine="forest", traversal="probe",
                   probe_trees=8, probe_block=16)
    exact = r.exact_by_vectors(x[:8], 5)
    got = s(x[:8])
    for g, e in zip(got, exact):
        assert set(i for i, _ in g) == set(i for i, _ in e)


@pytest.mark.parametrize(
    "metric",
    [
        "binary quantized euclidean",
        "binary quantized manhattan",
        "binary quantized cosine",
    ],
)
def test_probe_bq_metric_native(metric):
    # binary-quantized metrics serve the probe natively (r5): packed
    # word blocks, XOR-popcount in-block ranking (ranking-exact), exact
    # popcount re-score.  Recall parity vs the strict traversal at the
    # same budget.
    rng = np.random.default_rng(5)
    m, dims = 2000, 64
    x = rng.standard_normal((m, dims)).astype(np.float32)
    db = Database()
    w = Writer(db, 0, dims, metric=metric)
    with db.write() as t:
        w.add_items(t, np.arange(m, dtype=np.uint32), x)
        w.builder(seed=5).n_trees(6).build(t)
    r = Reader.open(db.read(), 0, db, metric=metric)
    q = x[:32]
    exact = r.exact_by_vectors(q, 10)
    ex = [set(i for i, _ in row) for row in exact]
    sp = r.searcher(10, search_k=1200, engine="forest", traversal="probe",
                    probe_trees=4, probe_block=16)
    st = r.searcher(10, search_k=1200, engine="forest", traversal="xla")
    rec_p = np.mean(
        [len(set(i for i, _ in g) & e) / 10 for g, e in zip(sp(q), ex)]
    )
    rec_t = np.mean(
        [len(set(i for i, _ in g) & e) / 10 for g, e in zip(st(q), ex)]
    )
    assert rec_p >= rec_t - 0.05, (metric, rec_p, rec_t)
    assert rec_p >= 0.8, (metric, rec_p)


def test_probe_bq_metric_distances_exact():
    # probe-served BQ distances must match the reference popcount
    # formulas (the exact oracle), not the in-block estimates
    rng = np.random.default_rng(6)
    m, dims = 800, 64
    x = rng.standard_normal((m, dims)).astype(np.float32)
    db = Database()
    w = Writer(db, 0, dims, metric="binary quantized euclidean")
    with db.write() as t:
        w.add_items(t, np.arange(m, dtype=np.uint32), x)
        w.builder(seed=6).n_trees(4).build(t)
    r = Reader.open(db.read(), 0, db, metric="binary quantized euclidean")
    q = x[:8]
    s = r.searcher(5, search_k=800, engine="forest", traversal="probe",
                   probe_trees=4, probe_block=16)
    exact = {
        (qi, i): d
        for qi, row in enumerate(r.exact_by_vectors(q, m))
        for i, d in row
    }
    for qi, row in enumerate(s(q)):
        for i, d in row:
            assert abs(d - exact[(qi, i)]) < 1e-4


def test_probe_filtered_only_candidates():
    # filtered probe: every returned id is in the candidate set
    db, r, q = _build(m=3000)
    cand = np.arange(0, 3000, 3, dtype=np.uint32)  # 1/3 selectivity
    s = r.searcher(10, search_k=1200, engine="forest", traversal="probe",
                   probe_trees=4, probe_block=16, candidates=cand)
    allowed = set(int(i) for i in cand)
    for row in s(q):
        assert row, "filtered probe returned nothing"
        for i, _ in row:
            assert i in allowed


def test_probe_filtered_recall_parity_vs_traversal():
    # recall parity vs the strict filtered traversal at the same budget
    # (the filtered budget scales with 1/selectivity in both engines)
    db, r, q = _build(m=3000)
    cand = np.arange(0, 3000, 4, dtype=np.uint32)
    # exact filtered oracle: brute force over the candidate set
    st = r.searcher(10, search_k=1500, engine="exact", candidates=cand)
    ex = [set(i for i, _ in row) for row in st(q)]
    sp = r.searcher(10, search_k=1500, engine="forest", traversal="probe",
                    probe_trees=4, probe_block=16, candidates=cand)
    sx = r.searcher(10, search_k=1500, engine="forest", traversal="xla",
                    candidates=cand)
    rec_p = np.mean(
        [len(set(i for i, _ in g) & e) / 10 for g, e in zip(sp(q), ex)]
    )
    rec_x = np.mean(
        [len(set(i for i, _ in g) & e) / 10 for g, e in zip(sx(q), ex)]
    )
    assert rec_p >= rec_x - 0.05, (rec_p, rec_x)
    assert rec_p >= 0.85, rec_p


def test_probe_filtered_tiny_pool_exact():
    # pool <= search_k short-circuits to the full re-score (same
    # contract as the traversal's small-filter shortcut): exact results
    db, r, q = _build(m=3000)
    cand = np.asarray([5, 17, 99, 1234, 2999], dtype=np.uint32)
    s = r.searcher(3, search_k=1000, engine="forest", traversal="probe",
                   candidates=cand)
    st = r.searcher(3, search_k=1000, engine="exact", candidates=cand)
    for a, b in zip(s(q), st(q)):
        assert [i for i, _ in a] == [i for i, _ in b]


@pytest.mark.parametrize("metric", ["euclidean", "cosine", "dot-product"])
def test_probe_bq_tables_recall(metric):
    # packed sign-bit block tables (probe_dtype="bq"): in-block ranking
    # is XOR-popcount-estimated, the 3x-widened exact f32 re-score fixes
    # the final order — recall bar close to the bf16 tables
    db, r, q = _build(metric=metric)
    exact = r.exact_by_vectors(q, 10)
    ex = [set(i for i, _ in row) for row in exact]
    s = r.searcher(10, search_k=1500, engine="forest", traversal="probe",
                   probe_trees=4, probe_block=16, probe_dtype="bq")
    got = s(q)
    rec = np.mean([len(set(i for i, _ in g) & e) / 10 for g, e in zip(got, ex)])
    assert rec >= 0.85, f"{metric}: bq probe recall {rec}"


@pytest.mark.parametrize("metric", ["euclidean", "cosine", "dot-product"])
def test_probe_int8_tables_recall(metric):
    # per-item-max-abs int8 rows (half the bf16 footprint): ~0.4% dot
    # error means recall tracks the bf16 tables at the same budget
    db, r, q = _build(metric=metric)
    exact = r.exact_by_vectors(q, 10)
    ex = [set(i for i, _ in row) for row in exact]
    s = r.searcher(10, search_k=1200, engine="forest", traversal="probe",
                   probe_trees=4, probe_block=16, probe_dtype="int8")
    got = s(q)
    rec = np.mean([len(set(i for i, _ in g) & e) / 10 for g, e in zip(got, ex)])
    assert rec >= 0.9, f"{metric}: int8 probe recall {rec}"


def test_probe_int8_matches_bf16_selection():
    # int8 and bf16 tables should pick near-identical final top-k
    db, r, q = _build(metric="euclidean")
    kw = dict(search_k=1500, engine="forest", traversal="probe",
              probe_trees=4, probe_block=16)
    a = r.searcher(10, probe_dtype="bf16", **kw)(q)
    b = r.searcher(10, probe_dtype="int8", **kw)(q)
    agree = np.mean(
        [
            len({i for i, _ in ra} & {i for i, _ in rb}) / 10
            for ra, rb in zip(a, b)
        ]
    )
    assert agree >= 0.9, agree


def test_probe_auto_dtype_int8_tier():
    from arroy_tpu import probe as probe_mod

    db, r, q = _build(m=500, dims=32)
    idx = r._device()
    old = probe_mod.PROBE_BYTES
    try:
        # budget fits 3 int8 trees but <4 bf16 trees -> int8 tier
        probe_mod.PROBE_BYTES = 3 * probe_mod._per_tree_bytes(idx, "int8")
        assert probe_mod.PROBE_BYTES < 4 * probe_mod._per_tree_bytes(idx, "bf16")
        assert probe_mod.auto_dtype(idx) == "int8"
        # starved below 3 int8 trees -> bq
        probe_mod.PROBE_BYTES = 3 * probe_mod._per_tree_bytes(idx, "int8") - 1
        assert probe_mod.auto_dtype(idx) == "bq"
    finally:
        probe_mod.PROBE_BYTES = old


def test_probe_bq_distances_are_exact_f32():
    # whatever the candidate tables store, reported distances come from
    # the exact f32 re-score and match the reference formulas
    db, r, q = _build(metric="cosine")
    s = r.searcher(5, search_k=2000, engine="forest", traversal="probe",
                   probe_trees=4, probe_block=16, probe_dtype="bq")
    exact = {
        (qi, i): d
        for qi, row in enumerate(r.exact_by_vectors(q, 3000))
        for i, d in row
    }
    for qi, row in enumerate(s(q)):
        for i, d in row:
            assert abs(d - exact[(qi, i)]) < 1e-4


def test_probe_auto_dtype_budget_policy():
    from arroy_tpu import probe as probe_mod

    db, r, q = _build(m=500, dims=32)
    idx = r._device()
    # generous budget -> bf16; starved budget -> packed sign bits
    old = probe_mod.PROBE_BYTES
    try:
        probe_mod.PROBE_BYTES = 64 << 30
        assert probe_mod.auto_dtype(idx) == "bf16"
        # below 4 bf16 trees the next tier is int8 (not straight to bq)
        probe_mod.PROBE_BYTES = 4 * probe_mod._per_tree_bytes(idx, "bf16") - 1
        assert probe_mod.auto_dtype(idx) == "int8"
    finally:
        probe_mod.PROBE_BYTES = old


def test_probe_bq_recall_monotonic_in_search_k():
    # regression (crossover_r03, 1M x 768): with sign-bit tables and a
    # FIXED exact-re-score cut, growing search_k grew the noisy
    # candidate pool while the same 2048 sign-ranked slots got the
    # exact re-score — recall DECREASED with search_k (0.82 -> 0.61).
    # the cut now tracks search_k/2 for bq, so more budget can only
    # widen the exactly-re-scored set.
    db, r, q = _build(m=4000, dims=64)
    exact = r.exact_by_vectors(q, 10)
    ex = [set(i for i, _ in row) for row in exact]

    def rec_at(sk):
        s = r.searcher(10, search_k=sk, engine="forest", traversal="probe",
                       probe_trees=4, probe_block=16, probe_dtype="bq")
        return np.mean(
            [len(set(i for i, _ in g) & e) / 10 for g, e in zip(s(q), ex)]
        )

    r1, r2, r3 = rec_at(400), rec_at(1600), rec_at(3200)
    assert r3 >= r2 - 0.02 and r2 >= r1 - 0.02, (r1, r2, r3)
    assert r3 >= 0.9, r3


def test_probe_search_k_scales_candidates():
    db, r, q = _build()
    lo = r.searcher(10, search_k=64, engine="forest", traversal="probe",
                    probe_block=16)
    hi = r.searcher(10, search_k=3000, engine="forest", traversal="probe",
                    probe_block=16)
    exact = r.exact_by_vectors(q, 10)
    ex = [set(i for i, _ in row) for row in exact]
    rec_lo = np.mean(
        [len(set(i for i, _ in g) & e) / 10 for g, e in zip(lo(q), ex)]
    )
    rec_hi = np.mean(
        [len(set(i for i, _ in g) & e) / 10 for g, e in zip(hi(q), ex)]
    )
    assert rec_hi >= rec_lo
    assert rec_hi >= 0.95


def test_probe_chunked_gather_parity():
    # past PROBE_GATHER_BYTES the block scoring runs as a lax.scan of
    # per-chunk winners + one final merge (the unchunked [B,C,P,d]
    # gather measured an 18.84G compile-time HBM OOM at B=256,
    # sk=16000, d=768).  chunked and single-shot paths must agree.
    from arroy_tpu import probe as probe_mod

    db, r, q = _build(m=2000, dims=32)
    kw = dict(search_k=1200, engine="forest", traversal="probe",
              probe_trees=4, probe_block=16)
    base = r.searcher(10, **kw)(q)
    old = probe_mod.PROBE_GATHER_BYTES
    try:
        probe_mod.PROBE_GATHER_BYTES = 1  # force ch=1 (one block/step)
        probe_mod._probe_impl.clear_cache()
        chunked = r.searcher(10, **kw)(q)
    finally:
        probe_mod.PROBE_GATHER_BYTES = old
        probe_mod._probe_impl.clear_cache()
    for a, b in zip(base, chunked):
        ia = [i for i, _ in a]
        ib = [i for i, _ in b]
        # approx_max_k tie/selection noise allows marginal swaps; the
        # candidate sets must be near-identical
        assert len(set(ia) & set(ib)) >= 9, (ia, ib)
