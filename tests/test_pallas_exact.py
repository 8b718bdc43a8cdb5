"""The fused Pallas exact-select stage (`ops/pallas_exact`).

The kernel replaces `matmul -> dequant -> approx_max_k` with one fused
pass (per-block top-2, nothing [B, M]-sized in HBM).  CPU checks run the
kernel in interpret mode: exact agreement with the jnp oracle on the
block winners, end-to-end recall through `make_exact_fn`, padding /
dead-slot / duplicate-id protections, and the unfused fallback.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from arroy_tpu.ops.pallas_exact import (
    DEAD_KEY_MAX,
    DEFAULT_BM,
    fused_block_select,
    fused_block_select_reference,
)


def _mk(b=8, m=4096, d=128, dtype="int8", seed=0):
    rng = np.random.default_rng(seed)
    qf = rng.standard_normal((b, d)).astype(np.float32)
    xf = rng.standard_normal((m, d)).astype(np.float32)
    if dtype == "int8":
        q = np.clip(np.round(qf * 20), -127, 127).astype(np.int8)
        x = np.clip(np.round(xf * 20), -127, 127).astype(np.int8)
    else:
        q = jnp.asarray(qf, jnp.bfloat16)
        x = jnp.asarray(xf, jnp.bfloat16)
    qsc = rng.random(b).astype(np.float32) + 0.5
    mult = rng.random(m).astype(np.float32) + 0.5
    add = rng.standard_normal(m).astype(np.float32)
    return (
        jnp.asarray(q), jnp.asarray(x), jnp.asarray(qsc),
        jnp.asarray(mult), jnp.asarray(add),
    )


@pytest.mark.parametrize("dtype", ["int8", "bf16"])
@pytest.mark.parametrize("bm", [256, 1024])
def test_kernel_matches_reference(dtype, bm):
    q, x, qsc, mult, add = _mk(dtype=dtype)
    keys, idx = fused_block_select(q, x, qsc, mult, add, bm=bm, interpret=True)
    rkeys, ridx = fused_block_select_reference(q, x, qsc, mult, add, bm=bm)
    keys, rkeys = np.asarray(keys, np.int64), np.asarray(rkeys, np.int64)
    # kernel and oracle are separately compiled expressions: XLA may fuse
    # `dots*p + add` into an FMA in one and not the other, shifting the
    # score by 1 ulp == one packed-key quantum; winners on such knife-edge
    # ties may differ, which the stage-2 exact re-score absorbs
    exact = keys == rkeys
    # <= 2*bm: one quantum of value plus any lane-bit difference
    assert np.abs(keys - rkeys).max() <= 2 * bm, "keys differ beyond 1 quantum"
    assert exact.mean() >= 0.98
    np.testing.assert_array_equal(
        np.asarray(idx)[exact], np.asarray(ridx)[exact]
    )


def test_kernel_dead_slots_never_win():
    q, x, qsc, mult, add = _mk(m=2048)
    add = add.at[100:1100].set(-np.inf)  # kill most of block 0/1
    keys, idx = fused_block_select(q, x, qsc, mult, add, bm=1024, interpret=True)
    idx = np.asarray(idx)
    keys = np.asarray(keys)
    dead = (idx >= 100) & (idx < 1100)
    assert not np.any(dead & (keys > DEAD_KEY_MAX)), "dead slot won a block"


def test_kernel_query_padding():
    # b=5 pads to the 8-row tile; padded queries must not leak
    q, x, qsc, mult, add = _mk(b=5, m=2048)
    keys, idx = fused_block_select(q, x, qsc, mult, add, bm=1024, interpret=True)
    rkeys, ridx = fused_block_select_reference(q, x, qsc, mult, add, bm=1024)
    assert keys.shape == (5, 4) and idx.shape == (5, 4)
    np.testing.assert_array_equal(np.asarray(keys), np.asarray(rkeys))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ridx))


def _fused_searcher_env(monkeypatch):
    monkeypatch.setenv("ARROY_FUSED_MIN_ITEMS", "0")
    monkeypatch.setenv("ARROY_EXACT_FUSED", "1")


@pytest.mark.parametrize("metric", ["euclidean", "cosine", "dot-product"])
@pytest.mark.parametrize("precision", ["int8", "bf16"])
def test_fused_exact_recall_end_to_end(monkeypatch, metric, precision):
    """make_exact_fn routes through the fused kernel and stays ≥0.9
    recall vs the oracle (per-block top-2 + value cut + exact re-score;
    the corpus is deliberately CLUSTER-ORDERED to exercise the
    decorrelating position shuffle)."""
    _fused_searcher_env(monkeypatch)
    from arroy_tpu import Database, Reader, Writer

    rng = np.random.default_rng(7)
    m, d = 64 * DEFAULT_BM // 16, 16  # 4096 items -> few blocks on CPU
    centers = rng.standard_normal((8, d)).astype(np.float32) * 3
    x = np.concatenate(
        [c + 0.3 * rng.standard_normal((m // 8, d)).astype(np.float32) for c in centers]
    )
    db = Database()
    w = Writer(db, 0, d, metric=metric)
    with db.write() as t:
        w.add_items(t, np.arange(m, dtype=np.uint32), x)
        w.builder(seed=1).n_trees(2).build(t)
    r = Reader.open(db.read(), 0, db, metric=metric)
    q = x[rng.integers(m, size=16)] + 0.05 * rng.standard_normal((16, d)).astype(
        np.float32
    )
    oracle = r.exact_by_vectors(q, 10)
    s = r.searcher(10, engine="exact", precision=precision)
    got = s(q)
    hits = sum(
        len({i for i, _ in g} & {i for i, _ in o}) for g, o in zip(got, oracle)
    )
    assert hits / (len(q) * 10) >= 0.9
    # distances of agreeing ids are the exact f32 re-scored values
    for g, o in zip(got, oracle):
        od = dict(o)
        for gi, gd in g:
            if gi in od:
                assert gd == pytest.approx(od[gi], rel=1e-4, abs=1e-4)


def test_fused_no_duplicate_ids(monkeypatch):
    """cap not a multiple of the block size: padding positions alias
    slot 0 through pos_to_slot; the value mask must keep them out."""
    _fused_searcher_env(monkeypatch)
    from arroy_tpu import Database, Reader, Writer

    rng = np.random.default_rng(3)
    m, d = DEFAULT_BM + 37, 8
    x = rng.standard_normal((m, d)).astype(np.float32)
    db = Database()
    w = Writer(db, 0, d, metric="euclidean")
    with db.write() as t:
        w.add_items(t, np.arange(m, dtype=np.uint32), x)
        w.builder(seed=1).n_trees(2).build(t)
    r = Reader.open(db.read(), 0, db, metric="euclidean")
    q = x[:4] + 0.01
    got = r.searcher(10, engine="exact", precision="int8")(q)
    for g in got:
        ids = [i for i, _ in g]
        assert len(ids) == len(set(ids)), f"duplicate ids: {ids}"


def test_fused_filtered_respects_candidates(monkeypatch):
    _fused_searcher_env(monkeypatch)
    from arroy_tpu import Database, Reader, Writer
    from arroy_tpu.utils.itemset import ItemSet

    rng = np.random.default_rng(5)
    m, d = 2 * DEFAULT_BM, 8
    x = rng.standard_normal((m, d)).astype(np.float32)
    db = Database()
    w = Writer(db, 0, d, metric="euclidean")
    with db.write() as t:
        w.add_items(t, np.arange(m, dtype=np.uint32), x)
        w.builder(seed=1).n_trees(2).build(t)
    r = Reader.open(db.read(), 0, db, metric="euclidean")
    allowed = np.arange(0, m, 3, dtype=np.uint32)
    s = r.searcher(
        10, engine="exact", precision="bf16", candidates=ItemSet(allowed)
    )
    got = s(x[:4])
    allow = set(allowed.tolist())
    for g in got:
        assert g, "filtered search returned nothing"
        for gi, _ in g:
            assert gi in allow


def test_fused_gate_small_corpus(monkeypatch):
    """Below the item gate the engine must silently use the unfused
    path (and still match the oracle)."""
    monkeypatch.setenv("ARROY_FUSED_MIN_ITEMS", "1000000000")
    from arroy_tpu import Database, Reader, Writer

    rng = np.random.default_rng(11)
    m, d = 500, 8
    x = rng.standard_normal((m, d)).astype(np.float32)
    db = Database()
    w = Writer(db, 0, d, metric="euclidean")
    with db.write() as t:
        w.add_items(t, np.arange(m, dtype=np.uint32), x)
        w.builder(seed=1).n_trees(2).build(t)
    r = Reader.open(db.read(), 0, db, metric="euclidean")
    q = x[:4] + 0.01
    oracle = r.exact_by_vectors(q, 5)
    got = r.searcher(5, engine="exact", precision="int8")(q)
    hits = sum(
        len({i for i, _ in g} & {i for i, _ in o}) for g, o in zip(got, oracle)
    )
    assert hits / (len(q) * 5) >= 0.9
