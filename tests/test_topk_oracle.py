"""Property test: device top-k selection vs a host heap oracle.

The reference property-tests `median_based_top_k` against a BinaryHeap
oracle (reference: src/tests/reader.rs:283-299).  Our replacement is the
dedup + `lax.top_k` pipeline in `search._rescore_batch`; the property
checked is identical: the k smallest (distance, id) pairs in order.
"""

import heapq

import jax.numpy as jnp
import numpy as np

from arroy_tpu.metrics import Euclidean
from arroy_tpu.search import _rescore_batch


def oracle_top_k(pairs, k):
    """k smallest (distance, id), ties by id — a sorted-heap oracle."""
    return sorted(pairs)[:k]


def test_rescore_matches_heap_oracle():
    rng = np.random.default_rng(0)
    m, d, cap, k = 64, 8, 48, 8
    rows = rng.standard_normal((m, d)).astype(np.float32)
    q = rng.standard_normal(d).astype(np.float32)
    # candidate slots with duplicates and invalid (-1) entries
    cand = rng.integers(0, m, cap).astype(np.int32)
    cand[5] = cand[6] = cand[7]  # forced duplicates
    cand[0] = -1
    cand[13] = -1

    ids, dists = _rescore_batch(
        Euclidean,
        d,
        k,
        jnp.asarray(rows),
        jnp.zeros(m),
        jnp.zeros(m),
        jnp.asarray(np.arange(m, dtype=np.uint32)),
        jnp.asarray(cand[None, :]),
        jnp.asarray(q[None, :]),
        jnp.zeros(1),
        jnp.zeros(1),
    )
    got = [
        (round(float(dd) ** 2, 4), int(ii))
        for ii, dd in zip(np.asarray(ids)[0], np.asarray(dists)[0])
        if not np.isnan(dd)
    ]

    uniq = sorted(set(int(c) for c in cand if c >= 0))
    pairs = [
        (round(float(np.sum((rows[c] - q) ** 2)), 4), c) for c in uniq
    ]
    want = oracle_top_k(pairs, k)
    assert [i for _, i in got] == [i for _, i in want]
    np.testing.assert_allclose(
        [dv for dv, _ in got], [dv for dv, _ in want], rtol=1e-3
    )


def test_rescore_all_invalid():
    ids, dists = _rescore_batch(
        Euclidean,
        4,
        4,
        jnp.zeros((4, 4)),
        jnp.zeros(4),
        jnp.zeros(4),
        jnp.asarray(np.arange(4, dtype=np.uint32)),
        jnp.full((1, 8), -1, jnp.int32),
        jnp.zeros((1, 4)),
        jnp.zeros(1),
        jnp.zeros(1),
    )
    assert np.isnan(np.asarray(dists)).all()


def test_fewer_candidates_than_k():
    rng = np.random.default_rng(1)
    rows = rng.standard_normal((10, 4)).astype(np.float32)
    cand = np.full(16, -1, np.int32)
    cand[0], cand[1] = 3, 7
    ids, dists = _rescore_batch(
        Euclidean,
        4,
        8,
        jnp.asarray(rows),
        jnp.zeros(10),
        jnp.zeros(10),
        jnp.asarray(np.arange(10, dtype=np.uint32)),
        jnp.asarray(cand[None, :]),
        jnp.asarray(rows[3][None, :]),
        jnp.zeros(1),
        jnp.zeros(1),
    )
    valid = ~np.isnan(np.asarray(dists)[0])
    assert valid.sum() == 2
    assert set(np.asarray(ids)[0][valid]) == {3, 7}
