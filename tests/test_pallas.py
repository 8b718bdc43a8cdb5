"""Pallas kernels (interpret mode on CPU; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from arroy_tpu.ops.binary import pack_bits_np
from arroy_tpu.ops.pallas_kernels import (
    bq_hamming_matrix,
    bq_hamming_matrix_reference,
)


def test_hamming_matrix_matches_reference():
    rng = np.random.default_rng(0)
    q = pack_bits_np(rng.standard_normal((5, 100)).astype(np.float32))
    x = pack_bits_np(rng.standard_normal((37, 100)).astype(np.float32))
    got = np.asarray(bq_hamming_matrix(jnp.asarray(q), jnp.asarray(x), interpret=True))
    want = np.asarray(bq_hamming_matrix_reference(jnp.asarray(q), jnp.asarray(x)))
    np.testing.assert_array_equal(got, want)


def test_hamming_matrix_tile_boundaries():
    rng = np.random.default_rng(1)
    # sizes straddling the 128/512 tile edges
    q = rng.integers(0, 2**32, (130, 4), dtype=np.uint32)
    x = rng.integers(0, 2**32, (513, 4), dtype=np.uint32)
    got = np.asarray(bq_hamming_matrix(jnp.asarray(q), jnp.asarray(x), interpret=True))
    want = np.asarray(bq_hamming_matrix_reference(jnp.asarray(q), jnp.asarray(x)))
    np.testing.assert_array_equal(got, want)


def test_bq_exact_fast_matches_oracle():
    from .util import build_db, random_vectors

    x = random_vectors(300, 64, seed=2)
    db, w, r = build_db(x, metric="binary quantized euclidean", n_trees=2)
    q = random_vectors(6, 64, seed=3)
    a = r.exact_by_vectors(q, 10)
    b = r.exact_by_vectors(q, 10, fast=True)
    for ra, rb in zip(a, b):
        assert [i for i, _ in ra] == [i for i, _ in rb]
        np.testing.assert_allclose(
            [d for _, d in ra], [d for _, d in rb], rtol=1e-5, atol=1e-5
        )


# ---------------------------------------------------------------------------
# Pallas traversal kernel vs the XLA while-loop traversal
# ---------------------------------------------------------------------------


def _searcher_results(r, q, traversal, count=10, search_k=64):
    s = r.searcher(count, search_k=search_k, traversal=traversal)
    return s(q)


def test_pallas_traversal_matches_xla_euclidean():
    from .util import build_db, random_vectors

    x = random_vectors(500, 32, seed=4)
    db, w, r = build_db(x, metric="euclidean", n_trees=4, split_after=16)
    q = random_vectors(11, 32, seed=5)  # odd batch exercises QBLK padding
    got = _searcher_results(r, q, "pallas")
    want = _searcher_results(r, q, "xla")
    assert got == want


def test_pallas_traversal_matches_xla_bq_cosine():
    from .util import build_db, random_vectors

    x = random_vectors(400, 64, seed=6)
    db, w, r = build_db(x, metric="binary quantized cosine", n_trees=3, split_after=16)
    q = random_vectors(8, 64, seed=7)
    got = _searcher_results(r, q, "pallas", search_k=128)
    want = _searcher_results(r, q, "xla", search_k=128)
    assert got == want


def test_pallas_traversal_exhaustive_and_tiny_search_k():
    from .util import build_db, random_vectors

    x = random_vectors(200, 16, seed=8)
    db, w, r = build_db(x, metric="cosine", n_trees=2, split_after=8)
    q = random_vectors(5, 16, seed=9)
    for sk in (1, 4, 10_000):
        got = _searcher_results(r, q, "pallas", count=5, search_k=sk)
        want = _searcher_results(r, q, "xla", count=5, search_k=sk)
        assert got == want


def test_explicit_traversal_beats_env(monkeypatch):
    from arroy_tpu.search import pops_budget, traversal_mode

    from .util import build_db, random_vectors

    x = random_vectors(100, 16, seed=10)
    db, w, r = build_db(x, metric="euclidean", n_trees=2)
    idx = r._device()
    pmax = pops_budget(idx, 32, False)
    monkeypatch.setenv("ARROY_TRAVERSAL", "pallas")
    # env resolves "auto" but never an explicit argument
    assert traversal_mode(idx, False, pmax, 32, "auto") == "pallas"
    assert traversal_mode(idx, False, pmax, 32, "xla") == "xla"
    monkeypatch.setenv("ARROY_TRAVERSAL", "xla")
    assert traversal_mode(idx, False, pmax, 32, "pallas") == "pallas"
