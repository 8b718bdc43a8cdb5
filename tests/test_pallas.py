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
