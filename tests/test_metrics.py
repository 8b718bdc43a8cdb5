"""Distance formula parity with scalar oracles of the reference code."""

import jax.numpy as jnp
import numpy as np
import pytest

from arroy_tpu.metrics import (
    ALL_METRICS,
    BinaryQuantizedCosine,
    Cosine,
    DotProduct,
    Euclidean,
    Manhattan,
    metric_by_name,
)
from arroy_tpu.ops.binary import pack_bits_np, padded_dim


def test_registry_names():
    # exact reference names (src/distance/*.rs name())
    names = {m.name for m in ALL_METRICS}
    assert names == {
        "euclidean",
        "manhattan",
        "cosine",
        "dot-product",
        "binary quantized euclidean",
        "binary quantized manhattan",
        "binary quantized cosine",
    }
    for m in ALL_METRICS:
        assert metric_by_name(m.name) is m


def test_oversampling_defaults():
    # reference: DEFAULT_OVERSAMPLING = 3 for BQ metrics, 1 otherwise
    for m in ALL_METRICS:
        if m.binary:
            assert m.default_oversampling == 3
        else:
            assert m.default_oversampling == 1


def _rows(metric, x):
    return jnp.asarray(metric.encode_np(x))


def test_euclidean_distance():
    rng = np.random.default_rng(0)
    q = rng.standard_normal(16).astype(np.float32)
    X = rng.standard_normal((10, 16)).astype(np.float32)
    d = np.asarray(Euclidean.built_distance(jnp.asarray(q), 0.0, 0.0, jnp.asarray(X), 0.0, 0.0))
    np.testing.assert_allclose(d, np.sum((X - q) ** 2, axis=1), rtol=1e-5)
    n = np.asarray(Euclidean.normalized_distance(jnp.asarray(d), 16))
    np.testing.assert_allclose(n, np.sqrt(d), rtol=1e-6)


def test_manhattan_distance():
    rng = np.random.default_rng(1)
    q = rng.standard_normal(8).astype(np.float32)
    X = rng.standard_normal((5, 8)).astype(np.float32)
    d = np.asarray(Manhattan.built_distance(jnp.asarray(q), 0.0, 0.0, jnp.asarray(X), 0.0, 0.0))
    np.testing.assert_allclose(d, np.sum(np.abs(X - q), axis=1), rtol=1e-5)


def test_cosine_distance():
    rng = np.random.default_rng(2)
    q = rng.standard_normal(12).astype(np.float32)
    X = rng.standard_normal((6, 12)).astype(np.float32)
    qn = np.linalg.norm(q)
    Xn = np.linalg.norm(X, axis=1)
    d = np.asarray(
        Cosine.built_distance(jnp.asarray(q), qn, 0.0, jnp.asarray(X), jnp.asarray(Xn), 0.0)
    )
    cos = np.clip(np.sum(X * q, axis=1) / (Xn * qn), -1, 1)
    np.testing.assert_allclose(d, (1 - cos) / 2, rtol=1e-5, atol=1e-6)
    # zero norm → 0
    z = np.asarray(Cosine.built_distance(jnp.asarray(q), 0.0, 0.0, jnp.asarray(X), jnp.zeros(6), 0.0))
    np.testing.assert_array_equal(z, np.zeros(6))


def test_dot_product_distance_and_normalize():
    rng = np.random.default_rng(3)
    q = rng.standard_normal(9).astype(np.float32)
    X = rng.standard_normal((4, 9)).astype(np.float32)
    d = np.asarray(DotProduct.built_distance(jnp.asarray(q), 0.0, 0.0, jnp.asarray(X), 0.0, 0.0))
    np.testing.assert_allclose(d, -np.sum(X * q, axis=1), rtol=1e-5)
    # normalized flips the sign back: callers get the actual dot product
    np.testing.assert_allclose(
        np.asarray(DotProduct.normalized_distance(jnp.asarray(d), 9)), -d, rtol=1e-6
    )


def test_dot_preprocess_bachrach():
    rng = np.random.default_rng(4)
    X = rng.standard_normal((20, 6)).astype(np.float32)
    norms, extras = DotProduct.preprocess_np(X)
    raw = np.linalg.norm(X, axis=1)
    mx = raw.max()
    # header.norm = max², extra = sqrt(max² - ‖v‖²)  (src/distance/dot_product.rs:119-165)
    np.testing.assert_allclose(norms, np.full(20, mx * mx), rtol=1e-5)
    np.testing.assert_allclose(extras, np.sqrt(np.maximum(mx * mx - raw * raw, 0)), rtol=1e-4, atol=1e-3)
    # after embedding, every item has the same total norm
    total = np.sqrt(raw**2 + extras**2)
    np.testing.assert_allclose(total, np.full(20, mx), rtol=1e-5)


@pytest.mark.parametrize("name", [
    "binary quantized euclidean",
    "binary quantized manhattan",
    "binary quantized cosine",
])
def test_bq_distances_match_pm1_oracle(name):
    metric = metric_by_name(name)
    rng = np.random.default_rng(5)
    d = 100
    dp = padded_dim(d)
    q = rng.standard_normal(d).astype(np.float32)
    X = rng.standard_normal((7, d)).astype(np.float32)

    def pm1(v):
        out = -np.ones(v.shape[:-1] + (dp,), np.float32)
        out[..., :d] = np.where(~np.signbit(v), 1.0, -1.0)
        return out

    qr = jnp.asarray(pack_bits_np(q[None])[0])
    Xr = jnp.asarray(pack_bits_np(X))
    qn = metric.item_norms_np(pack_bits_np(q[None]), d)[0]
    Xn = jnp.asarray(metric.item_norms_np(pack_bits_np(X), d))
    got = np.asarray(metric.built_distance(qr, qn, 0.0, Xr, Xn, 0.0))

    qp, Xp = pm1(q), pm1(X)
    if name == "binary quantized euclidean":
        want = np.sum((Xp - qp) ** 2, axis=1)
    elif name == "binary quantized manhattan":
        want = np.sum(np.abs(Xp - qp), axis=1)
    else:
        pq = np.sum(Xp * qp, axis=1)
        want = (1 - pq / dp) / 2  # norms are sqrt(dp) each
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_bq_cosine_norm_is_sqrt_padded_dim():
    x = np.random.default_rng(6).standard_normal((3, 100)).astype(np.float32)
    rows = pack_bits_np(x)
    n = BinaryQuantizedCosine.item_norms_np(rows, 100)
    np.testing.assert_allclose(n, np.full(3, np.sqrt(128.0)), rtol=1e-6)


def test_margin_formula_euclidean():
    rng = np.random.default_rng(7)
    n = rng.standard_normal((3, 10)).astype(np.float32)
    q = rng.standard_normal(10).astype(np.float32)
    aux = rng.standard_normal(3).astype(np.float32)
    got = np.asarray(Euclidean.margin(jnp.asarray(n), jnp.asarray(aux), jnp.asarray(q), 1.0))
    np.testing.assert_allclose(got, aux + n @ q, rtol=1e-5)
