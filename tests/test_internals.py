"""The `internals` embedder surface (reference: src/lib.rs:110-142).

Covers leaf crafting/decoding, the raw storage-row access an embedding
application uses, the BQ bit codecs, and the custom-metric registration
extension point (the public `Distance` trait role) end-to-end through
build + persistence + query.
"""

import numpy as np
import pytest

from arroy_tpu import Database, Reader, Writer, internals
from arroy_tpu.errors import SizeMismatch
from arroy_tpu.metrics import Euclidean, metric_by_name


def test_craft_and_decode_leaf_f32():
    v = np.arange(6, dtype=np.float32) / 3.0
    leaf = internals.craft_leaf("euclidean", v)
    assert isinstance(leaf.header, internals.NodeHeaderEuclidean)
    assert leaf.metric_name == "euclidean"
    np.testing.assert_allclose(leaf.to_vector(), v)
    np.testing.assert_allclose(internals.decode_leaf("euclidean", leaf.vector, 6), v)


def test_craft_leaf_binary_quantized_roundtrip():
    v = np.array([0.5, -0.25, 0.0, -0.0, 3.0], np.float32)
    leaf = internals.craft_leaf("binary quantized cosine", v)
    assert isinstance(leaf.header, internals.NodeHeaderBinaryQuantizedCosine)
    assert leaf.vector.dtype == np.uint32
    # decode is the sign: >=0 (incl. +0.0) -> +1, negative (incl. -0.0) -> -1
    np.testing.assert_allclose(leaf.to_vector(), [1.0, -1.0, 1.0, -1.0, 1.0])
    # the raw pack codec agrees with the crafted row
    np.testing.assert_array_equal(internals.pack_bits_np(v[None, :])[0], leaf.vector)


def test_craft_leaf_rejects_matrix():
    with pytest.raises(SizeMismatch):
        internals.craft_leaf("euclidean", np.zeros((2, 3), np.float32))


def test_raw_leaf_matches_store():
    db = Database()
    w = Writer(db, 0, 4, metric="cosine")
    vec = np.array([3.0, 0.0, 4.0, 0.0], np.float32)
    with db.write() as t:
        w.add_item(t, 7, vec)
        w.add_item(t, 8, -vec)
        w.builder(seed=1).n_trees(2).build(t)
    r = Reader.open(db.read(), 0, db, metric="cosine")
    leaf = internals.raw_leaf(r, 7)
    assert isinstance(leaf.header, internals.NodeHeaderCosine)
    assert leaf.header.norm == pytest.approx(5.0)
    np.testing.assert_allclose(leaf.to_vector(), vec)
    assert internals.raw_leaf(r, 99) is None


def test_raw_leaf_dot_product_carries_extra_dim():
    db = Database()
    w = Writer(db, 0, 3, metric="dot-product")
    with db.write() as t:
        w.add_item(t, 0, np.array([1.0, 0.0, 0.0], np.float32))
        w.add_item(t, 1, np.array([0.0, 2.0, 0.0], np.float32))
        w.builder(seed=1).n_trees(1).build(t)
    r = Reader.open(db.read(), 0, db, metric="dot-product")
    leaf = internals.raw_leaf(r, 0)
    assert isinstance(leaf.header, internals.NodeHeaderDotProduct)
    # Bachrach preprocess: max-norm item gets extra 0, smaller ones > 0
    # (reference: src/distance/dot_product.rs:119-165)
    assert leaf.header.extra_dim > 0.0
    assert internals.raw_leaf(r, 1).header.extra_dim == pytest.approx(0.0)


def test_side_enum():
    rng = np.random.default_rng(0)
    seen = {internals.Side.random(rng) for _ in range(64)}
    assert seen == {internals.Side.Left, internals.Side.Right}


class HalfEuclidean(Euclidean):
    """A custom metric: euclidean semantics under a different name."""

    name = "half-euclidean"


def test_register_metric_end_to_end(tmp_path):
    internals.register_metric(HalfEuclidean)
    assert metric_by_name("half-euclidean") is HalfEuclidean
    # duplicate registration of the same class is a no-op
    internals.register_metric(HalfEuclidean)
    # a different class under the same name is rejected
    with pytest.raises(ValueError):
        internals.register_metric(type("Clash", (Euclidean,), {"name": "half-euclidean"}))

    rng = np.random.default_rng(3)
    x = rng.standard_normal((64, 8)).astype(np.float32)
    db = Database(str(tmp_path / "db"))
    w = Writer(db, 0, 8, metric="half-euclidean")
    with db.write() as t:
        w.add_items(t, np.arange(64, dtype=np.uint32), x)
        w.builder(seed=2).n_trees(3).build(t)

    # reload from disk: the persisted metric name resolves to the class
    db2 = Database(str(tmp_path / "db"))
    r = Reader.open(db2.read(), 0, db2, metric="half-euclidean")
    got = r.nns(5).by_item(0)
    assert got[0][0] == 0 and got[0][1] == pytest.approx(0.0, abs=1e-5)
    r.assert_validity()
