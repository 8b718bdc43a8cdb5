"""Multi-chip sharding on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from arroy_tpu.metrics import Euclidean
from arroy_tpu.parallel.mesh import (
    AXIS,
    ShardedExactIndex,
    make_mesh,
    sharded_margin_step,
)

from .util import random_vectors


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_sharded_exact_matches_single_device():
    x = random_vectors(257, 16, seed=1)  # deliberately not divisible by 8
    mesh = make_mesh()
    idx = ShardedExactIndex(mesh, x, metric="euclidean")
    q = x[:5]
    ids, dists = idx.search(q, 10)
    # oracle
    d = np.sum((x[None, :, :] - q[:, None, :]) ** 2, axis=-1)
    want = np.argsort(d, axis=1)[:, :10]
    for b in range(5):
        assert set(ids[b]) == set(want[b])
        np.testing.assert_allclose(
            np.sort(dists[b]), np.sort(np.sqrt(d[b][want[b]])), rtol=1e-4
        )


def test_sharded_exact_cosine():
    x = random_vectors(64, 8, seed=2)
    mesh = make_mesh()
    idx = ShardedExactIndex(mesh, x, metric="cosine")
    ids, dists = idx.search(x[:3], 5)
    assert ids[0][0] == 0 and abs(dists[0][0]) < 1e-5


def test_sharded_margin_step_matches_local():
    mesh = make_mesh()
    m, d, g = 64, 16, 4
    x = random_vectors(m, d, seed=3)
    seg = np.repeat(np.arange(g, dtype=np.int32), m // g)
    normals = random_vectors(g, d, seed=4)
    aux = np.zeros(g, np.float32)

    rows = jax.device_put(x, NamedSharding(mesh, P(AXIS, None)))
    extras = jax.device_put(np.zeros(m, np.float32), NamedSharding(mesh, P(AXIS)))
    seg_d = jax.device_put(seg, NamedSharding(mesh, P(AXIS)))
    nr = jax.device_put(normals, NamedSharding(mesh, P(None, None)))
    ax = jax.device_put(aux, NamedSharding(mesh, P(None)))

    margins, left = sharded_margin_step(mesh, Euclidean, g, rows, extras, seg_d, nr, ax)
    want_m = np.sum(x * normals[seg], axis=1)
    np.testing.assert_allclose(np.asarray(margins), want_m, rtol=1e-5)
    want_left = np.asarray(
        [np.sum(np.signbit(want_m[seg == i])) for i in range(g)], np.int32
    )
    np.testing.assert_array_equal(np.asarray(left), want_left)


def test_sharded_exact_pads_with_nan_not_id_zero():
    """Regression: shards holding only padding rows contributed
    (id=0, dist=inf) entries — indistinguishable from a real hit on item
    0; they must surface as nan like every single-chip path."""
    x = np.asarray(np.random.default_rng(3).standard_normal((10, 16)), np.float32)
    mesh = make_mesh()
    idx = ShardedExactIndex(mesh, x, metric="euclidean")
    ids, dists = idx.search(x[:4], 16)
    for row_i, row_d in zip(ids, dists):
        valid = ~np.isnan(row_d)
        assert valid.sum() == 10  # exactly the live items
        assert sorted(row_i[valid]) == sorted(set(row_i[valid]))
