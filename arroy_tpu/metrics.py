"""The seven arroy distance metrics as batched TPU ops.

This is the TPU-native counterpart of the reference `Distance` trait
(reference: src/distance/mod.rs:40-124) and its seven implementations.
Where the reference computes one scalar distance per SIMD call, every
function here is written over *batches* of vectors so that the whole
forest build (side assignment of every item against every active split
plane) and the whole query re-scoring collapse into a handful of fused
XLA ops on the VPU/MXU.

Per-metric semantics (all mirrored exactly — see each class docstring):

======================  =========  ==========================================
metric                  storage    margin(n, q)              built_distance
======================  =========  ==========================================
euclidean               f32        bias + n·q                Σ (p-q)²
manhattan               f32        bias + n·q                Σ |p-q|
cosine                  f32        n·q                       (1-cos)/2
dot-product             f32        n·q + nₑqₑ                -p·q
bq euclidean            bits       bias + bqdot(n,q)         4·hamming
bq manhattan            bits       bias + bqdot(n,q)         2·hamming
bq cosine               bits       bqdot(n,q)                (1-bqcos)/2
======================  =========  ==========================================

The unified device formula used by the builder and the reader is

    margin = base_dot(normal, q) + aux * qf

with ``aux`` = hyperplane bias (euclidean/manhattan/BQ), the normalized
extra dimension (dot-product), or 0 (cosine); and ``qf`` = 1 everywhere
except dot-product where it is the query's Bachrach extra coordinate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

def _next_pow2_int(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


from .ops.binary import (
    bq_dot_rowwise,
    hamming_rowwise,
    pack_bits_np,
    padded_dim,
    unpack_bits_jnp,
    unpack_bits_np,
)

_F32_EPSILON = float(np.finfo(np.float32).eps)
_F32_MIN_POSITIVE = float(np.finfo(np.float32).tiny)


# ---------------------------------------------------------------------------
# base classes
# ---------------------------------------------------------------------------


class Metric:
    """Static-method bundle describing one distance (reference Distance trait)."""

    name: str = "?"
    #: query-time search_k multiplier (reference: src/distance/mod.rs:41,
    #: src/distance/binary_quantized_cosine.rs:36)
    default_oversampling: int = 1
    #: vectors stored as packed sign bits instead of f32
    binary: bool = False
    #: two-means normalizes its centroids (reference two_means `cosine` flag)
    tm_cosine: bool = False
    #: items carry a Bachrach extra coordinate (dot-product only)
    has_extra: bool = False

    # -- storage ------------------------------------------------------
    @classmethod
    def storage_dim(cls, dims: int) -> int:
        """Columns of the device item/normal matrix for `dims` dimensions."""
        raise NotImplementedError

    @classmethod
    def storage_dtype(cls):
        raise NotImplementedError

    @classmethod
    def encode_np(cls, x: np.ndarray) -> np.ndarray:
        """Host-side encode of f32 row vectors into storage rows."""
        raise NotImplementedError

    @classmethod
    def decode_np(cls, rows: np.ndarray, dims: int) -> np.ndarray:
        """Host-side decode back to what `item_vector` should return."""
        raise NotImplementedError

    # -- header norms at insert time (reference `new_header`) ----------
    @classmethod
    def item_norms_np(cls, rows: np.ndarray, dims: int) -> np.ndarray:
        """Per-item header norm computed when the item is written."""
        return np.zeros(rows.shape[:-1], dtype=np.float32)

    # -- unified margin pieces ----------------------------------------
    @classmethod
    def base_dot(cls, a: jax.Array, b: jax.Array) -> jax.Array:
        """Row-wise inner product in storage space (broadcasting)."""
        raise NotImplementedError

    @classmethod
    def margin(cls, normals: jax.Array, aux: jax.Array, q: jax.Array, qf) -> jax.Array:
        """margin = base_dot + aux * qf (see module docstring)."""
        return cls.base_dot(normals, q) + aux * qf

    @classmethod
    def margin_matrix(cls, normals, aux, qv, qf) -> jax.Array:
        """All margins of a query batch against every split plane: [B, S].

        The traversal precomputes this once (an MXU matmul for f32
        metrics) so its pop loop only does scalar lookups.
        """
        base = cls.base_dot(normals[None, :, :], qv[:, None, :])
        return base + aux[None, :] * qf[:, None]

    # -- built distance + normalization (query re-score) ---------------
    @classmethod
    def built_distance(cls, qv, qn, qe, X, Xn, Xe) -> jax.Array:
        """Distance of query leaf (vec/norm/extra) to item rows (broadcast)."""
        raise NotImplementedError

    @classmethod
    def normalized_distance(cls, d: jax.Array, dims: int) -> jax.Array:
        return jnp.sqrt(jnp.maximum(d, 0.0))

    # -- two-means training space (reference two_means, src/distance/mod.rs:126-223)
    @classmethod
    def tm_dim(cls, dims: int) -> int:
        return dims

    @classmethod
    def tm_decode(cls, rows: jax.Array, dims: int) -> jax.Array:
        """Storage rows → f32 training-space vectors."""
        return rows

    @classmethod
    def tm_nonbuilt(cls, pv, pe, ph, kv, ke, kh) -> jax.Array:
        """non_built_distance between a centroid and a sampled leaf."""
        raise NotImplementedError

    @classmethod
    def tm_init(cls, v, e) -> jax.Array:
        """Header value maintained on centroids (`Distance::init`)."""
        return jnp.zeros(v.shape[:-1], dtype=jnp.float32)

    @classmethod
    def tm_norm(cls, v, e) -> jax.Array:
        """Metric norm (`Distance::norm`) in training space."""
        return jnp.sqrt(jnp.sum(v * v, axis=-1))

    @classmethod
    def tm_normalize(cls, v, e):
        """`Distance::normalize`: divide vector (and extra where relevant)."""
        n = cls.tm_norm(v, e)
        safe = jnp.where(n > 0.0, n, 1.0)[..., None]
        return jnp.where(n[..., None] > 0.0, v / safe, v), e

    @classmethod
    def finalize_split(cls, pv, pe, qv, qe):
        """Centroids → (normal storage row, aux scalar) (`create_split`)."""
        raise NotImplementedError


class _F32Metric(Metric):
    binary = False

    @classmethod
    def storage_dim(cls, dims: int) -> int:
        return dims

    @classmethod
    def storage_dtype(cls):
        return jnp.float32

    @classmethod
    def encode_np(cls, x: np.ndarray) -> np.ndarray:
        return np.asarray(x, dtype=np.float32)

    @classmethod
    def decode_np(cls, rows: np.ndarray, dims: int) -> np.ndarray:
        return np.asarray(rows[..., :dims], dtype=np.float32)

    @classmethod
    def base_dot(cls, a, b):
        return jnp.sum(a * b, axis=-1)

    @classmethod
    def margin_matrix(cls, normals, aux, qv, qf):
        dots = jax.lax.dot_general(
            qv, normals, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        return dots + aux[None, :] * qf[:, None]


class _BQMetric(Metric):
    """Shared machinery of the three binary-quantized metrics.

    Storage is packed sign bits (reference:
    src/unaligned_vector/binary_quantized.rs); two-means runs in the ±1
    decode of those bits and splits are re-quantized to sign bits
    (reference: src/distance/mod.rs:173-223).
    """

    binary = True
    default_oversampling = 3

    @classmethod
    def storage_dim(cls, dims: int) -> int:
        return padded_dim(dims) // 32

    @classmethod
    def storage_dtype(cls):
        return jnp.uint32

    @classmethod
    def encode_np(cls, x: np.ndarray) -> np.ndarray:
        return pack_bits_np(x)

    @classmethod
    def decode_np(cls, rows: np.ndarray, dims: int) -> np.ndarray:
        return unpack_bits_np(rows, dims)

    @classmethod
    def base_dot(cls, a, b):
        return bq_dot_rowwise(a, b)

    @classmethod
    def margin_matrix(cls, normals, aux, qv, qf):
        # chunk the [B, S, w] XOR broadcast along S to bound the temporary
        # (and never pad a small forest up to a full chunk of dead work)
        s = normals.shape[0]
        chunk = min(2048, max(_next_pow2_int(s), 8))
        n_chunks = -(-s // chunk)
        pad = n_chunks * chunk
        norm_p = jnp.concatenate(
            [normals, jnp.zeros((pad - s, normals.shape[1]), normals.dtype)]
        ).reshape(n_chunks, chunk, normals.shape[1])

        def one(nc):
            return bq_dot_rowwise(nc[None, :, :], qv[:, None, :])  # [B, chunk]

        base = jax.lax.map(one, norm_p)  # [n_chunks, B, chunk]
        base = base.transpose(1, 0, 2).reshape(qv.shape[0], pad)[:, :s]
        return base + aux[None, :] * qf[:, None]

    @classmethod
    def tm_dim(cls, dims: int) -> int:
        return padded_dim(dims)

    @classmethod
    def tm_decode(cls, rows: jax.Array, dims: int) -> jax.Array:
        return unpack_bits_jnp(rows, padded_dim(dims))


# ---------------------------------------------------------------------------
# f32 metrics
# ---------------------------------------------------------------------------


class Euclidean(_F32Metric):
    """Squared L2 re-score, mean-difference hyperplanes.

    Reference: src/distance/euclidean.rs:33-82.  The re-score uses the
    plain sum-of-squared-differences (no ‖p‖²+‖q‖²-2pq trick) to avoid
    catastrophic cancellation, exactly like src/spaces/simple.rs:47-51.
    """

    name = "euclidean"

    @classmethod
    def built_distance(cls, qv, qn, qe, X, Xn, Xe):
        diff = X - qv
        return jnp.sum(diff * diff, axis=-1)

    # normalized_distance: sqrt(d) — inherited from Metric

    @classmethod
    def tm_nonbuilt(cls, pv, pe, ph, kv, ke, kh):
        diff = pv - kv
        return jnp.sum(diff * diff, axis=-1)

    @classmethod
    def finalize_split(cls, pv, pe, qv, qe):
        n = pv - qv
        norm = jnp.sqrt(jnp.sum(n * n, axis=-1, keepdims=True))
        n = jnp.where(norm > 0.0, n / jnp.where(norm > 0.0, norm, 1.0), n)
        bias = jnp.sum(-n * (pv + qv) / 2.0, axis=-1)
        return n, bias


class Manhattan(_F32Metric):
    """L1 re-score; same hyperplane construction as Euclidean.

    Reference: src/distance/manhattan.rs:32-85.
    """

    name = "manhattan"

    @classmethod
    def built_distance(cls, qv, qn, qe, X, Xn, Xe):
        return jnp.sum(jnp.abs(X - qv), axis=-1)

    @classmethod
    def normalized_distance(cls, d, dims):
        return jnp.maximum(d, 0.0)

    @classmethod
    def tm_nonbuilt(cls, pv, pe, ph, kv, ke, kh):
        return jnp.sum(jnp.abs(pv - kv), axis=-1)

    finalize_split = Euclidean.finalize_split


class Cosine(_F32Metric):
    """Angular distance ``(1 - cos)/2`` with clamped cosine.

    Reference: src/distance/cosine.rs:31-90.  Header carries the vector
    norm; two-means normalizes its centroids (`cosine=true`).
    """

    name = "cosine"
    tm_cosine = True

    @classmethod
    def item_norms_np(cls, rows, dims):
        # f64 accumulation without materializing f64 copies of the matrix
        return np.sqrt(
            np.einsum("...d,...d->...", rows, rows, dtype=np.float64)
        ).astype(np.float32)

    @classmethod
    def built_distance(cls, qv, qn, qe, X, Xn, Xe):
        pq = jnp.sum(X * qv, axis=-1)
        pnqn = Xn * qn
        cos = jnp.clip(pq / jnp.where(pnqn > _F32_EPSILON, pnqn, 1.0), -1.0, 1.0)
        return jnp.where(pnqn > _F32_EPSILON, (1.0 - cos) / 2.0, 0.0)

    @classmethod
    def normalized_distance(cls, d, dims):
        return d

    @classmethod
    def tm_init(cls, v, e):
        return jnp.sqrt(jnp.sum(v * v, axis=-1))

    @classmethod
    def tm_nonbuilt(cls, pv, pe, ph, kv, ke, kh):
        pq = jnp.sum(pv * kv, axis=-1)
        pnqn = ph * kh
        cos = jnp.clip(pq / jnp.where(pnqn > _F32_EPSILON, pnqn, 1.0), -1.0, 1.0)
        return jnp.where(pnqn > _F32_EPSILON, (1.0 - cos) / 2.0, 0.0)

    @classmethod
    def finalize_split(cls, pv, pe, qv, qe):
        n = pv - qv
        norm = jnp.sqrt(jnp.sum(n * n, axis=-1, keepdims=True))
        n = jnp.where(norm > 0.0, n / jnp.where(norm > 0.0, norm, 1.0), n)
        return n, jnp.zeros(n.shape[:-1], dtype=jnp.float32)


class DotProduct(_F32Metric):
    """Inner-product search via the Bachrach et al. cosine-space reduction.

    Reference: src/distance/dot_product.rs:39-166.  A build-time
    preprocess pass finds the maximum norm and gives every item an extra
    coordinate ``sqrt(max² - ‖v‖²)``; margins include the extra
    coordinate, the built distance is the negated raw dot product, and
    the normalized distance flips the sign back so callers receive the
    actual dot product.
    """

    name = "dot-product"
    tm_cosine = True
    has_extra = True

    @classmethod
    def built_distance(cls, qv, qn, qe, X, Xn, Xe):
        return -jnp.sum(X * qv, axis=-1)

    @classmethod
    def normalized_distance(cls, d, dims):
        return -d

    # two-means runs with headers produced by `preprocess` + `init`:
    # header.norm is Σv² (init, src/distance/dot_product.rs:95-97) and the
    # metric norm includes the extra coordinate (norm(), :70-74).
    @classmethod
    def tm_init(cls, v, e):
        return jnp.sum(v * v, axis=-1)

    @classmethod
    def tm_norm(cls, v, e):
        return jnp.sqrt(jnp.sum(v * v, axis=-1) + e * e)

    @classmethod
    def tm_normalize(cls, v, e):
        n = cls.tm_norm(v, e)
        safe = jnp.where(n > 0.0, n, 1.0)
        return (
            jnp.where(n[..., None] > 0.0, v / safe[..., None], v),
            jnp.where(n > 0.0, e / safe, e),
        )

    @classmethod
    def tm_nonbuilt(cls, pv, pe, ph, kv, ke, kh):
        pq = jnp.sum(pv * kv, axis=-1) + pe * ke
        ppqq = ph * kh
        return jnp.where(
            ppqq >= _F32_MIN_POSITIVE,
            2.0 - 2.0 * pq / jnp.sqrt(jnp.where(ppqq > 0.0, ppqq, 1.0)),
            2.0,
        )

    @classmethod
    def finalize_split(cls, pv, pe, qv, qe):
        n = pv - qv
        ne = pe - qe
        norm = jnp.sqrt(jnp.sum(n * n, axis=-1) + ne * ne)
        safe = jnp.where(norm > 0.0, norm, 1.0)
        n = jnp.where(norm[..., None] > 0.0, n / safe[..., None], n)
        ne = jnp.where(norm > 0.0, ne / safe, ne)
        return n, ne

    @staticmethod
    def preprocess_np(vectors: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Bachrach preprocess over the current item matrix.

        Returns (header_norms, extra_dims): ``norm = max²`` and
        ``extra = sqrt(max² - ‖v‖²)`` (reference:
        src/distance/dot_product.rs:119-165).
        """
        sq = np.sum(vectors.astype(np.float32) ** 2, axis=-1, dtype=np.float32)
        norms = np.sqrt(sq)
        max_norm = np.float32(norms.max(initial=0.0))
        diff = np.maximum(max_norm * max_norm - sq, 0.0)
        return (
            np.full(sq.shape, max_norm * max_norm, dtype=np.float32),
            np.sqrt(diff).astype(np.float32),
        )


# ---------------------------------------------------------------------------
# binary quantized metrics
# ---------------------------------------------------------------------------


class BinaryQuantizedEuclidean(_BQMetric):
    """XOR-popcount squared L2 (×4), sign-bit hyperplanes.

    Reference: src/distance/binary_quantized_euclidean.rs:37-124.
    """

    name = "binary quantized euclidean"

    @classmethod
    def built_distance(cls, qv, qn, qe, X, Xn, Xe):
        return (4 * hamming_rowwise(X, qv)).astype(jnp.float32)

    @classmethod
    def normalized_distance(cls, d, dims):
        return d / dims

    # training space = ±1 decode; distances via plain Euclidean
    tm_nonbuilt = Euclidean.tm_nonbuilt

    @classmethod
    def finalize_split(cls, pv, pe, qv, qe):
        from .ops.binary import pack_bits_jnp

        diff = pv - qv
        bits = pack_bits_jnp(diff)
        n_signs = jnp.where(_sign_positive(diff), 1.0, -1.0)
        p_signs = jnp.where(_sign_positive(pv), 1.0, -1.0)
        q_signs = jnp.where(_sign_positive(qv), 1.0, -1.0)
        # the reference normalizes the ±1 normal by sqrt(d_pad) and computes
        # the bias with the *quantized* ±1 values of normal and centroids
        # (src/distance/binary_quantized_euclidean.rs:67-93): the normalize
        # round-trips through the bit codec so the effective normal used in
        # the bias sum is the raw ±1 sign pattern.
        bias = jnp.sum(-n_signs * (p_signs + q_signs) / 2.0, axis=-1)
        return bits, bias


class BinaryQuantizedManhattan(_BQMetric):
    """XOR-popcount L1 (×2) (reference: src/distance/binary_quantized_manhattan.rs)."""

    name = "binary quantized manhattan"

    @classmethod
    def built_distance(cls, qv, qn, qe, X, Xn, Xe):
        return (2 * hamming_rowwise(X, qv)).astype(jnp.float32)

    @classmethod
    def normalized_distance(cls, d, dims):
        return jnp.maximum(d, 0.0) / dims

    tm_nonbuilt = Manhattan.tm_nonbuilt
    finalize_split = BinaryQuantizedEuclidean.finalize_split


class BinaryQuantizedCosine(_BQMetric):
    """±1 angular distance via XNOR popcount.

    Reference: src/distance/binary_quantized_cosine.rs:35-99.  Note the
    missing cosine clamp relative to the f32 metric — mirrored on purpose.
    """

    name = "binary quantized cosine"
    tm_cosine = True

    @classmethod
    def item_norms_np(cls, rows, dims):
        # bqdot(v, v) over the padded width is always d_pad: every XNOR
        # word is all-ones (reference: src/spaces/simple.rs:119-131).
        d_pad = rows.shape[-1] * 32
        return np.full(rows.shape[:-1], np.sqrt(np.float32(d_pad)), dtype=np.float32)

    @classmethod
    def built_distance(cls, qv, qn, qe, X, Xn, Xe):
        pq = bq_dot_rowwise(X, qv)
        pnqn = Xn * qn
        cos = pq / jnp.where(pnqn != 0.0, pnqn, 1.0)
        return jnp.where(pnqn != 0.0, (1.0 - cos) / 2.0, 0.0)

    @classmethod
    def normalized_distance(cls, d, dims):
        return d

    tm_init = Cosine.tm_init
    tm_nonbuilt = Cosine.tm_nonbuilt

    @classmethod
    def finalize_split(cls, pv, pe, qv, qe):
        from .ops.binary import pack_bits_jnp

        diff = pv - qv
        bits = pack_bits_jnp(diff)
        return bits, jnp.zeros(diff.shape[:-1], dtype=jnp.float32)


def _sign_positive(x: jax.Array) -> jax.Array:
    """f32 `is_sign_positive()` (true for +0.0, false for -0.0)."""
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    return (bits >> 31) == 0


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

ALL_METRICS = (
    Euclidean,
    Manhattan,
    Cosine,
    DotProduct,
    BinaryQuantizedEuclidean,
    BinaryQuantizedManhattan,
    BinaryQuantizedCosine,
)

_BY_NAME = {m.name: m for m in ALL_METRICS}


def metric_by_name(name: str) -> type[Metric]:
    try:
        return _BY_NAME[name]
    except KeyError:
        raise ValueError(
            f"unknown distance {name!r}; expected one of {sorted(_BY_NAME)}"
        ) from None


def register_metric(cls: type[Metric]) -> type[Metric]:
    """Register a custom `Metric` subclass under its ``name``.

    The custom-`Distance` extension point (the reference exposes its
    `Distance` trait publicly for embedders, reference: src/lib.rs:99,
    src/distance/mod.rs:40-124).  After registration the metric resolves
    by name everywhere a built-in does — `Writer`, `Reader.open`,
    persistence reload, CLI ``--distance`` flags.  Usable as a class
    decorator; re-registering the same class is a no-op, but a *new*
    class under an existing name is rejected (an index built with one
    formula must never silently reopen with another).
    """
    if not (isinstance(cls, type) and issubclass(cls, Metric)):
        raise TypeError(f"not a Metric subclass: {cls!r}")
    name = getattr(cls, "name", None)
    if not name or name == "?":
        raise ValueError(f"{cls.__name__} needs a distinct `name` attribute")
    prev = _BY_NAME.get(name)
    if prev is not None and prev is not cls:
        raise ValueError(f"distance {name!r} is already registered ({prev.__name__})")
    _BY_NAME[name] = cls
    return cls


def resolve_metric(metric) -> type[Metric]:
    if isinstance(metric, str):
        return metric_by_name(metric)
    if isinstance(metric, type) and issubclass(metric, Metric):
        return metric
    raise TypeError(f"not a metric: {metric!r}")
