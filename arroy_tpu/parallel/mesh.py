"""Multi-chip scale-out over a `jax.sharding.Mesh`.

The reference has no distributed story — its "communication backend" is
an LMDB memory map shared between processes on one machine
(reference: src/lib.rs:1-3, SURVEY.md §2).  The TPU-native equivalent,
when a corpus outgrows one chip's HBM, is *corpus sharding*: item rows
are partitioned across the mesh's `shard` axis (data parallelism over
the corpus), queries are replicated (the tensor-parallel analog for a
retrieval engine), each device scores/routes its local shard, and
results merge with XLA collectives riding the ICI:

* search: per-shard `top_k` → `all_gather` → replicated final `top_k`;
* build:  per-shard margin evaluation (the hottest build op) with
  per-segment counts combined by `psum`.

Everything here is `shard_map`-based so the same code runs on a virtual
8-device CPU mesh in tests and on a real TPU pod slice.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..metrics import resolve_metric

AXIS = "shard"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (AXIS,))


from ..builder import _sign_positive  # noqa: E402  (one definition of Side)


# ---------------------------------------------------------------------------
# sharded exact search
# ---------------------------------------------------------------------------


class ShardedExactIndex:
    """Corpus-sharded brute-force index: per-shard top-k + ICI merge.

    For corpora that fit one chip the forest index is faster; this is the
    scale-out path when items must span several chips' HBM, and the recall
    oracle for sharded setups.
    """

    def __init__(self, mesh: Mesh, vectors: np.ndarray, metric="euclidean", ids=None):
        self.mesh = mesh
        self.metric = resolve_metric(metric)
        m, d = vectors.shape
        self.dims = d
        n = mesh.devices.size
        m_pad = ((m + n - 1) // n) * n
        rows = self.metric.encode_np(np.asarray(vectors, np.float32))
        rows_p = np.zeros((m_pad, rows.shape[1]), rows.dtype)
        rows_p[:m] = rows
        norms = np.zeros(m_pad, np.float32)
        norms[:m] = self.metric.item_norms_np(rows, d)
        live = np.zeros(m_pad, bool)
        live[:m] = True
        all_ids = np.zeros(m_pad, np.uint32)
        all_ids[:m] = np.arange(m, dtype=np.uint32) if ids is None else np.asarray(ids, np.uint32)

        shard2 = NamedSharding(mesh, P(AXIS, None))
        shard1 = NamedSharding(mesh, P(AXIS))
        self._shard1 = shard1
        self._live_np = live
        self._ids_np = all_ids
        self.rows = jax.device_put(rows_p, shard2)
        self.norms = jax.device_put(norms, shard1)
        self.live = jax.device_put(live, shard1)
        self.ids = jax.device_put(all_ids, shard1)

    def search(self, queries: np.ndarray, k: int, candidates=None):
        """Replicated queries against the sharded corpus; returns (ids, dists).

        ``candidates``: optional item-id allowlist — the roaring-∩ filter
        role (reference: src/reader.rs:354-360) as a sharded live-mask
        column, exactly like the single-chip exact engine."""
        metric, dims = self.metric, self.dims
        qv = metric.encode_np(np.asarray(queries, np.float32))
        qn = metric.item_norms_np(qv, dims)
        rep2 = NamedSharding(self.mesh, P(None, None))
        rep1 = NamedSharding(self.mesh, P(None))
        qv_d = jax.device_put(qv, rep2)
        qn_d = jax.device_put(qn, rep1)
        live = self.live
        if candidates is not None:
            mask = self._live_np & np.isin(
                self._ids_np, np.asarray(list(candidates), np.uint32)
            )
            live = jax.device_put(mask, self._shard1)
        ids, dists = _sharded_exact(
            self.mesh, metric, dims, int(k), self.rows, self.norms, live, self.ids, qv_d, qn_d
        )
        return np.asarray(ids), np.asarray(dists)


@functools.partial(
    jax.jit, static_argnames=("mesh", "metric", "dims", "k")
)
def _sharded_exact(mesh, metric, dims, k, rows, norms, live, ids, qv, qn):
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS), P(AXIS), P(AXIS), P(None, None), P(None)),
        out_specs=(P(None, None), P(None, None)),
        # outputs are value-replicated (every device computes the same
        # merged top-k after the all_gather) but the VMA checker cannot
        # infer that through top_k
        check_vma=False,
    )
    def step(rows_l, norms_l, live_l, ids_l, qv_r, qn_r):
        def one(q1, n1):
            d = metric.built_distance(q1, n1, 0.0, rows_l, norms_l, 0.0)
            return jnp.where(live_l, d, jnp.inf)

        d = jax.vmap(one)(qv_r, qn_r)  # [B, m_local]
        kk = min(k, d.shape[1])
        neg, idx = jax.lax.top_k(-d, kk)
        loc_ids = ids_l[idx]
        # merge across shards on the ICI: gather every shard's top-k and
        # redundantly reduce — k*n values per query, tiny traffic
        all_neg = jax.lax.all_gather(neg, AXIS, axis=1, tiled=True)  # [B, n*kk]
        all_ids = jax.lax.all_gather(loc_ids, AXIS, axis=1, tiled=True)
        kfin = min(k, all_neg.shape[1])
        neg2, idx2 = jax.lax.top_k(all_neg, kfin)
        out_ids = jnp.take_along_axis(all_ids, idx2, axis=1)
        raw = -neg2
        # dead/padding slots carry +inf — mark them nan like every
        # single-chip path does (their gathered id is the pad id 0, which
        # is a legal item id, so distance is the only tell)
        out_d = jnp.where(
            raw < jnp.inf,
            metric.normalized_distance(raw, dims),
            jnp.float32(jnp.nan),
        )
        return out_ids, out_d

    return step(rows, norms, live, ids, qv, qn)


# ---------------------------------------------------------------------------
# sharded build step (the hot side-assignment op, corpus-sharded)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("mesh", "metric", "n_segments"))
def sharded_margin_step(mesh, metric, n_segments, rows, extras, seg_of_item, normals, aux):
    """One forest-build side-assignment sweep over a sharded corpus.

    Item rows (and their segment assignment) are sharded; split-plane
    normals are replicated; per-segment left counts are `psum`-combined
    so every device sees the global imbalance — the distributed version
    of builder._level_step's count stage.
    """

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS), P(AXIS), P(None, None), P(None)),
        out_specs=(P(AXIS), P(None)),
    )
    def step(rows_l, extras_l, seg_l, normals_r, aux_r):
        base = metric.base_dot(normals_r[seg_l], rows_l)
        qf = extras_l if metric.has_extra else 1.0
        margins = base + aux_r[seg_l] * qf
        side = _sign_positive(margins)
        left = jax.ops.segment_sum(
            (~side).astype(jnp.int32), seg_l, num_segments=n_segments
        )
        left = jax.lax.psum(left, AXIS)
        return margins, left

    return step(rows, extras, seg_of_item, normals, aux)
