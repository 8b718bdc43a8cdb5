"""Corpus-sharded forest index over a device mesh.

Scale-out for corpora that exceed one chip's HBM: items are partitioned
across the mesh's `shard` axis, each shard builds its own sub-forest
over its local items, and a query fans out to every shard's forest in
one `shard_map` — per-shard best-first traversal + exact re-score on
local data, then an `all_gather` of per-shard top-k and a replicated
merge on raw distances.  ICI carries only ``n_shards * k`` scalars per
query.

Semantics: with per-shard ``search_k' = ceil(search_k / n_shards)`` the
total candidate budget matches the single-chip engine; recall/latency
behavior is that of `n_shards` independent arroy indexes whose results
are merged exactly (the standard sharded-ANN construction).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.sharding import PartitionSpec as P_  # alias where local `P` = block size

from ..device import DeviceIndex
from ..metrics import resolve_metric
from ..models.forest import KIND_FREE
from ..search import _next_pow2, _rescore_impl, _traverse_impl
from ..store.database import Database
from ..writer import Writer
from .mesh import AXIS


def _pad_to(arr: np.ndarray, n: int, fill) -> np.ndarray:
    if arr.shape[0] >= n:
        return arr
    pad_shape = (n - arr.shape[0],) + arr.shape[1:]
    return np.concatenate([arr, np.full(pad_shape, fill, dtype=arr.dtype)])


class ShardedForestIndex:
    """n_shards independent sub-forests queried in lock-step on the mesh."""

    def __init__(self, mesh: Mesh, packs: list[dict], metric, dims: int, states=None):
        self.mesh = mesh
        self.metric = metric
        self.dims = dims
        #: per-shard (store, forest) handles — kept so the leaf-probe
        #: tables can be packed lazily (enable_probe / probe_search)
        self._states = states
        self._probe_cache: dict = {}
        n = mesh.devices.size
        assert len(packs) == n

        # common static geometry across shards
        self.max_leaf = max(p["max_leaf"] for p in packs)
        self.n_nodes = max(p["n_nodes"] for p in packs)
        self.n_items_total = sum(p["n_items"] for p in packs)
        self.n_items_shard_max = max(p["n_items"] for p in packs)
        self.csr_total = min(
            int(p["leaf_items"].shape[0]) - p["max_leaf"] for p in packs
        )
        t = max(len(p["roots"]) for p in packs)
        self.n_trees = t
        # tight traversal bounds across shards (see search.pops_budget)
        self.n_splits_max = max(int(p.get("n_splits", 0)) for p in packs)
        self.n_dead_max = max(int(p.get("n_dead_pops", 0)) for p in packs)
        self._leaf_cums = [p.get("leaf_cum_np") for p in packs]

        def stack(key, fill):
            n_rows = max(p[key].shape[0] for p in packs)
            return np.stack([_pad_to(p[key], n_rows, fill) for p in packs])

        # pad node tables with FREE rows so stray ids read as dead nodes;
        # every table gets one guaranteed-FREE trailing row (id n_rows)
        # that root padding points at — padding roots with 0 would
        # traverse a real node as a phantom extra tree, wasting that
        # shard's candidate budget on duplicates
        node_tables = []
        n_rows = max(p["node_table"].shape[0] for p in packs) + 1
        for p in packs:
            nt = p["node_table"]
            pad = np.zeros((n_rows - nt.shape[0], 8), np.int32)
            pad[:, 0] = KIND_FREE
            node_tables.append(np.concatenate([nt, pad]))
        roots = np.stack(
            [
                _pad_to(np.asarray(p["roots"], np.int32), t, n_rows - 1)
                for p in packs
            ]
        )

        sh = lambda *spec: NamedSharding(mesh, P(*spec))
        put = lambda a, spec: jax.device_put(jnp.asarray(a), sh(*spec))
        self.node_table = put(np.stack(node_tables), (AXIS, None, None))
        self.normals = put(stack("normals", 0), (AXIS, None, None))
        self.aux = put(stack("aux", 0.0), (AXIS, None))
        self.leaf_off = put(stack("leaf_off", 0), (AXIS, None))
        self.leaf_cnt = put(stack("leaf_cnt", 0), (AXIS, None))
        self.leaf_items = put(stack("leaf_items", -1), (AXIS, None))
        self.roots = put(roots, (AXIS, None))
        self.rows = put(stack("rows", 0), (AXIS, None, None))
        self.norms = put(stack("norms", 0.0), (AXIS, None))
        self.extras = put(stack("extras", 0.0), (AXIS, None))
        self.slot_to_id = put(stack("slot_to_id", 0xFFFFFFFF), (AXIS, None))

    def _max_leaf_pops(self, search_k: int) -> int:
        """Worst case over shards of non-empty leaf pops to fill search_k
        (smallest-leaves-first bound per shard)."""
        worst = 1
        for cum in self._leaf_cums:
            if cum is None or len(cum) == 0:
                return max(search_k, 1)
            m = int(np.searchsorted(cum, search_k, side="left")) + 1
            worst = max(worst, min(m, len(cum)))
        return worst

    # ------------------------------------------------------------------
    @staticmethod
    def build(
        mesh: Mesh,
        vectors: np.ndarray,
        metric="euclidean",
        ids: np.ndarray | None = None,
        n_trees: int | None = None,
        split_after: int | None = None,
        seed: int = 42,
        parallel_build: bool = False,
    ) -> "ShardedForestIndex":
        """Partition items round-robin and build one sub-forest per shard.

        ``parallel_build`` drives the shard builds from one thread per
        device.  Default off: on a single controller the jit cache is
        per-device, so the concurrent compiles usually cost more than the
        overlap wins; it pays off only when kernels are already cached.
        """
        import concurrent.futures

        metric = resolve_metric(metric)
        vectors = np.asarray(vectors, np.float32)
        m, dims = vectors.shape
        if ids is None:
            ids = np.arange(m, dtype=np.uint32)
        n = mesh.devices.size
        devices = list(mesh.devices.flat)

        import contextlib

        def build_shard(s: int) -> dict:
            # when parallel, pin each shard's build to its own device so
            # the n builds overlap instead of queueing on device 0 (at the
            # cost of per-device jit compiles)
            dev_ctx = (
                jax.default_device(devices[s]) if parallel_build else contextlib.nullcontext()
            )
            with dev_ctx:
                sel = np.arange(s, m, n)
                db = Database()
                w = Writer(db, 0, dims, metric=metric)
                with db.write() as wtxn:
                    if len(sel):
                        w.add_items(wtxn, ids[sel], vectors[sel])
                    b = w.builder(seed=seed + s)
                    if n_trees is not None:
                        b.n_trees(n_trees)
                    if split_after is not None:
                        b.split_after(split_after)
                    b.build(wtxn)
                st = db.read().state(0)
                return DeviceIndex.build_np(metric, dims, st.store, st.forest), st

        if parallel_build:
            with concurrent.futures.ThreadPoolExecutor(max_workers=n) as ex:
                results = list(ex.map(build_shard, range(n)))
        else:
            results = [build_shard(s) for s in range(n)]
        packs = [p for p, _ in results]
        states = [s for _, s in results]
        return ShardedForestIndex(mesh, packs, metric, dims, states=states)

    # ------------------------------------------------------------------
    def search(self, queries: np.ndarray, count: int, search_k: int | None = None):
        """Fan-out query: returns (ids [B, count] int64, dists [B, count])."""
        metric, dims = self.metric, self.dims
        n = self.mesh.devices.size
        b = len(np.asarray(queries))
        if self.n_items_total == 0 or self.n_trees == 0:
            return (
                np.zeros((b, count), np.int64),
                np.full((b, count), np.nan, np.float32),
            )
        if search_k is None:
            # match the single-chip default budget (reader._effective_search_k):
            # count x total trees, x the metric's oversampling (x3 for BQ)
            search_k = count * self.n_trees * n * metric.default_oversampling
        sk_local = min(
            max(-(-search_k // n), count), max(self.csr_total, 1)
        )
        sk = _next_pow2(sk_local)
        t = self.n_trees
        pmax = min(self.n_nodes + t, 2 * t + 2 * sk_local + 64)
        if sk_local >= self.n_items_shard_max:
            pmax = self.n_nodes + t
        else:
            pmax = min(pmax, self.n_splits_max + self._max_leaf_pops(sk) + self.n_dead_max + t + 8)
        k = max(min(_next_pow2(count), sk + self.max_leaf), 1)
        q_cap = t + min(pmax, self.n_splits_max) + 1
        l_cap = min(min(sk, pmax), self._max_leaf_pops(sk)) + 1

        qv = metric.encode_np(queries.astype(np.float32))
        qn = metric.item_norms_np(qv, dims)
        qe = np.zeros(len(qv), np.float32)
        qf = (
            np.zeros(len(qv), np.float32)
            if metric.has_extra
            else np.ones(len(qv), np.float32)
        )
        rep = NamedSharding(self.mesh, P(*([None] * 2)))
        rep1 = NamedSharding(self.mesh, P(None))
        ids, dists = _sharded_forest_search(
            self.mesh,
            metric,
            dims,
            int(sk),
            int(pmax),
            int(self.max_leaf),
            int(k),
            int(count),
            int(q_cap),
            int(l_cap),
            self.node_table,
            self.normals,
            self.aux,
            self.leaf_off,
            self.leaf_cnt,
            self.leaf_items,
            self.roots,
            self.rows,
            self.norms,
            self.extras,
            self.slot_to_id,
            jax.device_put(jnp.asarray(qv), rep),
            jax.device_put(jnp.asarray(qn), rep1),
            jax.device_put(jnp.asarray(qe), rep1),
            jax.device_put(jnp.asarray(qf), rep1),
            jnp.int32(sk_local),
        )
        ids = np.asarray(ids).astype(np.int64)[:, :count]
        dists = np.asarray(dists)[:, :count]
        if ids.shape[1] < count:  # nan-pad like search_batch does
            pad = count - ids.shape[1]
            ids = np.concatenate([ids, np.zeros((b, pad), ids.dtype)], axis=1)
            dists = np.concatenate(
                [dists, np.full((b, pad), np.nan, dists.dtype)], axis=1
            )
        return ids, dists

    # ------------------------------------------------------------------
    # leaf-probe fan-out (the TPU-shaped forest plan, per shard)
    # ------------------------------------------------------------------
    def enable_probe(self, n_trees="auto", block="auto", dtype="bf16"):
        """Pack + upload per-shard leaf-probe block tables (probe.py),
        stacked along the mesh axis.  Called lazily by `probe_search`;
        idempotent per geometry."""
        from ..probe import DEFAULT_BLOCK, build_tables_np

        if self._states is None:
            raise ValueError("probe fan-out needs per-shard states (build())")
        P = DEFAULT_BLOCK if block == "auto" else int(block)
        T_req = 8 if n_trees == "auto" else int(n_trees)
        key = (T_req, P, dtype)
        hit = self._probe_cache.get(key)
        if hit is not None:
            return hit
        T = min(
            min(T_req, len(st.forest.roots) or 1) for st in self._states
        )
        tabs = [
            build_tables_np(
                self.metric, self.dims, st.store, st.forest, T, P, dtype
            )
            for st in self._states
        ]
        nb = max(t["nb_max"] for t in tabs)

        def repad(t, key_, fill):
            a = t[key_]
            if key_ == "blk_scale" and a.shape[0] == 1:
                return a  # [1,1] placeholder (non-int8 tables)
            # [T*nb_s, ...] -> [T, nb_s, ...] -> pad axis 1 -> flatten
            a = a.reshape((t["n_trees"], t["nb_max"]) + a.shape[1:])
            if t["nb_max"] < nb:
                pad_shape = (t["n_trees"], nb - t["nb_max"]) + a.shape[2:]
                a = np.concatenate(
                    [a, np.full(pad_shape, fill, dtype=a.dtype)], axis=1
                )
            return a.reshape((t["n_trees"] * nb,) + a.shape[2:])

        sh = lambda *spec: NamedSharding(self.mesh, P_(*spec))
        stack = lambda key_, fill: jax.device_put(
            jnp.asarray(np.stack([repad(t, key_, fill) for t in tabs])),
            sh(*([AXIS] + [None] * tabs[0][key_].ndim)),
        )
        fills = [t["fill"] for t in tabs]
        pack = {
            "n_trees": T,
            "block": P,
            "nb_max": nb,
            "fill": float(np.mean(fills)),
            "cent": stack("cent", 0.0),
            "caux": stack("caux", 0.0),
            "valid": stack("valid", False),
            "blk_rows": stack("blk_rows", 0),
            "blk_aux": stack("blk_aux", 0.0),
            "blk_slots": stack("blk_slots", -1),
            "blk_scale": stack("blk_scale", 0.0),
        }
        self._probe_cache[key] = pack
        return pack

    def probe_search(
        self,
        queries: np.ndarray,
        count: int,
        search_k: int | None = None,
        n_trees="auto",
        block="auto",
        dtype: str = "bf16",
    ):
        """Leaf-probe fan-out: each shard ranks + gathers + re-scores its
        own block tables (no serial pop loop anywhere), then one
        all_gather merges per-shard top-k on raw distances — the sharded
        twin of `probe.make_probe_fn` (ICI carries n*k scalars/query)."""
        from ..probe import _next_pow2 as np2

        metric, dims = self.metric, self.dims
        n = self.mesh.devices.size
        b = len(np.asarray(queries))
        if self.n_items_total == 0 or self.n_trees == 0:
            return (
                np.zeros((b, count), np.int64),
                np.full((b, count), np.nan, np.float32),
            )
        pack = self.enable_probe(n_trees=n_trees, block=block, dtype=dtype)
        if search_k is None:
            search_k = count * self.n_trees * n * metric.default_oversampling
        sk_local = max(-(-int(search_k) // n), count)
        T, P, nb = pack["n_trees"], pack["block"], pack["nb_max"]
        eff = max(int(T * P * pack["fill"]), 1)
        L = max(1, min(-(-sk_local // eff), nb))
        k = max(1, int(count))
        over = 3 if dtype == "bq" else 1
        floor = max(32 * k * over, 512 * over)
        if dtype == "bq":
            floor = max(floor, sk_local // 2)
        k2 = min(np2(floor), T * L * P)

        qv = metric.encode_np(queries.astype(np.float32))
        qn = metric.item_norms_np(qv, dims)
        qe = np.zeros(len(qv), np.float32)
        rep = NamedSharding(self.mesh, P_(None, None))
        rep1 = NamedSharding(self.mesh, P_(None))
        ids, dists = _sharded_probe_search(
            self.mesh, metric, dims, int(k), int(k2), int(L), int(nb),
            2 if metric.name in ("euclidean", "manhattan") else 1,
            int(count),
            pack["cent"], pack["caux"], pack["valid"],
            pack["blk_rows"], pack["blk_aux"], pack["blk_slots"],
            pack["blk_scale"],
            self.rows, self.norms, self.extras, self.slot_to_id,
            jax.device_put(jnp.asarray(qv), rep),
            jax.device_put(jnp.asarray(qn), rep1),
            jax.device_put(jnp.asarray(qe), rep1),
        )
        ids = np.asarray(ids).astype(np.int64)[:, :count]
        dists = np.asarray(dists)[:, :count]
        if ids.shape[1] < count:
            pad = count - ids.shape[1]
            ids = np.concatenate([ids, np.zeros((b, pad), ids.dtype)], axis=1)
            dists = np.concatenate(
                [dists, np.full((b, pad), np.nan, dists.dtype)], axis=1
            )
        return ids, dists


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "metric", "dims", "sk", "pmax", "w", "k", "count",
        "q_cap", "l_cap",
    ),
)
def _sharded_forest_search(
    mesh,
    metric,
    dims,
    sk,
    pmax,
    w,
    k,
    count,
    q_cap,
    l_cap,
    node_table,
    normals,
    aux,
    leaf_off,
    leaf_cnt,
    leaf_items,
    roots,
    rows,
    norms,
    extras,
    slot_to_id,
    qv,
    qn,
    qe,
    qf,
    sk_dyn,
):
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(AXIS, None, None),  # node_table
            P(AXIS, None, None),  # normals
            P(AXIS, None),  # aux
            P(AXIS, None),  # leaf_off
            P(AXIS, None),  # leaf_cnt
            P(AXIS, None),  # leaf_items
            P(AXIS, None),  # roots
            P(AXIS, None, None),  # rows
            P(AXIS, None),  # norms
            P(AXIS, None),  # extras
            P(AXIS, None),  # slot_to_id
            P(None, None),  # qv
            P(None),
            P(None),
            P(None),
        ),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,  # outputs replicated after all_gather+top_k
    )
    def step(nt, nr, ax, lo, lc, li, rt, rw, nm, ex, s2i, qv_r, qn_r, qe_r, qf_r):
        nt, nr, ax = nt[0], nr[0], ax[0]
        lo, lc, li, rt = lo[0], lc[0], li[0], rt[0]
        rw, nm, ex, s2i = rw[0], nm[0], ex[0], s2i[0]
        cand, _, _ = _traverse_impl(
            metric,
            sk,
            pmax,
            w,
            False,
            nt,
            nr,
            ax,
            lo,
            lc,
            li,
            rt,
            qv_r,
            qf_r,
            jnp.zeros(1, jnp.uint32),
            sk_dyn,
            q_cap=q_cap,
            l_cap=l_cap,
        )
        loc_ids, loc_d = _rescore_impl(
            metric, dims, k, rw, nm, ex, s2i, cand, qv_r, qn_r, qe_r, normalize=False
        )
        # merge across shards on raw built distances (ascending = better
        # for every metric); ICI traffic is n*k scalars per query
        all_d = jax.lax.all_gather(loc_d, AXIS, axis=1, tiled=True)  # [B, n*k]
        all_ids = jax.lax.all_gather(loc_ids, AXIS, axis=1, tiled=True)
        kfin = min(count, all_d.shape[1])
        neg, idx = jax.lax.top_k(-all_d, kfin)
        out_d = -neg
        out_ids = jnp.take_along_axis(all_ids, idx, axis=1)
        out_d = jnp.where(
            out_d < jnp.inf,
            metric.normalized_distance(out_d, dims),
            jnp.float32(jnp.nan),
        )
        return out_ids, out_d

    return step(
        node_table,
        normals,
        aux,
        leaf_off,
        leaf_cnt,
        leaf_items,
        roots,
        rows,
        norms,
        extras,
        slot_to_id,
        qv,
        qn,
        qe,
        qf,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "metric", "dims", "k", "k2", "L", "nb_max", "scale", "count",
    ),
)
def _sharded_probe_search(
    mesh, metric, dims, k, k2, L, nb_max, scale, count,
    cent, caux, valid, blk_rows, blk_aux, blk_slots, blk_scale,
    rows, norms, extras, slot_to_id,
    qv, qn, qe,
):
    """shard_map over the mesh: per-shard leaf-probe (probe._probe_core,
    raw distances) + all_gather top-k merge — same merge contract as
    `_sharded_forest_search`."""
    from ..probe import _probe_core

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(AXIS, None, None),  # cent
            P(AXIS, None),  # caux
            P(AXIS, None),  # valid
            P(AXIS, None, None, None),  # blk_rows
            P(AXIS, None, None),  # blk_aux
            P(AXIS, None, None),  # blk_slots
            P(AXIS, None, None),  # blk_scale
            P(AXIS, None, None),  # rows
            P(AXIS, None),  # norms
            P(AXIS, None),  # extras
            P(AXIS, None),  # slot_to_id
            P(None, None),  # qv
            P(None),
            P(None),
        ),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,  # outputs replicated after all_gather+top_k
    )
    def step(ce, ca, va, br, ba, bs, bsc, rw, nm, ex, s2i, qv_r, qn_r, qe_r):
        ce, ca, va = ce[0], ca[0], va[0]
        br, ba, bs, bsc = br[0], ba[0], bs[0], bsc[0]
        rw, nm, ex, s2i = rw[0], nm[0], ex[0], s2i[0]
        loc_ids, loc_d = _probe_core(
            metric, dims, k, k2, L, nb_max, scale,
            ce, ca, va, br, ba, bs, bsc,
            rw, nm, ex, s2i,
            qv_r, qn_r, qe_r,
            normalize=False,
        )
        all_d = jax.lax.all_gather(loc_d, AXIS, axis=1, tiled=True)
        all_ids = jax.lax.all_gather(loc_ids, AXIS, axis=1, tiled=True)
        kfin = min(count, all_d.shape[1])
        neg, idx = jax.lax.top_k(-all_d, kfin)
        out_d = -neg
        out_ids = jnp.take_along_axis(all_ids, idx, axis=1)
        out_d = jnp.where(
            out_d < jnp.inf,
            metric.normalized_distance(out_d, dims),
            jnp.float32(jnp.nan),
        )
        return out_ids, out_d

    return step(
        cent, caux, valid, blk_rows, blk_aux, blk_slots, blk_scale,
        rows, norms, extras, slot_to_id, qv, qn, qe,
    )
