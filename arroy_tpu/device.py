"""Device mirror of one committed index generation.

Packs the host `ItemStore` + `Forest` into flat device tensors for the
query engine: node table gathers, CSR leaf membership, the normals
matrix and the item matrix.  Built lazily and cached per generation by
the Database; immutable once created (the LMDB-snapshot role,
reference: src/parallel.rs:262-314 ImmutableLeafs/ImmutableTrees).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from .metrics import Metric
from .models.forest import KIND_FREE, KIND_LEAF, KIND_SPLIT, KIND_SPLIT_NONE, Forest
from .models.items import ItemStore


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


@dataclass(frozen=True)
class DeviceIndex:
    metric: type[Metric]
    dims: int
    # items
    rows: jnp.ndarray  # [cap, sd]
    norms: jnp.ndarray  # [cap]
    extras: jnp.ndarray  # [cap]
    slot_to_id: jnp.ndarray  # [cap] uint32 (0xFFFFFFFF where meaningless; use
    # `live` to distinguish — u32::MAX is a legal item id)
    live: jnp.ndarray  # [cap] bool
    slot_to_id_np: np.ndarray  # [cap] int64, -1 free
    # forest node table
    kind: jnp.ndarray  # [Np] int32
    left: jnp.ndarray
    right: jnp.ndarray
    ptr: jnp.ndarray
    #: packed per-node row [Np, 8]: kind,left,right,ptr,leaf_off,leaf_cnt,0,0 —
    #: one gather per pop in the traversal loop instead of six
    node_table: jnp.ndarray
    normals: jnp.ndarray  # [S, sd]
    aux: jnp.ndarray  # [S]
    leaf_off: jnp.ndarray  # [L] int32 into leaf_items
    leaf_cnt: jnp.ndarray  # [L]
    leaf_items: jnp.ndarray  # [total + W] int32 slots, -1 padded
    roots: tuple[int, ...]
    n_nodes: int
    n_items: int
    max_leaf: int
    cap: int
    #: ascending-sorted leaf sizes, cumulative (host) — bounds the number
    #: of leaf pops any query can need to reach a candidate budget
    leaf_cum_np: np.ndarray = None
    #: number of split nodes — bounds queue pushes (each split node enters
    #: the priority queue at most once: one parent, popped once)
    n_splits: int = 0
    #: table rows poppable without yielding candidates (empty leaves, FREE)
    n_dead_pops: int = 0

    def max_leaf_pops(self, search_k: int) -> int:
        """Worst-case non-empty leaf pops before `search_k` candidate
        slots are filled: take the smallest leaves first."""
        if self.leaf_cum_np is None or len(self.leaf_cum_np) == 0:
            return max(search_k, 1)
        m = int(np.searchsorted(self.leaf_cum_np, search_k, side="left")) + 1
        return min(m, len(self.leaf_cum_np))

    def nbytes(self) -> int:
        """HBM footprint of this index's device arrays (the budget a
        serving deployment must reserve per resident generation; the
        analog of the reference's LMDB map-size accounting)."""
        total = 0
        for f in (
            self.rows, self.norms, self.extras, self.slot_to_id, self.live,
            self.kind, self.left, self.right, self.ptr, self.node_table,
            self.normals, self.aux, self.leaf_off, self.leaf_cnt,
            self.leaf_items,
        ):
            total += int(np.prod(f.shape)) * f.dtype.itemsize
        return total

    @staticmethod
    def estimate_nbytes(metric: type[Metric], dims: int, n_items: int, n_trees: int) -> int:
        """Pre-build HBM estimate: item matrix + ~2 nodes per `dims`-sized
        leaf per tree (split_after = dims, reference src/writer.rs:474-477)."""
        sd = metric.storage_dim(dims)
        itemsize = 4
        items = n_items * (sd + 4) * itemsize  # rows + norm/extra/id/live
        n_leaves = max(-(-n_items // max(dims // 2, 1)), 1)  # half-full leaves
        nodes = 2 * n_leaves * n_trees
        forest = nodes * (12 * itemsize) + n_leaves * n_trees * 2 * itemsize
        forest += (nodes // 2) * sd * itemsize  # split normals
        forest += n_items * n_trees * itemsize  # CSR membership per tree
        return items + forest

    @staticmethod
    def build_np(metric: type[Metric], dims: int, store: ItemStore, forest: Forest) -> dict:
        """Host-side pack of all index arrays (used by build() and by the
        sharded index, which stacks several packs before upload)."""
        cap = max(store.capacity(), 1)
        sd = metric.storage_dim(dims)
        np_dtype = np.uint32 if metric.binary else np.float32
        rows = np.zeros((cap, sd), dtype=np_dtype)
        rows[: store.capacity()] = store.rows()
        norms = np.zeros(cap, np.float32)
        norms[: store.capacity()] = store.norms()
        extras = np.zeros(cap, np.float32)
        extras[: store.capacity()] = store.extras()
        s2i = np.full(cap, -1, np.int64)
        s2i[: store.capacity()] = store.slot_ids()

        # id -> slot lookup for converting leaf id-sets to slots
        live = np.nonzero(s2i >= 0)[0]
        live_ids = s2i[live]
        order = np.argsort(live_ids)
        sorted_ids = live_ids[order]
        sorted_slots = live[order].astype(np.int32)

        n_table = max(int(forest.kind.shape[0]), 1)
        kind = np.full(n_table, KIND_FREE, np.int32)
        kind[: forest.kind.shape[0]] = forest.kind
        left = np.zeros(n_table, np.int32)
        left[: forest.left.shape[0]] = forest.left
        right = np.zeros(n_table, np.int32)
        right[: forest.right.shape[0]] = forest.right
        ptr = np.zeros(n_table, np.int32)
        ptr[: forest.ptr.shape[0]] = forest.ptr

        # CSR leaves
        leaf_nodes = sorted(forest.leaves)
        offs, cnts, chunks = [], [], []
        off = 0
        max_leaf = 1
        for li, nid in enumerate(leaf_nodes):
            ids = forest.leaves[nid]
            pos = np.searchsorted(sorted_ids, ids.astype(np.int64))
            slots = sorted_slots[np.minimum(pos, max(len(sorted_ids) - 1, 0))] if len(sorted_ids) else np.empty(0, np.int32)
            offs.append(off)
            cnts.append(len(ids))
            chunks.append(slots.astype(np.int32))
            ptr[nid] = li
            off += len(ids)
            max_leaf = max(max_leaf, len(ids))
        flat = (
            np.concatenate(chunks) if chunks else np.empty(0, np.int32)
        )
        flat = np.concatenate([flat, np.full(max_leaf, -1, np.int32)])

        normals = forest.normals
        aux = forest.aux
        if normals is None or normals.shape[0] == 0:
            normals = np.zeros((1, sd), dtype=np_dtype)
            aux = np.zeros(1, np.float32)

        offs_arr = np.asarray(offs, np.int32) if offs else np.zeros(1, np.int32)
        cnts_arr = np.asarray(cnts, np.int32) if cnts else np.zeros(1, np.int32)
        node_table = np.zeros((n_table, 8), np.int32)
        node_table[:, 0] = kind
        node_table[:, 1] = left
        node_table[:, 2] = right
        node_table[:, 3] = ptr
        is_leaf_node = kind == KIND_LEAF
        li = np.clip(ptr, 0, len(offs_arr) - 1)
        node_table[:, 4] = np.where(is_leaf_node, offs_arr[li], 0)
        node_table[:, 5] = np.where(is_leaf_node, cnts_arr[li], 0)

        nonzero_cnts = cnts_arr[cnts_arr > 0]
        leaf_cum = np.cumsum(np.sort(nonzero_cnts)).astype(np.int64)
        n_splits = int(np.count_nonzero((kind == KIND_SPLIT) | (kind == KIND_SPLIT_NONE)))
        # rows a traversal could pop without yielding candidates: empty
        # leaves, FREE rows (defensively drained as no-ops)
        n_dead_pops = int(n_table - n_splits - len(nonzero_cnts))

        return dict(
            leaf_cum_np=leaf_cum,
            n_splits=n_splits,
            n_dead_pops=n_dead_pops,
            rows=rows,
            norms=norms,
            extras=extras,
            slot_to_id=np.where(s2i >= 0, s2i, 0xFFFFFFFF).astype(np.uint32),
            live=s2i >= 0,
            slot_to_id_np=s2i,
            kind=kind,
            node_table=node_table,
            left=left,
            right=right,
            ptr=ptr,
            normals=normals,
            aux=aux,
            leaf_off=offs_arr,
            leaf_cnt=cnts_arr,
            leaf_items=flat,
            roots=tuple(int(r) for r in forest.roots),
            n_nodes=forest.n_nodes(),
            n_items=len(store),
            max_leaf=max_leaf,
            cap=cap,
        )

    @staticmethod
    def build(metric: type[Metric], dims: int, store: ItemStore, forest: Forest) -> "DeviceIndex":
        import os

        pk = DeviceIndex.build_np(metric, dims, store, forest)
        # ARROY_SERVING_DTYPE=bf16: hold the item matrix on device in
        # bfloat16 (half the HBM — e.g. 4M x 768 = 6.1 GB instead of
        # 12.3 GB, which does not fit v5e-1 alongside anything else).
        # Exact-engine distances then re-score from bf16 rows (~3
        # significant digits; measured recall vs the f32 oracle is the
        # demo's job).  f32 metrics only; default remains f32.
        serve_bf16 = (
            os.environ.get("ARROY_SERVING_DTYPE", "").lower() == "bf16"
            and not metric.binary
        )
        if serve_bf16:
            import ml_dtypes  # jax dependency; cast on HOST so the f32
            # matrix never transits the tunnel or touches HBM

            rows_d = jnp.asarray(pk["rows"].astype(ml_dtypes.bfloat16))
            norms_d = jnp.asarray(pk["norms"])
            extras_d = jnp.asarray(pk["extras"])
        elif store.capacity() > 0:
            # reuse the store's persistent device mirror (identical
            # content; build_np only zero-pads an empty store) — opening a
            # reader after a build in the same process transfers no rows
            rows_d, norms_d, extras_d = store.device_arrays()
        else:
            rows_d = jnp.asarray(pk["rows"])
            norms_d = jnp.asarray(pk["norms"])
            extras_d = jnp.asarray(pk["extras"])
        return DeviceIndex(
            metric=metric,
            dims=dims,
            rows=rows_d,
            norms=norms_d,
            extras=extras_d,
            slot_to_id=jnp.asarray(pk["slot_to_id"]),
            live=jnp.asarray(pk["live"]),
            slot_to_id_np=pk["slot_to_id_np"],
            kind=jnp.asarray(pk["kind"]),
            node_table=jnp.asarray(pk["node_table"]),
            left=jnp.asarray(pk["left"]),
            right=jnp.asarray(pk["right"]),
            ptr=jnp.asarray(pk["ptr"]),
            normals=jnp.asarray(pk["normals"]),
            aux=jnp.asarray(pk["aux"]),
            leaf_off=jnp.asarray(pk["leaf_off"]),
            leaf_cnt=jnp.asarray(pk["leaf_cnt"]),
            leaf_items=jnp.asarray(pk["leaf_items"]),
            roots=pk["roots"],
            n_nodes=pk["n_nodes"],
            n_items=pk["n_items"],
            max_leaf=pk["max_leaf"],
            cap=pk["cap"],
            leaf_cum_np=pk["leaf_cum_np"],
            n_splits=pk["n_splits"],
            n_dead_pops=pk["n_dead_pops"],
        )
