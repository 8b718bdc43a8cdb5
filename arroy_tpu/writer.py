"""Writer: item mutation + forest building.

Public surface mirrors the reference `Writer`/`ArroyBuilder`
(reference: src/writer.rs:37-265,271-485): `add_item`, `append_item`,
`del_item`, `clear`, `iter`, `need_build`, `contains_item`,
`item_vector`, `prepare_changing_distance`, and `builder()` with
`n_trees` / `split_after` / `available_memory` / `cancel` / `progress`.

`build()` follows the reference's orchestration step for step
(reference: src/writer.rs:487-629):

1. distance preprocess (Bachrach pass for dot-product);
2. drain the Updated set → (to_delete, to_insert);
3. tiny-corpus fast path: one descendants node (src/writer.rs:916-962);
4. tree-count targeting + extra-tree deletion (src/writer.rs:1358-1394);
5. delete removed items from every tree with branch collapse/merge
   (src/writer.rs:1021-1114);
6. route inserted items down the frozen trees into descendants
   (src/writer.rs:1398-1459);
7. grow every oversized descendant — this is where the TPU build engine
   (builder.grow_trees) replaces the rayon recursion;
8. write metadata + version.
"""

from __future__ import annotations

import dataclasses
import math
import os
from dataclasses import dataclass
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .builder import BuildContext, grow_trees, route_items
from .errors import InvalidItemAppend
from .metrics import Metric, resolve_metric
from .models.forest import KIND_LEAF, Forest, NodeIdAllocator
from .progress import CancelFn, MainStep, ProgressFn, SubStep, WriterProgress
from .store.database import Database, IndexState, Metadata, WriteTxn
from .utils.itemset import ItemSet
from .version import CURRENT_VERSION


def _never_cancel() -> bool:
    """Default no-op cancel.  A named sentinel (not a bare lambda) so the
    build engine can tell "no callback registered" apart from a real one
    and bound fused-group wall time only when cancellation matters
    (builder._CANCEL_BOUND_S; reference poll sites: src/writer.rs:117-124)."""
    return False


@dataclass
class BuildOptions:
    """Reference `BuildOption` (src/writer.rs:96-114)."""

    n_trees: Optional[int] = None
    split_after: Optional[int] = None
    available_memory: Optional[int] = None
    cancel: CancelFn = _never_cancel
    progress: ProgressFn = lambda p: None
    seed: int = 42
    #: jax.sharding.Mesh: grow the forest with the per-level compute
    #: sharded over the mesh (parallel/build.py) — the multi-chip
    #: counterpart of the reference's rayon pool (src/writer.rs:568-591).
    #: Ignored when available_memory streaming is active.
    mesh: object = None


class ArroyBuilder:
    """Fluent build-option builder (reference: src/writer.rs:126-265)."""

    def __init__(self, writer: "Writer", seed: int):
        self._writer = writer
        self._opt = BuildOptions(seed=seed)

    def n_trees(self, n: int) -> "ArroyBuilder":
        self._opt.n_trees = int(n)
        return self

    def split_after(self, n: int) -> "ArroyBuilder":
        self._opt.split_after = int(n)
        return self

    def available_memory(self, n_bytes: int) -> "ArroyBuilder":
        self._opt.available_memory = int(n_bytes)
        return self

    def cancel(self, fn: CancelFn) -> "ArroyBuilder":
        self._opt.cancel = fn
        return self

    def mesh(self, mesh) -> "ArroyBuilder":
        """Build over a `jax.sharding.Mesh`: one forest, compute sharded."""
        self._opt.mesh = mesh
        return self

    def progress(self, fn: ProgressFn) -> "ArroyBuilder":
        self._opt.progress = fn
        return self

    def build(self, wtxn: WriteTxn) -> None:
        self._writer._build(wtxn, self._opt)


def target_n_trees(
    n_trees: Optional[int], dimensions: int, item_ids: np.ndarray, roots: list[int]
) -> int:
    """Tree-count formula + shrink hysteresis (reference: src/writer.rs:1358-1394)."""
    if n_trees is not None:
        return int(n_trees)
    nb_vec = float(len(item_ids))
    if nb_vec == 0.0:
        return 1
    if nb_vec < 10_000.0:
        nb_trees = 2.0 ** (math.log2(nb_vec) - 6.0)
    else:
        nb_trees = 2.0 ** (
            math.log10(nb_vec)
            + math.log10(float(dimensions))
            + (768.0 / float(dimensions)) ** 4.0
        )
    nb_trees = int(math.ceil(nb_trees))
    if len(roots) > nb_trees:
        tree_to_remove = len(roots) - nb_trees
        if tree_to_remove / nb_trees < 0.20:
            nb_trees = len(roots)
    return max(nb_trees, 1)


#: per-grow-pass bounds.  The two-means sample gather is chunked along
#: the segment axis (builder._two_means), so the working set of one
#: batched grow is dominated by the permutation/sort arrays (~8 bytes a
#: slot) plus fixed per-segment bookkeeping — many whole trees now grow
#: level-synchronously in ONE pass (one device round-trip per level for
#: the whole group instead of per tree; at 1.18M x 25 trees the per-tree
#: grouping cost ~875 tunnel syncs, this costs ~40).
_GROW_GROUP_SPLITS = 262_144
_GROW_GROUP_ITEMS = 32 << 20
#: cap on (padded lane frame x storage dim) per grow group: a
#: 33.5M-lane frame at 1536-d (lanes x sd ~ 2^35.6) reproducibly
#: faulted the TPU worker inside the fused level program (32-bit
#: linear-index territory for fused intermediates), while 16.7M x 1536
#: and 33.5M x 100 both run clean — so groups are sized to keep
#: next_pow2(lanes) x sd at or under the proven 2^34.6 product
_GROW_GROUP_LANE_DIM = 1 << 34


def _swap_remove0(lst: list) -> object:
    """Vec::swap_remove(0) (reference: src/writer.rs:648)."""
    removed = lst[0]
    last = lst.pop()
    if lst:
        lst[0] = last
    return removed


class Writer:
    """Stores and removes items and builds the forest over them."""

    def __init__(self, database: Database, index: int, dimensions: int, metric="euclidean"):
        self.database = database
        self.index = int(index)
        self.dimensions = int(dimensions)
        self.metric: type[Metric] = resolve_metric(metric)

    # -- item mutation (reference: src/writer.rs:380-452) ---------------
    def _state(self, wtxn: WriteTxn) -> IndexState:
        return wtxn.state_mut(self.index, self.dimensions, self.metric)

    def add_item(self, wtxn: WriteTxn, item: int, vector) -> None:
        st = self._state(wtxn)
        st.store.put(item, np.asarray(vector, dtype=np.float32))
        st.updated.add(int(item))

    def add_items(self, wtxn: WriteTxn, items, vectors) -> None:
        """Bulk add — vectorized encode of a whole [n, dims] matrix."""
        st = self._state(wtxn)
        items = np.asarray(items)
        st.store.put_many(items, np.asarray(vectors, dtype=np.float32))
        st.updated.update(int(i) for i in items)

    def append_item(self, wtxn: WriteTxn, item: int, vector) -> None:
        """Fast ordered insert; errors when `item` would not be the last key.

        Reference: src/writer.rs:401-421 — LMDB APPEND requires the new
        key to sort after every existing key, which also means no higher
        sub-index may contain data.
        """
        st = self._state(wtxn)
        item = int(item)
        if len(st.store) > 0 and item <= st.store.max_id():
            raise InvalidItemAppend()
        for other in wtxn.indexes():
            if other > self.index:
                other_st = wtxn.state(other)
                if other_st is not None and (
                    len(other_st.store) > 0 or other_st.updated
                ):
                    raise InvalidItemAppend()
        st.store.put(item, np.asarray(vector, dtype=np.float32))
        st.updated.add(item)

    def del_item(self, wtxn: WriteTxn, item: int) -> bool:
        st = self._state(wtxn)
        if st.store.delete(item):
            st.updated.add(int(item))
            return True
        return False

    def del_items(self, wtxn: WriteTxn, items) -> int:
        """Bulk delete; returns how many of `items` existed.

        Batched counterpart of `del_item` (reference has only the scalar
        form, src/writer.rs:424-436) — one state lookup for the whole
        batch instead of one per id.
        """
        st = self._state(wtxn)
        n = 0
        delete = st.store.delete
        mark = st.updated.add
        for i in np.asarray(items).tolist():
            if delete(i):
                mark(int(i))
                n += 1
        return n

    def clear(self, wtxn: WriteTxn) -> None:
        """Remove user items and tree nodes alike (reference: src/writer.rs:439-452)."""
        wtxn.drop_index(self.index)

    # -- introspection -------------------------------------------------
    def need_build(self, rtxn_or_wtxn) -> bool:
        st = rtxn_or_wtxn.state(self.index)
        if st is None:
            return True
        return bool(st.updated) or st.metadata is None

    def contains_item(self, txn, item: int) -> bool:
        st = txn.state(self.index)
        return st is not None and int(item) in st.store

    def item_vector(self, txn, item: int) -> Optional[np.ndarray]:
        st = txn.state(self.index)
        if st is None:
            return None
        return st.store.get_vector(item)

    def is_empty(self, txn) -> bool:
        st = txn.state(self.index)
        return st is None or len(st.store) == 0

    def iter(self, txn) -> Iterator[tuple[int, np.ndarray]]:
        st = txn.state(self.index)
        if st is None:
            return iter(())
        ids = st.store.ids()
        return ((int(i), st.store.get_vector(int(i))) for i in ids)

    def prepare_changing_distance(self, wtxn: WriteTxn, new_metric) -> "Writer":
        """Clear tree nodes and re-encode items for a new distance.

        Reference: src/writer.rs:288-319.
        """
        new_metric = resolve_metric(new_metric)
        if new_metric is not self.metric:
            st = wtxn.state(self.index)
            if st is not None:
                st = wtxn.state_mut(self.index)
                items = [(int(i), st.store.get_vector(int(i))) for i in st.store.ids()]
                from .models.items import ItemStore

                st.metric = new_metric
                st.store = ItemStore(new_metric, self.dimensions)
                for i, v in items:
                    st.store.put(i, v)
                st.forest = Forest()
                st.metadata = None
        return Writer(self.database, self.index, self.dimensions, new_metric)

    def builder(self, seed: int = 42) -> ArroyBuilder:
        return ArroyBuilder(self, seed)

    # ------------------------------------------------------------------
    # the build orchestration
    # ------------------------------------------------------------------
    def _build(self, wtxn: WriteTxn, opt: BuildOptions) -> None:
        from .errors import BuildCancelled

        def cancelled():
            if opt.cancel():
                raise BuildCancelled()

        # phase timing (ARROY_BUILD_TIMING): piggyback on the progress
        # callback — each MainStep transition prints the elapsed time of
        # the phase it closes, so tunnel-bound buckets (corpus upload,
        # staging pull) are attributable without a profiler
        if os.environ.get("ARROY_BUILD_TIMING", "") in ("1", "2"):
            import sys as _sys
            import time as _time

            _user_progress = opt.progress
            _ph = [_time.perf_counter(), "start"]

            def _timed_progress(p, _up=_user_progress):
                now = _time.perf_counter()
                dt = now - _ph[0]
                if dt >= 0.05:
                    print(
                        f"  [phase] {_ph[1]}: {dt:.2f}s",
                        file=_sys.stderr,
                        flush=True,
                    )
                _ph[0], _ph[1] = now, p.main.name
                _up(p)

            opt = dataclasses.replace(opt, progress=_timed_progress)

        st = self._state(wtxn)
        metric, dims = st.metric, st.dims
        split_after = opt.split_after if opt.split_after is not None else dims

        # 1. preprocess (reference: src/writer.rs:964-976)
        opt.progress(WriterProgress(MainStep.PRE_PROCESSING_THE_ITEMS))
        cancelled()
        item_ids = st.store.ids()
        if metric.has_extra and len(item_ids):
            slots = st.store.slots_of(item_ids)
            vectors = st.store.rows()[slots]
            norms, extras = metric.preprocess_np(vectors)
            st.store.set_preprocess(norms, extras, slots)

        opt.progress(WriterProgress(MainStep.RETRIEVING_THE_ITEMS_IDS))
        cancelled()

        # 2. drain Updated (reference: src/writer.rs:891-914)
        opt.progress(WriterProgress(MainStep.RETRIEVE_THE_UPDATED_ITEMS))
        updated = ItemSet(np.fromiter(st.updated, dtype=np.int64, count=len(st.updated)))
        st.updated = set()

        # 3. tiny-corpus fast path (reference: src/writer.rs:499-501,916-962)
        if len(item_ids) <= split_after:
            opt.progress(WriterProgress(MainStep.WRITING_THE_DESCENDANTS_AND_METADATA))
            forest = Forest()
            roots: list[int] = []
            if len(item_ids):
                forest.put_leaf(0, item_ids)
                roots = [0]
            forest.roots = roots
            forest.repack_normals(
                np.zeros((0, metric.storage_dim(dims)), np.uint32 if metric.binary else np.float32),
                np.zeros(0, np.float32),
            )
            cancelled()
            opt.progress(WriterProgress(MainStep.WRITE_THE_METADATA))
            st.forest = forest
            st.metadata = Metadata(dims, ItemSet.from_sorted(item_ids), roots, metric.name)
            st.version = CURRENT_VERSION
            return

        to_delete = updated
        to_insert = ItemSet.from_sorted(item_ids).intersection(updated)

        roots = list(st.metadata.roots) if st.metadata is not None else []
        forest = st.forest

        opt.progress(WriterProgress(MainStep.RETRIEVING_THE_USED_TREE_NODES))
        cancelled()
        alloc = NodeIdAllocator(forest.used_node_ids())

        # 4. tree-count targeting (reference: src/writer.rs:521-522,631-653)
        target = target_n_trees(opt.n_trees, dims, item_ids, roots)
        opt.progress(WriterProgress(MainStep.DELETING_EXTRA_TREES))
        extraneous = max(len(roots) - target, 0)
        for _ in range(extraneous):
            cancelled()
            if not roots:
                break
            root = _swap_remove0(roots)
            forest.delete_subtree(root)

        # 5. delete removed items from every tree (reference: src/writer.rs:978-1114)
        opt.progress(WriterProgress(MainStep.REMOVE_ITEMS_FROM_EXISTING_TREES))
        if len(to_delete):
            roots = [
                self._delete_items_in_tree(forest, r, to_delete, split_after, cancelled)
                for r in roots
            ]
        roots.sort()

        # freeze: build the device-side context
        opt.progress(WriterProgress(MainStep.RETRIEVING_THE_ITEMS))
        cancelled()
        sd = metric.storage_dim(dims)
        slot_to_id = st.store.slot_ids()

        budget_items = None
        if opt.available_memory is not None:
            item_bytes = 4 + (sd * 4)
            budget_items = max(opt.available_memory // item_bytes, dims + 1)

        # streaming mode: the item matrix stays on the host and per-batch
        # slot subsets are uploaded on demand (reference fit_in_memory's
        # HBM analog); resident mode uploads the matrix once.  Mesh mode
        # also keeps the host mirror: the sharded grow engine uploads rows
        # with the mesh sharding itself.
        mesh_mode = opt.mesh is not None and budget_items is None
        streaming = (
            budget_items is not None and budget_items < len(item_ids)
        ) or mesh_mode
        if streaming:
            rows_dev = extras_dev = hnorms_dev = None
        else:
            # persistent device mirror: only slots mutated since the last
            # build are scatter-uploaded (incremental builds stop paying a
            # full-matrix host->device transfer; see ItemStore.device_arrays)
            rows_dev, hnorms_dev, extras_dev = st.store.device_arrays()

        staging = []
        staging_aux = []
        staged_rows = 0
        if forest.normals is not None and forest.normals.shape[0]:
            staging = [forest.normals]
            staging_aux = [np.asarray(forest.aux, np.float32)]
            staged_rows = int(forest.normals.shape[0])

        sub = SubStep("items", max(len(item_ids), 1))

        def on_indexed(n: int) -> None:
            sub.add(n)

        ctx = BuildContext(
            metric=metric,
            dims=dims,
            split_after=split_after,
            rows_dev=rows_dev,
            extras_dev=extras_dev,
            hnorms_dev=hnorms_dev,
            slot_to_id=slot_to_id,
            forest=forest,
            alloc=alloc,
            cancel=opt.cancel,
            cancel_active=opt.cancel is not _never_cancel,
            budget_items=budget_items,
            rows_np=st.store.rows() if streaming else None,
            extras_np=st.store.extras() if streaming else None,
            hnorms_np=st.store.norms() if streaming else None,
            staging_normals=staging,
            staging_aux=staging_aux,
            staging_rows=staged_rows,
            on_items_indexed=on_indexed,
        )

        key = jax.random.key(opt.seed)

        # 6. route inserted items down the frozen trees
        #    (reference: src/writer.rs:846-888,1119-1159)
        opt.progress(WriterProgress(MainStep.INSERT_ITEMS_IN_CURRENT_TREES))
        descendants: dict[int, ItemSet] = {}
        if len(to_insert) and roots:
            insert_slots = st.store.slots_of(to_insert.ids)
            normals_matrix = ctx.staging_matrix_dev()
            aux_lookup = ctx.staging_aux_np()
            if not len(aux_lookup):
                aux_lookup = np.zeros(1, np.float32)
            # honour the memory budget: in streaming mode each routed
            # batch uploads only its own rows (reference fit_in_memory
            # batches the insert set the same way, src/writer.rs:846-888)
            chunk = budget_items if budget_items is not None else len(insert_slots)
            routed_all: dict[int, list[np.ndarray]] = {}
            for off in range(0, len(insert_slots), max(chunk, 1)):
                cancelled()  # per routing chunk (reference: src/writer.rs:1178,1196)
                part = insert_slots[off : off + chunk]
                routed = route_items(
                    ctx,
                    normals_matrix,
                    aux_lookup,
                    [(r, part) for r in roots],
                    jax.random.fold_in(key, 0x0F0F + off),
                )
                for nid, ls in routed.items():
                    routed_all.setdefault(nid, []).extend(ls)
            for nid, slot_lists in routed_all.items():
                slots = np.concatenate(slot_lists)
                ids = np.unique(slot_to_id[slots].astype(np.int64)).astype(np.uint32)
                old = forest.leaves.get(nid, np.empty(0, np.uint32))
                descendants[nid] = ItemSet.from_sorted(old).union(ids)

        # 7. missing trees (reference: src/writer.rs:545-561)
        opt.progress(WriterProgress(MainStep.RETRIEVE_THE_LARGE_DESCENDANTS))
        nb_missing = max(target - len(roots), 0)
        all_items = ItemSet.from_sorted(item_ids)
        for _ in range(nb_missing):
            cancelled()
            new_id = alloc.next()
            roots.append(new_id)
            descendants[new_id] = all_items

        # one unit = one item placed into a leaf of one tree: every tree
        # being (re)grown places each of its items exactly once
        sub.max = max(
            sum(len(items) for items in descendants.values()), 1
        )
        opt.progress(
            WriterProgress(MainStep.CREATE_TREES_FOR_ITEMS, sub)
        )
        seeds: list[tuple[int, np.ndarray]] = []
        for nid, items in descendants.items():
            cancelled()
            if len(items) <= split_after:
                forest.put_leaf(nid, items.ids)
                on_indexed(len(items))
            else:
                seeds.append((nid, st.store.slots_of(items.ids)))

        if mesh_mode:
            from .parallel.build import grow_trees_sharded

            grow_trees_sharded(ctx, seeds, jax.random.fold_in(key, 0xB111D), opt.mesh)
        else:
            self._grow_with_budget(ctx, seeds, jax.random.fold_in(key, 0xB111D))

        # 8. metadata + version (reference: src/writer.rs:609-628)
        opt.progress(WriterProgress(MainStep.WRITE_THE_METADATA))
        forest.roots = roots
        forest.repack_normals(ctx.staging_matrix_np(), ctx.staging_aux_np())
        st.metadata = Metadata(dims, all_items, list(roots), metric.name)
        st.version = CURRENT_VERSION
        if os.environ.get("ARROY_BUILD_TIMING", "") in ("1", "2"):
            # close the final timing phase (staging pull + metadata)
            opt.progress(WriterProgress(MainStep.WRITE_THE_METADATA))

    # ------------------------------------------------------------------
    def _grow_with_budget(self, ctx: BuildContext, seeds, key) -> None:
        """Build oversized descendants, honouring the memory budget.

        Without a budget every seed is grown in one batched pass.  With a
        budget, each seed builds a skeleton from a sampled batch and
        routes the remaining items through it, recursing into any leaf
        that overflows — the analog of `fit_in_memory` +
        `incremental_index_large_descendant` (reference:
        src/writer.rs:660-739,1536-1584).
        """
        if not seeds:
            return
        if ctx.budget_items is None:
            # Even without a user memory budget, bound each batched grow
            # pass: the permutation/sort arrays cost ~8 bytes a slot and
            # an unbounded seed list (e.g. target_n_trees growing a 150k
            # index from 10 to ~530 trees seeds ~80M items at once) would
            # still allocate tens of GB of frontier state.  Seeds are
            # independent; group them so each grow_trees call stays
            # within a fixed device working set.  (The reference
            # naturally bounds this per rayon task, src/writer.rs:568-591.)
            cap = max(
                min(
                    _GROW_GROUP_SPLITS * ctx.split_after,
                    _GROW_GROUP_ITEMS,
                    _GROW_GROUP_LANE_DIM // max(ctx._sd, 1),
                ),
                ctx.dims + 1,
            )
            groups: list[list] = [[]]
            group_total = 0
            for nid, slots in seeds:
                n = len(slots)
                if groups[-1] and group_total + n > cap:
                    groups.append([])
                    group_total = 0
                groups[-1].append((nid, slots))
                group_total += n
            for gi, group in enumerate(groups):
                if not group:
                    continue
                # cancel granularity: between grow groups as well as
                # between levels inside grow_trees (reference polls at
                # every recursion step, src/writer.rs:117-124)
                ctx.check_cancel()
                # group 0 keeps the ungrouped key so single-group builds
                # (every test/golden) stay byte-identical; later groups
                # MUST differ or identical seed item-sets (new trees over
                # all items) would grow identical trees
                gkey = key if gi == 0 else jax.random.fold_in(key, 0x6B0 + gi)
                grow_trees(ctx, group, gkey)
            return

        rng = np.random.default_rng(
            np.asarray(jax.random.key_data(key)).ravel()
        )
        stack = list(seeds)
        #: re-growth attempts per node: the batch skeleton can fail to
        #: shrink a pathological node (e.g. all-duplicate vectors); after
        #: a few keyed retries accept it as an oversized descendant — the
        #: budget-mode twin of grow_trees' _MAX_LEVELS safety valve
        attempts: dict[int, int] = {}
        _MAX_REGROW = 8
        while stack:
            ctx.check_cancel()  # per budget-mode regrow step
            nid, slots = stack.pop()
            slots = np.asarray(slots, dtype=np.int32)
            att = attempts.get(nid, 0)
            attempts[nid] = att + 1
            if len(slots) <= ctx.split_after or att >= _MAX_REGROW:
                ids = np.sort(ctx.slot_to_id[slots].astype(np.int64)).astype(np.uint32)
                ctx.forest.put_leaf(nid, ids)
                ctx.on_items_indexed(len(ids))
                continue
            # the sampled skeleton batch must itself be splittable, or the
            # routed remainder collapses back onto `nid` forever
            batch_n = min(
                len(slots),
                max(ctx.budget_items, ctx.dims + 1, ctx.split_after + 1),
            )
            grow_key = jax.random.fold_in(jax.random.fold_in(key, nid), att)
            if batch_n >= len(slots):
                grow_trees(ctx, [(nid, slots)], grow_key)
                continue
            sel = rng.choice(len(slots), size=batch_n, replace=False)
            mask = np.zeros(len(slots), bool)
            mask[sel] = True
            batch, rest = slots[mask], slots[~mask]
            grow_trees(ctx, [(nid, batch)], grow_key)
            # route the remainder through the fresh skeleton in budget batches
            normals_matrix = ctx.staging_matrix_dev()
            aux_lookup = ctx.staging_aux_np()
            if not len(aux_lookup):
                aux_lookup = np.zeros(1, np.float32)
            off = 0
            routed_all: dict[int, list[np.ndarray]] = {}
            while off < len(rest):
                part = rest[off : off + batch_n]
                off += batch_n
                routed = route_items(
                    ctx,
                    normals_matrix,
                    aux_lookup,
                    [(nid, part)],
                    jax.random.fold_in(key, nid * 31 + off),
                )
                for lid, ls in routed.items():
                    routed_all.setdefault(lid, []).extend(ls)
            for lid, slot_lists in routed_all.items():
                old_ids = ctx.forest.leaves.get(lid, np.empty(0, np.uint32))
                old_slots = (
                    ctx.ids_to_slots(old_ids) if len(old_ids) else np.empty(0, np.int32)
                )
                merged = np.unique(np.concatenate([old_slots, *slot_lists])).astype(np.int32)
                if len(merged) <= ctx.split_after:
                    ids = np.sort(ctx.slot_to_id[merged].astype(np.int64)).astype(np.uint32)
                    ctx.forest.put_leaf(lid, ids)
                    ctx.on_items_indexed(len(ids))
                else:
                    stack.append((lid, merged))

    @staticmethod
    def _delete_items_in_tree(
        forest: Forest, root: int, to_delete: ItemSet, split_after: int, cancelled
    ) -> int:
        """Prune + collapse pass (reference: src/writer.rs:1021-1114).

        Iterative post-order (explicit stack): incremental builds can
        graft subtrees under existing leaves build after build, so tree
        height is unbounded — Python recursion would exhaust the C stack.
        """
        # results[nid] = (replacement_nid, leaf_ids_or_None)
        results: dict[int, tuple[int, object]] = {}
        stack: list[tuple[int, bool]] = [(int(root), False)]
        while stack:
            cancelled()
            nid, expanded = stack.pop()
            if not expanded:
                if forest.kind[nid] == KIND_LEAF:
                    old = forest.leaves[nid]
                    # searchsorted membership, NOT ItemSet.difference —
                    # difference() re-sorts to_delete per call, making a
                    # mass delete O(M x leaves) (measured: minutes at
                    # 1.18M x 25 trees); old is sorted so the masked
                    # select stays sorted-unique
                    new = old[~to_delete.contains_many(old)]
                    if len(new) != len(old):
                        forest.put_leaf(nid, new)
                    results[nid] = (nid, new)
                    continue
                stack.append((nid, True))
                stack.append((int(forest.left[nid]), False))
                stack.append((int(forest.right[nid]), False))
                continue
            nl, li = results.pop(int(forest.left[nid]))
            nr, ri = results.pop(int(forest.right[nid]))
            if li is not None and len(li) == 0:
                forest.remove(nl)
                forest.remove(nid)
                results[nid] = (nr, ri)
                continue
            if ri is not None and len(ri) == 0:
                forest.remove(nr)
                forest.remove(nid)
                results[nid] = (nl, li)
                continue
            if li is not None and ri is not None and len(li) + len(ri) <= split_after:
                forest.remove(nl)
                forest.remove(nr)
                merged = np.union1d(li, ri).astype(np.uint32)
                forest.put_leaf(nid, merged)
                results[nid] = (nid, merged)
                continue
            forest.left[nid] = nl
            forest.right[nid] = nr
            results[nid] = (nid, None)
        return int(results[int(root)][0])


