"""Reader: query engine entry point, stats, and the validity checker.

Mirrors the reference `Reader`/`QueryBuilder`
(reference: src/reader.rs:26-298): `Reader.open` validates metadata /
distance / pending-update state, `nns(count)` returns a query builder
with `search_k`, `oversampling` and `candidates` knobs, and queries run
`by_item` or `by_vector`.  On top of the reference surface there is a
TPU-native batched entry point (`by_vectors` / `by_items`) — the shape
the hardware actually wants — plus brute-force `exact_*` oracles.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from .errors import (
    InvalidVecDimension,
    MissingMetadata,
    NeedBuild,
    UnmatchingDistance,
)
from .metrics import Metric, resolve_metric
from .models.forest import KIND_FREE, KIND_LEAF, KIND_SPLIT, KIND_SPLIT_NONE
from .search import exact_batch, search_batch
from .store.database import Database, IndexState
from .utils.itemset import ItemSet
from .version import Version


@dataclass
class TreeStats:
    """Reference: src/stats.rs:1-23."""

    depth: int
    dummy_normals: int
    split_nodes: int
    descendants: int


@dataclass
class Stats:
    leaf: int
    tree_stats: list[TreeStats]


class QueryBuilder:
    """Reference: src/reader.rs:26-124."""

    def __init__(self, reader: "Reader", count: int):
        self._reader = reader
        self._count = int(count)
        self._search_k: Optional[int] = None
        self._oversampling: Optional[int] = None
        self._candidates: Optional[ItemSet] = None

    def search_k(self, search_k: int) -> "QueryBuilder":
        if int(search_k) <= 0:
            raise ValueError("search_k must be non-zero")
        self._search_k = int(search_k)
        return self

    def oversampling(self, oversampling: int) -> "QueryBuilder":
        if int(oversampling) <= 0:
            raise ValueError("oversampling must be non-zero")
        self._oversampling = int(oversampling)
        return self

    def candidates(self, candidates) -> "QueryBuilder":
        self._candidates = candidates if isinstance(candidates, ItemSet) else ItemSet(candidates)
        return self

    # -- single-query API (arroy parity) --------------------------------
    def by_item(self, item: int) -> Optional[list[tuple[int, float]]]:
        out = self.by_items(np.asarray([item], dtype=np.int64))[0]
        return out

    def by_vector(self, vector) -> list[tuple[int, float]]:
        vector = np.asarray(vector, dtype=np.float32)
        if vector.ndim != 1:
            raise InvalidVecDimension(self._reader.dimensions(), int(np.prod(vector.shape)))
        return self.by_vectors(vector[None, :])[0]

    # -- batched API (the TPU-native hot path) ---------------------------
    def by_items(self, items) -> list[Optional[list[tuple[int, float]]]]:
        r = self._reader
        items = np.asarray(items, dtype=np.int64)
        st = r._state
        present = [int(i) in st.store for i in items]
        if not any(present):
            return [None] * len(items)
        live = items[np.asarray(present)]
        slots = st.store.slots_of(live.astype(np.uint32))
        qv = st.store.rows()[slots]
        qn = st.store.norms()[slots]
        qe = st.store.extras()[slots]
        qf = qe if r.metric.has_extra else np.ones(len(slots), np.float32)
        res = self._run(qv, qn, qe, qf)
        out: list[Optional[list[tuple[int, float]]]] = []
        j = 0
        for p in present:
            if p:
                out.append(res[j])
                j += 1
            else:
                out.append(None)
        return out

    def by_vectors(self, vectors) -> list[list[tuple[int, float]]]:
        r = self._reader
        vectors = np.asarray(vectors, dtype=np.float32)
        if vectors.ndim != 2 or vectors.shape[1] != r.dimensions():
            raise InvalidVecDimension(
                r.dimensions(), int(vectors.shape[-1] if vectors.ndim else 0)
            )
        qv = r.metric.encode_np(vectors)
        # by_vector builds a fresh leaf via new_header (reference:
        # src/reader.rs:64-75): norm from the codec, extra = 0.
        qn = r.metric.item_norms_np(qv, r.dimensions())
        qe = np.zeros(len(qv), np.float32)
        qf = np.zeros(len(qv), np.float32) if r.metric.has_extra else np.ones(len(qv), np.float32)
        return self._run(qv, qn, qe, qf)

    # -------------------------------------------------------------------
    def _effective_search_k(self) -> int:
        # reference: src/reader.rs:330-335
        search_k = (
            self._search_k
            if self._search_k is not None
            else self._count * max(self._reader.n_trees(), 1)
        )
        mult = (
            self._oversampling
            if self._oversampling is not None
            else self._reader.metric.default_oversampling
        )
        return search_k * mult

    def _run(self, qv, qn, qe, qf) -> list[list[tuple[int, float]]]:
        r = self._reader
        if (
            self._count <= 0
            or r._state.metadata is None
            or len(r._state.metadata.items) == 0
        ):
            return [[] for _ in range(len(qv))]
        dev = r._device()
        filter_slots = None
        if self._candidates is not None:
            inter = self._candidates.intersection(ItemSet.from_sorted(r._state.metadata.items.ids))
            filter_slots = r._state.store.slots_of(inter.ids) if len(inter) else np.empty(0, np.int64)
        ids, dists = search_batch(
            dev,
            qv,
            qn,
            qe,
            qf,
            self._count,
            self._effective_search_k(),
            filter_slots,
        )
        out = []
        for row_ids, row_d in zip(ids, dists):
            keep = ~np.isnan(row_d)
            out.append([(int(i), float(d)) for i, d in zip(row_ids[keep], row_d[keep])])
        return out


class Searcher:
    """Compiled device-resident search handle bound to one snapshot.

    ``rescore="auto"`` picks the MXU matmul re-score when the candidate
    volume exceeds the corpus size (ranking-equivalent; near-zero
    euclidean distances carry matmul noise); ``"exact"`` always uses the
    reference's per-pair formulas.

    ``engine`` selects the whole search strategy:

    - ``"forest"`` — the reference's best-first forest traversal with
      the `search_k` recall/speed knob (reference: src/reader.rs:317-401).
    - ``"exact"`` — brute force on the MXU: one [B,d]x[d,M] matmul scores
      every item, recall 1.0.  On TPU this beats the traversal outright
      up to a few hundred thousand items (39 GFLOP ~= 1 ms at 100k x
      768), so it is the recall-1.0 endpoint of the search_k knob, not
      just an oracle.  ``precision="bf16"`` (default "auto") selects
      candidates with a half-rate-beating bf16 matmul and re-scores them
      in f32.
    - ``"auto"`` (the default) — the measured-fastest engine at the
      target recall.  On-chip measurements at every scale tried (100k,
      262k, 1M × 768-d; 1.18M × 100-d — see STATUS.md) show the
      streaming exact engine beating the forest traversal at equal
      recall by 4-100×: the MXU scores the whole corpus faster than a
      traversal can gather+re-score `search_k` candidates, so within
      one chip's HBM there is no measured crossover.  ``auto``
      therefore serves exact whenever the metric supports it, and the
      forest only for custom metrics (or when the operator forces a
      cutoff via ``ARROY_EXACT_MAX_ITEMS``).
    """

    def __init__(
        self,
        reader: "Reader",
        qb: QueryBuilder,
        rescore: str = "auto",
        traversal: str = "auto",
        engine: str = "auto",
        precision: str = "auto",
        multipop="auto",
        probe_trees="auto",
        probe_block="auto",
        probe_dtype="auto",
    ):
        import os

        from .search import (
            exact_engine_supported,
            make_exact_fn,
            make_search_fn,
        )

        self._reader = reader
        self._count = qb._count
        dev = reader._device()
        filter_slots = None
        if qb._candidates is not None:
            inter = qb._candidates.intersection(
                ItemSet.from_sorted(reader._state.metadata.items.ids)
            )
            filter_slots = (
                reader._state.store.slots_of(inter.ids)
                if len(inter)
                else np.empty(0, np.int64)
            )
        if engine == "auto":
            # Measured cost model (STATUS.md crossover table): streaming
            # exact wins at every on-chip scale tried, so auto = exact
            # whenever the metric supports it.  ARROY_EXACT_MAX_ITEMS is
            # an operator override to force the forest past a size.
            limit = os.environ.get("ARROY_EXACT_MAX_ITEMS")
            if not exact_engine_supported(dev.metric) or (
                limit is not None and dev.n_items > int(limit)
            ):
                engine = "forest"
            else:
                engine = "exact"
        self.engine = engine
        if engine == "exact":
            self.device_fn = make_exact_fn(
                dev, qb._count, filter_slots, precision=precision
            )
        else:
            self.device_fn = make_search_fn(
                dev,
                qb._count,
                qb._effective_search_k(),
                filter_slots,
                rescore=rescore,
                traversal=traversal,
                multipop=multipop,
                state=reader._state,
                probe_trees=probe_trees,
                probe_block=probe_block,
                probe_dtype=probe_dtype,
            )
        self._dev = dev

    def prepare_queries(self, vectors: np.ndarray):
        """Upload a query matrix once; returns device (qv, qn, qe, qf)."""
        import jax.numpy as jnp

        r = self._reader
        vectors = np.asarray(vectors, dtype=np.float32)
        qv = r.metric.encode_np(vectors)
        qn = r.metric.item_norms_np(qv, r.dimensions())
        qe = np.zeros(len(qv), np.float32)
        qf = (
            np.zeros(len(qv), np.float32)
            if r.metric.has_extra
            else np.ones(len(qv), np.float32)
        )
        return (jnp.asarray(qv), jnp.asarray(qn), jnp.asarray(qe), jnp.asarray(qf))

    def __call__(self, vectors: np.ndarray) -> list[list[tuple[int, float]]]:
        """Host convenience: numpy in, result lists out."""
        ids, dists = self.device_fn(*self.prepare_queries(vectors))
        ids = np.asarray(ids).astype(np.int64)[:, : self._count]
        dists = np.asarray(dists)[:, : self._count]
        out = []
        for row_ids, row_d in zip(ids, dists):
            keep = ~np.isnan(row_d)
            out.append([(int(i), float(d)) for i, d in zip(row_ids[keep], row_d[keep])])
        return out


class Reader:
    """A reader over one committed index snapshot."""

    def __init__(self, state: IndexState, index: int, db: Database, metric: type[Metric]):
        self._state = state
        self._index = index
        self._db = db
        self.metric = metric

    @staticmethod
    def open(rtxn, index: int, db: Database, metric="euclidean") -> "Reader":
        """Reference: src/reader.rs:140-177."""
        metric = resolve_metric(metric)
        st = rtxn.state(index)
        if st is None or st.metadata is None:
            raise MissingMetadata(index)
        if metric.name != st.metadata.distance:
            raise UnmatchingDistance(st.metadata.distance, metric.name)
        if st.updated:
            raise NeedBuild(index)
        return Reader(st, int(index), db, metric)

    # -- introspection (reference: src/reader.rs:179-291) ----------------
    def dimensions(self) -> int:
        return self._state.metadata.dimensions

    def n_trees(self) -> int:
        return len(self._state.metadata.roots)

    def n_items(self) -> int:
        return len(self._state.metadata.items)

    def item_ids(self) -> ItemSet:
        return self._state.metadata.items

    def index(self) -> int:
        return self._index

    def version(self) -> Version:
        return self._state.version

    def n_nodes(self) -> Optional[int]:
        n = self._state.forest.n_nodes() + len(self._state.store)
        return n if n else None

    def item_vector(self, item: int) -> Optional[np.ndarray]:
        return self._state.store.get_vector(item)

    def contains_item(self, item: int) -> bool:
        return int(item) in self._state.store

    def is_empty(self) -> bool:
        return len(self._state.store) == 0

    def iter(self):
        st = self._state
        return ((int(i), st.store.get_vector(int(i))) for i in st.store.ids())

    def nns(self, count: int) -> QueryBuilder:
        return QueryBuilder(self, count)

    def searcher(
        self,
        count: int,
        search_k: int | None = None,
        oversampling: int | None = None,
        candidates=None,
        rescore: str = "auto",
        traversal: str = "auto",
        engine: str = "auto",
        precision: str = "auto",
        multipop="auto",
        probe_trees="auto",
        probe_block="auto",
        probe_dtype="auto",
    ) -> "Searcher":
        """A bound, compiled serving handle (the TPU-native hot path).

        Unlike `nns(...)`, the returned `Searcher` keeps everything on
        device: `device_fn(qv, qn, qe, qf)` takes and returns device
        arrays so back-to-back calls pipeline without host round trips.

        The default ``engine="auto"`` serves the measured-fastest
        engine — the MXU exact path (single-matmul up to the [B, M]
        budget, streaming chunked scan past it) whenever the metric
        supports it; see `Searcher` for the measured basis.
        ``engine="forest"`` forces the reference-semantic search_k
        traversal; ``engine="exact"`` forces brute force.

        ``multipop`` (forest engine): pops per traversal-loop iteration.
        1 keeps the reference's strict best-first order; P>1 runs fewer
        serial loop steps with a slightly different candidate stream
        (measured recall guard in tests) but was measured a large
        on-chip regression at every scale, so "auto" = 1 always.

        ``traversal="probe"`` (forest engine): the leaf-probe serving
        mode — rank each probe tree's leaf blocks by centroid similarity
        with one matmul and re-score the top blocks (`probe.py`); a
        documented deviation from strict best-first order that removes
        every serial loop from the query path.  ``traversal="auto"``
        serves it at 262k+ items (measured 34x the strict traversal at
        equal recall at 1.18M — results/probe_sweep_r03.log);
        ``traversal="xla"`` keeps the bit-exact reference order.
        ``probe_trees`` / ``probe_block`` tune the probed-tree count
        and block size; ``probe_dtype`` picks the block-row storage
        ("bf16", "f32", "int8" per-item-max-abs rows at half the bf16
        footprint and ~0.4% dot error, or "bq" packed sign bits scored
        by XOR-popcount with a search_k/2 exact re-score cut — 16x
        smaller tables at 768-d, how the highest-d corpora fit the
        probe HBM budget).  "auto" = bf16 when ≥4 probe trees fit
        `ARROY_PROBE_BYTES`, int8 when ≥3 fit, else bq.
        """
        qb = QueryBuilder(self, count)
        if search_k is not None:
            qb.search_k(search_k)
        if oversampling is not None:
            qb.oversampling(oversampling)
        if candidates is not None:
            qb.candidates(candidates)
        return Searcher(
            self, qb, rescore=rescore, traversal=traversal,
            engine=engine, precision=precision, multipop=multipop,
            probe_trees=probe_trees, probe_block=probe_block,
            probe_dtype=probe_dtype,
        )

    # -- exact search oracle --------------------------------------------
    def exact_by_vectors(
        self, vectors, count: int, fast: bool = False
    ) -> list[list[tuple[int, float]]]:
        """Brute-force search: the recall oracle (`fast=False` uses the
        reference's exact distance formulas) or the MXU matmul fast path
        (`fast=True`, ranking-equivalent for euclidean/cosine/dot)."""
        vectors = np.asarray(vectors, dtype=np.float32)
        qv = self.metric.encode_np(vectors)
        qn = self.metric.item_norms_np(qv, self.dimensions())
        qe = np.zeros(len(qv), np.float32)
        ids, dists = exact_batch(self._device(), qv, qn, qe, count, fast=fast)
        out = []
        for row_ids, row_d in zip(ids, dists):
            keep = ~np.isnan(row_d)
            out.append([(int(i), float(d)) for i, d in zip(row_ids[keep], row_d[keep])])
        return out

    def _device(self):
        return self._db.device_index(self._index, self._state)

    # -- stats (reference: src/reader.rs:210-252) ------------------------
    def stats(self) -> Stats:
        f = self._state.forest

        def walk(root: int) -> TreeStats:
            # iterative post-order: incremental grafting makes tree depth
            # unbounded, so Python recursion could blow the C stack
            results: dict[int, TreeStats] = {}
            stack = [(int(root), False)]
            while stack:
                nid, expanded = stack.pop()
                k = f.kind[nid]
                if k == KIND_LEAF:
                    results[nid] = TreeStats(
                        depth=1, dummy_normals=0, split_nodes=0, descendants=1
                    )
                    continue
                if not expanded:
                    stack.append((nid, True))
                    stack.append((int(f.left[nid]), False))
                    stack.append((int(f.right[nid]), False))
                    continue
                left = results.pop(int(f.left[nid]))
                right = results.pop(int(f.right[nid]))
                results[nid] = TreeStats(
                    depth=1 + max(left.depth, right.depth),
                    dummy_normals=left.dummy_normals
                    + right.dummy_normals
                    + (1 if k == KIND_SPLIT_NONE else 0),
                    split_nodes=left.split_nodes + right.split_nodes + 1,
                    descendants=left.descendants + right.descendants,
                )
            return results[int(root)]

        return Stats(
            leaf=len(self._state.metadata.items),
            tree_stats=[walk(r) for r in self._state.metadata.roots],
        )

    # -- plot (reference: src/reader.rs:403-469) -------------------------
    def plot_internals_tree_nodes(self) -> str:
        f = self._state.forest
        lines = ["digraph {", "\tlabel=metadata", ""]
        roots = self._state.metadata.roots
        if roots:
            tree = roots[0]
            lines.append("\tsubgraph {")
            lines.append("\t\troot [color=blue]")
            lines.append(f"\t\troot -> {tree}")
            explore = [int(tree)]
            while explore:
                nid = explore.pop()
                k = f.kind[nid]
                if k == KIND_LEAF:
                    lines.append(f'\t\t{nid} [label="{nid}"]')
                elif k in (KIND_SPLIT, KIND_SPLIT_NONE):
                    if k == KIND_SPLIT_NONE:
                        lines.append(f"\t\t{nid} [color=red]")
                    ln, rn = int(f.left[nid]), int(f.right[nid])
                    lines.append(
                        f'\t\t{nid} -> {ln} [taillabel="{len(f.subtree_items(ln))}"]'
                    )
                    lines.append(
                        f'\t\t{nid} -> {rn} [taillabel="{len(f.subtree_items(rn))}"]'
                    )
                    explore.append(ln)
                    explore.append(rn)
            lines.append("\t}")
        lines.append("}")
        return "\n".join(lines) + "\n"

    # -- invariants (reference: src/reader.rs:509-589) --------------------
    def assert_validity(self) -> None:
        """Every tree reaches all items exactly once; no node sharing."""
        st = self._state
        f = st.forest
        item_ids = ItemSet.from_sorted(st.store.ids())
        all_tree_ids = set(int(i) for i in f.used_node_ids())

        remaining = set(all_tree_ids)
        for root in st.metadata.roots:
            trees: set[int] = set()
            items_arrays: list[np.ndarray] = []
            count_items = 0
            stack = [int(root)]
            while stack:
                nid = stack.pop()
                assert f.kind[nid] != KIND_FREE, f"dangling node {nid}"
                assert nid not in trees, f"node {nid} linked twice in tree {root}"
                trees.add(nid)
                if f.kind[nid] == KIND_LEAF:
                    items_arrays.append(f.leaves[nid])
                    count_items += len(f.leaves[nid])
                else:
                    stack.append(int(f.left[nid]))
                    stack.append(int(f.right[nid]))
            items = (
                ItemSet(np.concatenate(items_arrays)) if items_arrays else ItemSet()
            )
            assert count_items == len(items), (
                f"tree {root}: an item appears twice ({count_items} != {len(items)})"
            )
            assert items == item_ids, f"tree {root} cannot access all items"
            assert trees <= remaining, (
                f"tree {root} shares tree nodes with another tree"
            )
            remaining -= trees
        assert not remaining, f"{sorted(remaining)} tree nodes floating around"
