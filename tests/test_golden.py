"""Golden-snapshot style determinism tests.

The reference dumps every key of the database and snapshot-tests the
result with a pinned seed and a single-thread pool
(reference: src/tests/mod.rs:28-107).  Here the dump is a stable
textual rendering of the forest structure; with a fixed seed the whole
dump must be bit-stable across runs and code paths that promise
determinism.
"""

import numpy as np
import pytest

from arroy_tpu import Reader

from .util import build_db, random_vectors


def dump_index(reader: Reader) -> str:
    """Stable textual dump of metadata + forest (the DatabaseHandle role)."""
    st = reader._state
    f = st.forest
    lines = [
        f"dims={st.metadata.dimensions} distance={st.metadata.distance}",
        f"items={list(st.metadata.items)}",
        f"roots={list(st.metadata.roots)}",
        f"version={st.version}",
    ]
    for nid in sorted(int(i) for i in f.used_node_ids()):
        k = int(f.kind[nid])
        if k == 2:  # leaf
            lines.append(
                f"node {nid}: Descendants({[int(x) for x in f.leaves[nid]]})"
            )
        elif k == 1:
            lines.append(
                f"node {nid}: SplitPlaneNormal(None, left={int(f.left[nid])}, "
                f"right={int(f.right[nid])})"
            )
        else:
            row = f.normals[f.ptr[nid]]
            sig = float(np.round(np.sum(np.asarray(row, np.float64)), 4))
            lines.append(
                f"node {nid}: SplitPlaneNormal(sig={sig}, aux="
                f"{float(np.round(f.aux[f.ptr[nid]], 4))}, "
                f"left={int(f.left[nid])}, right={int(f.right[nid])})"
            )
    return "\n".join(lines)


def test_dump_is_deterministic():
    x = random_vectors(120, 8, seed=3)
    _, _, r1 = build_db(x, n_trees=3, seed=99)
    _, _, r2 = build_db(x, n_trees=3, seed=99)
    assert dump_index(r1) == dump_index(r2)


def test_dump_shape_tiny_corpus():
    x = random_vectors(4, 8, seed=4)
    _, _, r = build_db(x, n_trees=None)
    d = dump_index(r)
    assert "node 0: Descendants([0, 1, 2, 3])" in d
    assert "roots=[0]" in d


def test_incremental_noop_build_is_stable():
    # building again with zero updates must keep the forest identical
    x = random_vectors(150, 8, seed=5)
    db, w, r1 = build_db(x, n_trees=3, seed=7)
    before = dump_index(r1)
    with db.write() as wtxn:
        w.builder(seed=1234).n_trees(3).build(wtxn)
    r2 = Reader.open(db.read(), 0, db)
    assert dump_index(r2) == before


GOLDEN_METRICS = (
    "euclidean",
    "manhattan",
    "cosine",
    "dot-product",
    "binary quantized euclidean",
    "binary quantized manhattan",
    "binary quantized cosine",
)


def slug(metric: str) -> str:
    return metric.replace(" ", "_").replace("-", "_")


def build_golden(metric: str) -> str:
    """One pinned build per metric: 64 items x 8 dims, 2 trees, seed 64."""
    x = random_vectors(64, 8, seed=31)
    _, _, r = build_db(x, metric=metric, n_trees=2, seed=64)
    return dump_index(r)


def build_incremental_golden() -> str:
    """Pinned add+delete+rebuild scenario (the reference's incremental
    insta snapshots, src/tests/writer.rs:391-758)."""
    x = random_vectors(64, 8, seed=31)
    db, w, _ = build_db(x, n_trees=2, seed=64)
    extra = random_vectors(16, 8, seed=77)
    with db.write() as wtxn:
        for j in range(16):
            w.add_item(wtxn, 64 + j, extra[j])
        for item in (0, 5, 10, 15, 20, 25, 30, 35):
            w.del_item(wtxn, item)
        w.builder(seed=65).n_trees(2).build(wtxn)
    r = Reader.open(db.read(), 0, db)
    return dump_index(r)


def build_budget_golden() -> str:
    """Pinned low-memory (budget/streaming) build: available_memory
    small enough to force the sample-skeleton + batched-routing path
    (the reference pins the same scenario via available_memory(0),
    src/tests/writer.rs:1377-1403)."""
    from arroy_tpu import Database, Writer

    x = random_vectors(96, 8, seed=31)
    db = Database()
    w = Writer(db, 0, 8)
    with db.write() as wtxn:
        w.add_items(wtxn, np.arange(96, dtype=np.uint32), x)
        # 32 items' worth of budget over a 96-item corpus: streaming on
        w.builder(seed=64).n_trees(2).available_memory(32 * 8 * 4).build(wtxn)
    return dump_index(Reader.open(db.read(), 0, db))


def build_mesh_golden() -> str:
    """Pinned mesh-sharded build on the 8-virtual-device CPU mesh.
    Mesh-size invariance is tested separately (test_sharded_build); the
    committed dump additionally pins the mesh build stream itself
    across rounds."""
    from arroy_tpu import Database, Writer
    from arroy_tpu.parallel.mesh import make_mesh

    x = random_vectors(96, 8, seed=31)
    db = Database()
    w = Writer(db, 0, 8)
    with db.write() as wtxn:
        w.add_items(wtxn, np.arange(96, dtype=np.uint32), x)
        w.builder(seed=64).n_trees(2).split_after(8).mesh(make_mesh(8)).build(wtxn)
    return dump_index(Reader.open(db.read(), 0, db))


def build_multi_index_golden() -> str:
    """Pinned two-indexes-one-database build (the reference's u16
    multi-index scenarios, src/tests/writer.rs:760-820): the dump pins
    both forests AND the id-namespace separation."""
    from arroy_tpu import Database, Writer

    x = random_vectors(64, 8, seed=31)
    y = random_vectors(48, 4, seed=32)
    db = Database()
    w0 = Writer(db, 0, 8)
    w1 = Writer(db, 1, 4, metric="cosine")
    with db.write() as wtxn:
        w0.add_items(wtxn, np.arange(64, dtype=np.uint32), x)
        w1.add_items(wtxn, np.arange(48, dtype=np.uint32), y)
        w0.builder(seed=64).n_trees(2).build(wtxn)
        w1.builder(seed=65).n_trees(2).build(wtxn)
    rtxn = db.read()
    return "\n---\n".join(
        dump_index(Reader.open(rtxn, i, db, metric=m))
        for i, m in ((0, "euclidean"), (1, "cosine"))
    )


def build_delete_collapse_golden() -> str:
    """Pinned mass-delete scenario: dropping 3/4 of the corpus forces
    the delete-with-collapse path (searchsorted mass delete + single
    -child splice) instead of a rebuild (the reference's deletion
    snapshots, src/tests/writer.rs:822-1015)."""
    from arroy_tpu import Database, Writer

    x = random_vectors(128, 8, seed=31)
    db = Database()
    w = Writer(db, 0, 8)
    with db.write() as wtxn:
        w.add_items(wtxn, np.arange(128, dtype=np.uint32), x)
        w.builder(seed=64).n_trees(2).build(wtxn)
    with db.write() as wtxn:
        for item in range(128):
            if item % 4:  # keep every 4th item
                w.del_item(wtxn, item)
        w.builder(seed=64).n_trees(2).build(wtxn)
    return dump_index(Reader.open(db.read(), 0, db))


def _snap_path(name: str) -> str:
    import os

    return os.path.join(os.path.dirname(__file__), "snapshots", name)


@pytest.mark.parametrize("metric", GOLDEN_METRICS, ids=slug)
def test_committed_golden_snapshot(metric):
    """Pinned structural snapshots, one per metric (the insta-snapshot
    role of src/tests/writer.rs:296-320, src/tests/binary_quantized.rs:47-54).

    Regenerate DELIBERATELY with `python scripts/regen_goldens.py` when
    the build algorithm or the threefry stream changes.
    """
    got = build_golden(metric)
    assert got == open(_snap_path(f"golden_{slug(metric)}.txt")).read()


def test_committed_golden_incremental():
    got = build_incremental_golden()
    assert got == open(_snap_path("golden_incremental.txt")).read()


GOLDEN_SCENARIOS = {
    "budget": build_budget_golden,
    "mesh": build_mesh_golden,
    "multi_index": build_multi_index_golden,
    "delete_collapse": build_delete_collapse_golden,
}


@pytest.mark.parametrize("scenario", sorted(GOLDEN_SCENARIOS), ids=str)
def test_committed_golden_scenario(scenario):
    """Pinned builds for the non-vanilla writer paths: budget/streaming,
    mesh-sharded, multi-index, delete-with-collapse (the breadth of the
    reference's ~34 pinned writer scenarios, src/tests/writer.rs:296-1015).

    Regenerate DELIBERATELY with `python scripts/regen_goldens.py`.
    """
    got = GOLDEN_SCENARIOS[scenario]()
    assert got == open(_snap_path(f"golden_{scenario}.txt")).read()
