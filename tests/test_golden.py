"""Golden-snapshot style determinism tests.

The reference dumps every key of the database and snapshot-tests the
result with a pinned seed and a single-thread pool
(reference: src/tests/mod.rs:28-107).  Here the dump is a stable
textual rendering of the forest structure; with a fixed seed the whole
dump must be bit-stable across runs and code paths that promise
determinism.
"""

import numpy as np

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


def test_committed_golden_snapshot():
    """Pinned structural snapshot (regenerate deliberately if the build
    algorithm or the threefry stream changes):

        python - <<'PY'
        from tests.util import build_db, random_vectors
        from tests.test_golden import dump_index
        x = random_vectors(64, 8, seed=31)
        _, _, r = build_db(x, n_trees=2, seed=64)
        open('tests/snapshots/forest_64x8_t2_seed64.txt', 'w').write(dump_index(r))
        PY
    """
    import os

    x = random_vectors(64, 8, seed=31)
    _, _, r = build_db(x, n_trees=2, seed=64)
    snap = os.path.join(os.path.dirname(__file__), "snapshots", "forest_64x8_t2_seed64.txt")
    assert dump_index(r) == open(snap).read()
