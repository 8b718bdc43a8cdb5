"""Generate the committed v1.1.0-format test asset (zero-normal splits).

The v1.1.0 format PERMITTED a ``KIND_SPLIT`` node whose stored normal
row is all zeros — the pattern a degenerate two-means produces when a
segment's sampled centroids coincide (every margin ties at the bias).
v1.2.0 forbids it (`arroy_tpu/version.py`); `upgrade_index` rewrites
such nodes to ``KIND_SPLIT_NONE`` and repacks the normals matrix —
mirroring the reference's 0.6→0.7 zero-normal surgery
(reference: src/upgrade.rs:249-258) and its committed old-format assets
(reference: src/tests/upgrade.rs:11-96, src/tests/assets/v0_6/*.mdb).

This script plays the "old writer": it builds two indexes over corpora
with heavy duplicate mass (which organically yields random-fallback
splits), then stores those splits the way a v1.1 writer could — as
KIND_SPLIT nodes pointing at explicit all-zero normal rows — and stamps
the generations 1.1.0.  Traversal semantics are identical either way
(margin == 0 == the KIND_SPLIT_NONE contract), which is exactly what
makes the nns-parity upgrade test meaningful.

Usage:  python scripts/make_v1_1_asset.py [dest_dir]
        (default dest: tests/assets/v1_1_zero_normal)
"""

import json
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from arroy_tpu import Database, Reader, Writer  # noqa: E402
from arroy_tpu.models.forest import KIND_SPLIT, KIND_SPLIT_NONE  # noqa: E402
from arroy_tpu.version import V1_1_0  # noqa: E402


def main() -> None:
    dest = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(
            os.path.dirname(__file__), "..", "tests", "assets", "v1_1_zero_normal"
        )
    )
    dest = os.path.abspath(dest)
    if os.path.exists(dest):
        shutil.rmtree(dest)

    rng = np.random.default_rng(11)
    db = Database(dest)

    # index 0: euclidean with ~60% duplicate mass -> random-fallback splits
    dims = 8
    base = rng.standard_normal((24, dims)).astype(np.float32)
    dup = np.repeat(base[:4], 10, axis=0)  # 40 duplicates of 4 points
    x = np.concatenate([dup, base]).astype(np.float32)
    w = Writer(db, 0, dims, metric="euclidean")
    with db.write() as t:
        w.add_items(t, np.arange(len(x), dtype=np.uint32), x)
        w.builder(seed=11).n_trees(3).build(t)

    # index 1: binary-quantized cosine (packed zero rows exercised too)
    xb = np.concatenate(
        [np.repeat(base[:2], 12, axis=0), base]
    ).astype(np.float32)
    wb = Writer(db, 1, dims, metric="binary quantized cosine")
    with db.write() as t:
        wb.add_items(t, np.arange(len(xb), dtype=np.uint32), xb)
        wb.builder(seed=13).n_trees(2).build(t)

    # the "v1.1 writer": store random-fallback splits as explicit
    # zero-normal KIND_SPLIT rows and stamp the generation 1.1.0
    converted = {}
    with db.write() as t:
        for idx in (0, 1):
            st = t.state_mut(idx)
            f = st.forest
            nones = np.nonzero(f.kind == KIND_SPLIT_NONE)[0]
            if not nones.size:
                raise SystemExit(
                    f"index {idx}: corpus produced no random-fallback "
                    "splits — tune the duplicate mass"
                )
            sd = f.normals.shape[1] if f.normals is not None else (
                st.metric.storage_dim(dims)
            )
            zeros = np.zeros((nones.size, sd), f.normals.dtype)
            start = len(f.normals)
            f.normals = np.concatenate([f.normals, zeros])
            f.aux = np.concatenate(
                [f.aux, np.zeros(nones.size, np.float32)]
            )
            f.kind[nones] = KIND_SPLIT
            f.ptr[nones] = np.arange(
                start, start + nones.size, dtype=np.int32
            )
            st.version = V1_1_0
            converted[idx] = [int(n) for n in nones]

    # a v1.1-written database carries a v1.1 manifest stamp
    mpath = os.path.join(dest, "MANIFEST.json")
    m = json.load(open(mpath))
    m["version"] = "1.1.0"
    json.dump(m, open(mpath, "w"))

    # verify: loadable + queryable pre-upgrade, with the legacy pattern
    db2 = Database(dest)
    for idx, metric in ((0, "euclidean"), (1, "binary quantized cosine")):
        r = Reader.open(db2.read(), idx, db2, metric=metric)
        assert r.version() == V1_1_0, r.version()
        r.assert_validity()
        st = db2.read().state(idx)
        f = st.forest
        rows = f.ptr[np.nonzero(f.kind == KIND_SPLIT)[0]]
        nz = int(np.sum(~np.any(f.normals[rows] != 0, axis=1)))
        assert nz == len(converted[idx]), (nz, converted[idx])
        got = r.nns(5).by_item(2)
        assert got, got
        print(
            f"idx {idx}: {nz} zero-normal KIND_SPLIT nodes "
            f"({converted[idx]}), nns ok"
        )
    print(f"asset written to {dest}")


if __name__ == "__main__":
    main()
