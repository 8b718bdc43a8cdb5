"""On-disk index container with atomic generation publishing.

The reference's durability unit is the LMDB transaction: a crashed or
aborted build leaves the database at the previous commit (reference:
src/lib.rs:1-3).  Our equivalent is generation directories: a commit
writes a complete new generation for each dirty index, then atomically
renames a new MANIFEST into place.  Readers and other processes always
open the manifest's generations, so they see either the old or the new
commit, never a torn state.

Layout::

    <root>/MANIFEST.json
    <root>/idx_00000/gen_00000042/{meta.json, *.npy}

Arrays are plain .npy so other tools (and mmap) can read them.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

import numpy as np

from ..errors import UnknownVersion
from ..metrics import metric_by_name
from ..models.forest import Forest
from ..models.items import ItemStore
from ..utils.itemset import ItemSet
from ..version import CURRENT_VERSION, Version

FORMAT_NAME = "arroy-tpu"


def _index_dir(root: str, index: int) -> str:
    return os.path.join(root, f"idx_{index:05d}")


def save(root: str, states) -> None:
    os.makedirs(root, exist_ok=True)
    manifest_path = os.path.join(root, "MANIFEST.json")
    old = {}
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            old = json.load(f).get("indexes", {})

    indexes: dict[str, dict] = {}
    for index, st in states.items():
        gen = st.generation
        key = str(index)
        gen_dir = os.path.join(_index_dir(root, index), f"gen_{gen:08d}")
        if old.get(key, {}).get("gen") == gen and os.path.isdir(gen_dir):
            indexes[key] = {"gen": gen}
            continue
        _write_state(gen_dir, st)
        indexes[key] = {"gen": gen}

    manifest = {
        "format": FORMAT_NAME,
        "version": str(CURRENT_VERSION),
        "indexes": indexes,
    }
    fd, tmp = tempfile.mkstemp(dir=root, suffix=".manifest.tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(manifest, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, manifest_path)
    _gc(root, indexes)


def _write_state(gen_dir: str, st) -> None:
    if os.path.isdir(gen_dir):
        shutil.rmtree(gen_dir)
    tmp_dir = gen_dir + ".tmp"
    if os.path.isdir(tmp_dir):
        shutil.rmtree(tmp_dir)
    os.makedirs(tmp_dir)

    meta = {
        "dims": st.dims,
        "metric": st.metric.name,
        "version": str(st.version),
        "generation": st.generation,
        "updated": sorted(int(i) for i in st.updated),
        "roots": [int(r) for r in st.forest.roots],
        "has_metadata": st.metadata is not None,
    }
    if st.metadata is not None:
        meta["metadata"] = {
            "dimensions": st.metadata.dimensions,
            "distance": st.metadata.distance,
            "roots": [int(r) for r in st.metadata.roots],
        }
        np.save(os.path.join(tmp_dir, "metadata_items.npy"), st.metadata.items.ids)

    with open(os.path.join(tmp_dir, "meta.json"), "w") as f:
        json.dump(meta, f)

    np.save(os.path.join(tmp_dir, "item_rows.npy"), st.store.rows())
    np.save(os.path.join(tmp_dir, "item_norms.npy"), st.store.norms())
    np.save(os.path.join(tmp_dir, "item_extras.npy"), st.store.extras())
    np.save(os.path.join(tmp_dir, "slot_ids.npy"), st.store.slot_ids())

    f_ = st.forest
    np.save(os.path.join(tmp_dir, "forest_kind.npy"), f_.kind)
    np.save(os.path.join(tmp_dir, "forest_left.npy"), f_.left)
    np.save(os.path.join(tmp_dir, "forest_right.npy"), f_.right)
    np.save(os.path.join(tmp_dir, "forest_ptr.npy"), f_.ptr)
    sd = st.metric.storage_dim(st.dims)
    np_dtype = np.uint32 if st.metric.binary else np.float32
    normals = f_.normals if f_.normals is not None else np.zeros((0, sd), np_dtype)
    np.save(os.path.join(tmp_dir, "normals.npy"), normals)
    np.save(os.path.join(tmp_dir, "aux.npy"), f_.aux)

    leaf_nodes = np.asarray(sorted(f_.leaves), dtype=np.int64)
    offs = np.zeros(len(leaf_nodes) + 1, np.int64)
    chunks = []
    for i, nid in enumerate(leaf_nodes):
        chunks.append(f_.leaves[int(nid)])
        offs[i + 1] = offs[i] + len(chunks[-1])
    flat = np.concatenate(chunks) if chunks else np.empty(0, np.uint32)
    np.save(os.path.join(tmp_dir, "leaf_nodes.npy"), leaf_nodes)
    np.save(os.path.join(tmp_dir, "leaf_offs.npy"), offs)
    np.save(os.path.join(tmp_dir, "leaf_items.npy"), flat)

    os.replace(tmp_dir, gen_dir)


def load(root: str) -> dict[int, "IndexState"]:
    from .database import IndexState, Metadata

    manifest_path = os.path.join(root, "MANIFEST.json")
    if not os.path.exists(manifest_path):
        return {}
    with open(manifest_path) as f:
        manifest = json.load(f)
    if manifest.get("format") != FORMAT_NAME:
        raise UnknownVersion(str(manifest.get("format")))
    ver = Version.parse(manifest["version"])
    if ver.major != CURRENT_VERSION.major:
        raise UnknownVersion(str(ver))

    out: dict[int, IndexState] = {}
    for key, info in manifest.get("indexes", {}).items():
        index = int(key)
        gen_dir = os.path.join(_index_dir(root, index), f"gen_{info['gen']:08d}")
        with open(os.path.join(gen_dir, "meta.json")) as f:
            meta = json.load(f)
        metric = metric_by_name(meta["metric"])
        dims = int(meta["dims"])

        store = ItemStore.from_arrays(
            metric,
            dims,
            np.load(os.path.join(gen_dir, "item_rows.npy")),
            np.load(os.path.join(gen_dir, "item_norms.npy")),
            np.load(os.path.join(gen_dir, "item_extras.npy")),
            np.load(os.path.join(gen_dir, "slot_ids.npy")),
        )

        forest = Forest(
            kind=np.load(os.path.join(gen_dir, "forest_kind.npy")),
            left=np.load(os.path.join(gen_dir, "forest_left.npy")),
            right=np.load(os.path.join(gen_dir, "forest_right.npy")),
            ptr=np.load(os.path.join(gen_dir, "forest_ptr.npy")),
            normals=np.load(os.path.join(gen_dir, "normals.npy")),
            aux=np.load(os.path.join(gen_dir, "aux.npy")),
            roots=[int(r) for r in meta["roots"]],
        )
        leaf_nodes = np.load(os.path.join(gen_dir, "leaf_nodes.npy"))
        offs = np.load(os.path.join(gen_dir, "leaf_offs.npy"))
        flat = np.load(os.path.join(gen_dir, "leaf_items.npy"))
        for i, nid in enumerate(leaf_nodes):
            forest.leaves[int(nid)] = flat[offs[i] : offs[i + 1]]

        metadata = None
        if meta.get("has_metadata"):
            md = meta["metadata"]
            metadata = Metadata(
                dimensions=int(md["dimensions"]),
                items=ItemSet.from_sorted(
                    np.load(os.path.join(gen_dir, "metadata_items.npy"))
                ),
                roots=[int(r) for r in md["roots"]],
                distance=md["distance"],
            )

        out[index] = IndexState(
            dims=dims,
            metric=metric,
            store=store,
            updated=set(meta.get("updated", [])),
            forest=forest,
            metadata=metadata,
            version=Version.parse(meta["version"]),
            generation=int(meta["generation"]),
        )
    return out


def _gc(root: str, indexes: dict[str, dict]) -> None:
    """Best-effort removal of superseded generation directories."""
    for key, info in indexes.items():
        idir = _index_dir(root, int(key))
        if not os.path.isdir(idir):
            continue
        keep = f"gen_{info['gen']:08d}"
        for name in os.listdir(idir):
            if name != keep:
                shutil.rmtree(os.path.join(idir, name), ignore_errors=True)
