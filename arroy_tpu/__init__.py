"""arroy-tpu: a TPU-native random-projection-forest ANN engine.

A from-scratch JAX/XLA implementation with the full capability set of
meilisearch/arroy (reference mounted read-only at /root/reference):
seven distance metrics (including binary-quantized variants and the
Bachrach dot-product reduction), batched two-means forest construction,
search_k-tunable best-first queries with exact re-scoring, candidate
filtering, incremental insert/delete without full rebuild, multi-index
databases with MVCC snapshots, memory-budgeted builds, progress and
cancellation hooks, stats, persistence with atomic generation publishing,
and multi-chip sharding over a `jax.sharding.Mesh`.

Quick start::

    import numpy as np
    from arroy_tpu import Database, Writer, Reader

    db = Database()                        # in-memory; Database(path) persists
    w = Writer(db, index=0, dimensions=5, metric="euclidean")
    with db.write() as wtxn:
        w.add_item(wtxn, 0, [0.8, 0.49, 0.27, 0.76, 0.94])
        w.add_item(wtxn, 1, [0.66, 0.86, 0.42, 0.4, 0.31])
        w.builder(seed=42).n_trees(10).build(wtxn)

    rtxn = db.read()
    r = Reader.open(rtxn, 0, db, metric="euclidean")
    print(r.nns(20).by_item(0))
"""

from . import distances, internals
from .errors import (
    ArroyError,
    BuildCancelled,
    DatabaseFull,
    InvalidItemAppend,
    InvalidVecDimension,
    MissingKey,
    MissingMetadata,
    NeedBuild,
    UnknownVersion,
    UnmatchingDistance,
)
from .metrics import Metric, metric_by_name
from .progress import MainStep, SubStep, WriterProgress
from .reader import QueryBuilder, Reader, Stats, TreeStats
from .store.database import Database
from .utils.itemset import ItemSet
from .version import CURRENT_VERSION, Version
from .writer import ArroyBuilder, Writer

__version__ = "0.1.0"

__all__ = [
    "ArroyBuilder",
    "ArroyError",
    "BuildCancelled",
    "CURRENT_VERSION",
    "Database",
    "DatabaseFull",
    "InvalidItemAppend",
    "InvalidVecDimension",
    "ItemSet",
    "MainStep",
    "Metric",
    "MissingKey",
    "MissingMetadata",
    "NeedBuild",
    "QueryBuilder",
    "Reader",
    "Stats",
    "SubStep",
    "TreeStats",
    "UnknownVersion",
    "UnmatchingDistance",
    "Version",
    "Writer",
    "WriterProgress",
    "distances",
    "internals",
    "metric_by_name",
]
