"""Shared test helpers."""

from __future__ import annotations

import numpy as np

from arroy_tpu import Database, Reader, Writer


def build_db(
    vectors: np.ndarray,
    metric: str = "euclidean",
    n_trees: int | None = 8,
    seed: int = 42,
    split_after: int | None = None,
    ids: list[int] | None = None,
    index: int = 0,
):
    """Create an in-memory DB with `vectors` and build it."""
    m, d = vectors.shape
    db = Database()
    w = Writer(db, index, d, metric=metric)
    with db.write() as wtxn:
        for j in range(m):
            item = ids[j] if ids is not None else j
            w.add_item(wtxn, item, vectors[j])
        b = w.builder(seed=seed)
        if n_trees is not None:
            b.n_trees(n_trees)
        if split_after is not None:
            b.split_after(split_after)
        b.build(wtxn)
    r = Reader.open(db.read(), index, db, metric=metric)
    return db, w, r


def recall(got: list[list[tuple[int, float]]], expected: list[list[tuple[int, float]]]) -> float:
    num, den = 0, 0
    for g, e in zip(got, expected):
        es = set(i for i, _ in e)
        num += len(set(i for i, _ in g) & es)
        den += len(es)
    return num / max(den, 1)


def random_vectors(m: int, d: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((m, d)).astype(np.float32)
