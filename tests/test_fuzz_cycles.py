"""Deterministic mini-fuzz: random add/del/build cycles with invariants.

The pytest-resident version of the reference's CI fuzzer
(reference: examples/fuzz.rs — arbitrary op batches, build +
assert_validity per commit).
"""

import numpy as np

from arroy_tpu import Database, MissingMetadata, Reader, Writer


def test_add_delete_build_cycles():
    rng = np.random.default_rng(1234)
    dims = 8
    base = rng.standard_normal((5, dims)).astype(np.float32)
    db = Database()
    w = Writer(db, 0, dims)
    live: set[int] = set()

    for cycle in range(4):
        with db.write() as wtxn:
            for _ in range(60):
                item = int(rng.integers(64))
                if rng.random() < 0.6:
                    w.add_item(wtxn, item, base[int(rng.integers(len(base)))])
                    live.add(item)
                else:
                    if w.del_item(wtxn, item):
                        pass
                    live.discard(item)
            w.builder(seed=int(rng.integers(2**31))).build(wtxn)

        try:
            r = Reader.open(db.read(), 0, db)
        except MissingMetadata:
            assert not live
            continue
        assert set(r.item_ids()) == live
        r.assert_validity()
        if live:
            some = next(iter(live))
            res = r.nns(3).by_item(some)
            assert res[0][0] == some or res[0][1] == 0.0


def test_duplicate_heavy_corpus_queries():
    # 5 distinct vectors, many copies: ties everywhere
    rng = np.random.default_rng(5)
    base = rng.standard_normal((5, 8)).astype(np.float32)
    db = Database()
    w = Writer(db, 0, 8)
    with db.write() as wtxn:
        for i in range(100):
            w.add_item(wtxn, i, base[i % 5])
        w.builder(seed=3).n_trees(3).build(wtxn)
    r = Reader.open(db.read(), 0, db)
    r.assert_validity()
    got = r.nns(20).search_k(10**6).by_item(0)
    ids = [i for i, _ in got]
    # the 20 nearest of item 0 are exactly the copies of base[0]
    assert set(ids) == {i for i in range(100) if i % 5 == 0}
    # zero distance to every copy
    assert all(abs(d) < 1e-5 for _, d in got)
