"""Randomized add/delete/build/validate fuzz loop.

Reference: examples/fuzz.rs — random batches of Add/Delete ops over a
small id space, build + `assert_validity` after every commit, logging
iterations/second.  Run for a wall-clock budget with --seconds.
"""

from __future__ import annotations

import argparse
import time

import numpy as np

from ..errors import MissingMetadata
from ..reader import Reader
from ..store.database import Database
from ..writer import Writer


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--dims", type=int, default=8)
    ap.add_argument("--distinct-vectors", type=int, default=5)
    ap.add_argument("--ops-per-batch", type=int, default=50)
    ap.add_argument("--batches-per-commit", type=int, default=5)
    ap.add_argument("--id-space", type=int, default=128)
    ap.add_argument("--distance", default="euclidean")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    rng = np.random.default_rng(args.seed)
    base = rng.standard_normal((args.distinct_vectors, args.dims)).astype(np.float32)

    db = Database()
    w = Writer(db, 0, args.dims, metric=args.distance)
    t_end = time.time() + args.seconds
    iters = 0
    t0 = time.time()
    while time.time() < t_end:
        with db.write() as wtxn:
            for _ in range(args.batches_per_commit):
                for _ in range(args.ops_per_batch):
                    item = int(rng.integers(args.id_space))
                    if rng.random() < 0.5:
                        w.add_item(wtxn, item, base[int(rng.integers(len(base)))])
                    else:
                        w.del_item(wtxn, item)
            w.builder(seed=int(rng.integers(2**31))).build(wtxn)
        try:
            r = Reader.open(db.read(), 0, db, metric=args.distance)
            r.assert_validity()
        except MissingMetadata:
            pass
        iters += 1
        if iters % 10 == 0:
            print(f"{iters} iterations, {iters / (time.time() - t0):.2f} it/s")
    print(f"done: {iters} iterations in {time.time() - t0:.1f}s, no invariant violations")


if __name__ == "__main__":
    main()
