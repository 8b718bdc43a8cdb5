"""Recall@k vs search_k vs QPS sweep (the ann-benchmarks-style curve).

The quality/throughput tradeoff harness from SURVEY §7.9: builds a
corpus (clustered crossover like the reference's sample generator, or
isotropic gaussian, or a .npy file) and sweeps `search_k`.
"""

from __future__ import annotations

import argparse
import time

import numpy as np

from ..reader import Reader
from ..store.database import Database
from ..writer import Writer


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--m", type=int, default=20_000)
    ap.add_argument("--dims", type=int, default=768)
    ap.add_argument("--n-trees", type=int, default=10)
    ap.add_argument("--count", type=int, default=10)
    ap.add_argument("--distance", default="euclidean")
    ap.add_argument("--data", choices=["clustered", "random"], default="clustered")
    ap.add_argument("--vectors", default=None, help="optional .npy corpus")
    ap.add_argument("--queries", type=int, default=128)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument(
        "--search-k", type=int, nargs="*", default=None,
        help="explicit sweep points (default: a geometric ladder)",
    )
    args = ap.parse_args(argv)

    import jax

    rng = np.random.default_rng(args.seed)
    if args.vectors:
        x = np.load(args.vectors).astype(np.float32)
        m, dims = x.shape
        q = x[rng.integers(m, size=args.queries)]
    else:
        m, dims = args.m, args.dims
        n = m + args.queries
        if args.data == "clustered":
            parents = rng.standard_normal((64, dims)).astype(np.float32)
            pa, pb = rng.integers(64, size=n), rng.integers(64, size=n)
            mask = rng.random((n, dims)) < 0.5
            allx = np.where(mask, parents[pa], parents[pb]).astype(np.float32)
            allx += 0.05 * rng.standard_normal((n, dims)).astype(np.float32)
        else:
            allx = rng.standard_normal((n, dims)).astype(np.float32)
        x, q = allx[:m], allx[m:]

    db = Database()
    w = Writer(db, 0, dims, metric=args.distance)
    t0 = time.perf_counter()
    with db.write() as wtxn:
        w.add_items(wtxn, np.arange(m, dtype=np.uint32), x)
        w.builder(seed=args.seed).n_trees(args.n_trees).build(wtxn)
    print(f"build: {time.perf_counter() - t0:.1f}s ({m} x {dims}, "
          f"{args.n_trees} trees)", flush=True)

    r = Reader.open(db.read(), 0, db, metric=args.distance)
    exact = r.exact_by_vectors(q, args.count)
    ex_sets = [set(i for i, _ in e) for e in exact]

    points = args.search_k or [
        args.count * args.n_trees * f for f in (1, 5, 20, 50, 100, 200)
    ]
    for sk in points:
        s = r.searcher(args.count, search_k=sk)
        dq = s.prepare_queries(q)
        jax.block_until_ready(s.device_fn(*dq))  # compile
        t0 = time.perf_counter()
        iters = 10
        outs = [s.device_fn(*dq) for _ in range(iters)]
        jax.block_until_ready(outs)
        dt = time.perf_counter() - t0
        ids = np.asarray(outs[-1][0])[:, : args.count]
        dists = np.asarray(outs[-1][1])[:, : args.count]
        got = [
            set(int(i) for i, d in zip(ri, rd) if not np.isnan(d))
            for ri, rd in zip(ids, dists)
        ]
        rec = float(np.mean([len(g & e) / args.count for g, e in zip(got, ex_sets)]))
        print(
            f"search_k={sk:>7}  recall@{args.count}={rec:.4f}  "
            f"qps={iters * len(q) / dt:9.0f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
