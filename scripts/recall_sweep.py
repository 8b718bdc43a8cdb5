"""Recall@k vs search_k vs QPS sweep (the ann-benchmarks-style curve).

Run on the real chip:  python scripts/recall_sweep.py
Env: SWEEP_M, SWEEP_D, SWEEP_TREES, SWEEP_K, SWEEP_SPLIT_AFTER.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

M = int(os.environ.get("SWEEP_M", 20_000))
D = int(os.environ.get("SWEEP_D", 768))
TREES = int(os.environ.get("SWEEP_TREES", 10))
K = int(os.environ.get("SWEEP_K", 10))
SPLIT_AFTER = os.environ.get("SWEEP_SPLIT_AFTER")
BATCH = int(os.environ.get("SWEEP_BATCH", 128))


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from arroy_tpu import Database, Reader, Writer

    rng = np.random.default_rng(42)
    if os.environ.get("SWEEP_DATA", "random") == "clustered":
        parents = rng.standard_normal((64, D)).astype(np.float32)
        pa = rng.integers(64, size=M + BATCH)
        pb = rng.integers(64, size=M + BATCH)
        mask = rng.random((M + BATCH, D)) < 0.5
        allx = np.where(mask, parents[pa], parents[pb]).astype(np.float32)
        allx += 0.05 * rng.standard_normal(allx.shape).astype(np.float32)
        x, q = allx[:M], allx[M:]
    else:
        x = rng.standard_normal((M, D)).astype(np.float32)
        q = rng.standard_normal((BATCH, D)).astype(np.float32)

    db = Database()
    w = Writer(db, 0, D)
    t0 = time.perf_counter()
    with db.write() as wtxn:
        w.add_items(wtxn, np.arange(M, dtype=np.uint32), x)
        b = w.builder(seed=42).n_trees(TREES)
        if SPLIT_AFTER:
            b.split_after(int(SPLIT_AFTER))
        b.build(wtxn)
    print(f"build: {time.perf_counter() - t0:.1f}s", flush=True)

    r = Reader.open(db.read(), 0, db)
    exact = r.exact_by_vectors(q, K)
    ex_sets = [set(i for i, _ in e) for e in exact]

    import jax

    for sk in (K * TREES, 1000, 2000, 5000, 10000, 20000, 50000):
        s = r.searcher(K, search_k=sk)
        dq = s.prepare_queries(q)
        jax.block_until_ready(s.device_fn(*dq))  # warmup/compile
        t0 = time.perf_counter()
        iters = 10
        outs = [s.device_fn(*dq) for _ in range(iters)]
        jax.block_until_ready(outs)
        dt = time.perf_counter() - t0
        ids = np.asarray(outs[-1][0])[:, :K]
        dists = np.asarray(outs[-1][1])[:, :K]
        got_sets = [
            set(int(i) for i, d in zip(ri, rd) if not np.isnan(d))
            for ri, rd in zip(ids, dists)
        ]
        rec = np.mean([len(g & e) / K for g, e in zip(got_sets, ex_sets)])
        print(
            f"search_k={sk:>6}  recall@{K}={rec:.4f}  qps={iters * BATCH / dt:8.0f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
