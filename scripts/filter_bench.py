"""Filtered-search QPS/recall across selectivities (VERDICT r1 item 6).

Builds one index, then measures query throughput and recall@k for
unfiltered search and candidate filters at 1%, 10% and 50% selectivity.
The reference's filtered search is a roaring intersect per popped leaf
(reference: src/reader.rs:354-360); our engine either bypasses traversal
(filter pool <= search_k: exact re-score of the filter set) or runs the
traversal with a selectivity-scaled pop budget.

Run on the real chip with default env; on CPU it shrinks automatically:
    BENCH_M=100000 python scripts/filter_bench.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from bench import _probe_tpu, make_corpus

    m = int(os.environ.get("BENCH_M", 100_000))
    d = int(os.environ.get("BENCH_D", 768))
    n_trees = int(os.environ.get("BENCH_TREES", 10))
    count = int(os.environ.get("BENCH_K", 10))
    batch = int(os.environ.get("BENCH_BATCH", 256))
    iters = int(os.environ.get("BENCH_ITERS", 4))
    search_k = int(os.environ.get("BENCH_SEARCH_K", count * n_trees * 20))

    if os.environ.get("JAX_PLATFORMS", "") not in ("cpu",) and not _probe_tpu():
        log("TPU unavailable - CPU with a reduced config")
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["PALLAS_AXON_POOL_IPS"] = ""
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")
        m = min(m, 20_000)
        batch = min(batch, 64)

    import jax

    from arroy_tpu import Database, Reader, Writer

    rng = np.random.default_rng(42)
    x = make_corpus(rng, m + batch, d)
    x, queries = x[:m], x[m:]

    # reuse the bench's persisted index when the config matches (same
    # corpus: seed 42 + make_corpus)
    db_path = os.environ.get(
        "BENCH_DB", f"/tmp/arroy_bench_{m}x{d}_t{n_trees}_clustered"
    )
    db = Database(db_path)
    st = db.read().state(0)
    have = (
        st is not None
        and st.metadata is not None
        and st.metadata.dimensions == d
        and len(st.metadata.items) == m
        and len(st.metadata.roots) == n_trees
        and not st.updated
    )
    if have:
        log(f"reusing persisted index at {db_path}")
    else:
        w = Writer(db, 0, d, metric="euclidean")
        t0 = time.perf_counter()
        with db.write() as wtxn:
            wtxn.drop_index(0)
            w.add_items(wtxn, np.arange(m, dtype=np.uint32), x)
            w.builder(seed=42).n_trees(n_trees).build(wtxn)
        log(f"build: {time.perf_counter() - t0:.1f}s  (m={m}, d={d}, trees={n_trees})")
    r = Reader.open(db.read(), 0, db)

    # oracle depth: enough of the exact ranking that intersecting with a
    # 1% filter still leaves >= count ground-truth items per query
    depth = m if m <= 200_000 else max(5_000, 200 * count)
    exact_all = r.exact_by_vectors(queries[: min(batch, 64)], depth)
    nq = min(batch, 64)

    def run(name, cand_ids, engine="forest"):
        s = r.searcher(
            count, search_k=search_k, candidates=cand_ids, engine=engine
        )
        dq = s.prepare_queries(queries)
        t0 = time.perf_counter()
        jax.block_until_ready(s.device_fn(*dq))
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        outs = [s.device_fn(*dq) for _ in range(iters)]
        jax.block_until_ready(outs)
        dt = time.perf_counter() - t0
        qps = iters * batch / dt
        ids = np.asarray(outs[-1][0])[:, :count]
        dists = np.asarray(outs[-1][1])[:, :count]
        cset = None if cand_ids is None else set(int(c) for c in cand_ids)
        hits = tot = 0
        for qi in range(nq):
            got = set(
                int(i) for i, dd in zip(ids[qi], dists[qi]) if not np.isnan(dd)
            )
            want_full = [i for i, _ in exact_all[qi]]
            want = [i for i in want_full if cset is None or i in cset][:count]
            hits += len(got & set(want))
            tot += len(want)
        recall = hits / max(tot, 1)
        log(
            f"{name:>12}: {qps:8.0f} qps  recall@{count}={recall:.4f}"
            f"  (compile {t_compile:.1f}s)"
        )
        return qps, recall

    qps0, rec0 = run("unfiltered", None)
    results = {"unfiltered": {"qps": qps0, "recall": rec0}}
    for frac in (0.5, 0.1, 0.01):
        cand = np.sort(rng.choice(m, size=max(int(m * frac), 1), replace=False))
        qps, rec = run(f"{frac:.0%} filter", cand.astype(np.uint32))
        qpe, rece = run(f"{frac:.0%} exact", cand.astype(np.uint32), engine="exact")
        results[f"{frac:.0%}"] = {
            "qps": qps,
            "recall": rec,
            "vs_unfiltered": qps / qps0,
            "exact_qps": qpe,
            "exact_recall": rece,
        }

    import json

    print(json.dumps(results, indent=2), flush=True)


if __name__ == "__main__":
    main()
