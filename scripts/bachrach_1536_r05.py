"""1536-d cosine + dot-product (Bachrach) at the REFERENCE tree count.

r4's verdict (weak #5): the "RP-tree worst case" conclusion was reached
at 12 trees, but the reference's auto formula
2^(log10(n)+log10(d)+(768/d)^4) (reference: src/writer.rs:1370-1379)
builds ~375 trees at 200k x 1536 — 31x more.  This sweep measures
forest + probe recall/qps across a trees column (12 / 64 / 128 / 375)
so the verdict is apples-to-apples at the reference's own operating
point; the exact-engine arm is re-recorded alongside.

Run ON TPU:  python scripts/bachrach_1536_r05.py
Env: BM_M (default 200k), BM_B (batch), BM_TREES (comma list).
Appends JSON lines to results/bachrach_1536_r05.jsonl.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from arroy_tpu import Database, Reader, Writer

M = int(os.environ.get("BM_M", 200_000))
D = 1536
B = int(os.environ.get("BM_B", 512))
K = 10
ITERS = 6


def reference_auto_trees(n: int, d: int) -> int:
    """reference: src/writer.rs:1370-1379 (tree-count auto formula)."""
    return int(round(2 ** (math.log10(n) + math.log10(d) + (768.0 / d) ** 4)))


TREES = [
    int(t)
    for t in os.environ.get(
        "BM_TREES", f"12,64,128,{reference_auto_trees(M, D)}"
    ).split(",")
]
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "results",
    "bachrach_1536_r05.jsonl",
)


def corpus(rng, n, d):
    """Clustered + lognormal norms (dot ranking must disagree with
    cosine ranking for the Bachrach reduction to be exercised)."""
    parents = rng.standard_normal((64, d)).astype(np.float32)
    pa, pb = rng.integers(64, size=n), rng.integers(64, size=n)
    mask = rng.random((n, d)) < 0.5
    x = np.where(mask, parents[pa], parents[pb]).astype(np.float32)
    x += 0.05 * rng.standard_normal((n, d)).astype(np.float32)
    x *= np.exp(0.4 * rng.standard_normal((n, 1))).astype(np.float32)
    return x


def emit(rec):
    rec["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def run_metric(metric, trees, x, q, exact_arm):
    path = f"/tmp/bach_{metric.replace(' ', '')}_{M}x{D}_t{trees}"
    db = Database(path)
    w = Writer(db, 0, D, metric=metric)
    try:
        r = Reader.open(db.read(), 0, db, metric=metric)
        print(f"[{metric} t={trees}] reloaded {path}", flush=True)
    except Exception:
        t0 = time.perf_counter()
        with db.write() as txn:
            w.add_items(txn, np.arange(M, dtype=np.uint32), x)
            w.builder(seed=42).n_trees(trees).build(txn)
        emit({"metric": metric, "phase": "build", "trees": trees,
              "seconds": round(time.perf_counter() - t0, 2), "m": M, "d": D})
        r = Reader.open(db.read(), 0, db, metric=metric)

    oracle = r.exact_by_vectors(q[0][:128], K)

    def measure(name, s):
        dqs = [s.prepare_queries(qi) for qi in q]
        jax.block_until_ready(s.device_fn(*dqs[0]))  # compile + warm
        t0 = time.perf_counter()
        outs = [s.device_fn(*dqs[i]) for i in range(ITERS)]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / ITERS
        got = s(q[0][:128])
        hits = sum(
            len({i for i, _ in g} & {i for i, _ in o})
            for g, o in zip(got, oracle)
        )
        emit({"metric": metric, "arm": name, "trees": trees,
              "qps": round(B / dt, 1), "ms_per_batch": round(dt * 1e3, 2),
              "recall_at_10": round(hits / (128 * K), 4),
              "batch": B, "m": M, "d": D})

    if exact_arm:
        measure("exact-default", r.searcher(K, engine="exact"))
    # the reference's own search_k default is count * n_trees
    # (src/reader.rs:228-238): sweep around it
    for sk in sorted({K * trees, 8000, 16000}):
        try:
            measure(f"forest-sk{sk}",
                    r.searcher(K, engine="forest", search_k=sk))
        except Exception as e:
            emit({"metric": metric, "arm": f"forest-sk{sk}", "trees": trees,
                  "error": f"{type(e).__name__}: {e}"})
    for sk in sorted({K * trees, 8000}):
        try:
            measure(f"probe-sk{sk}",
                    r.searcher(K, engine="forest", search_k=sk,
                               traversal="probe"))
        except Exception as e:
            emit({"metric": metric, "arm": f"probe-sk{sk}", "trees": trees,
                  "error": f"{type(e).__name__}: {e}"})


def main():
    print(f"devices: {jax.devices()}  M={M} D={D} trees={TREES} B={B}",
          flush=True)
    rng = np.random.default_rng(42)
    x = corpus(rng, M, D)
    q = [corpus(np.random.default_rng(7 + i), B, D) for i in range(ITERS)]
    for ti, trees in enumerate(TREES):
        for metric in ("dot-product", "cosine"):
            run_metric(metric, trees, x, q, exact_arm=(ti == 0))


if __name__ == "__main__":
    main()
