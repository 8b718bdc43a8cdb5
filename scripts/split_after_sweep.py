"""split_after sweep at ann-benchmarks scale (VERDICT r2 item 5).

The reference's leaf capacity knob (`split_after`, default = dimensions;
reference: src/writer.rs:474-477) trades tree depth for leaf width.  On
TPU the interesting trade is different: bigger leaves mean fewer,
fatter probe blocks (denser MXU re-score, fewer centroid rows) while
smaller leaves make centroid ranking more selective.  This sweeps
split_after ∈ {d/2, d, 2d, 4d} on the GloVe-class 1.18M x 100 cosine
corpus and serves each index through the leaf-probe engine and the
exact engine.

    python scripts/split_after_sweep.py [sa,sa,...]

Indexes persist to /tmp/sa_glove_<sa>; re-runs skip builds.  Appends
rows to results/split_after_r03.log.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from cpu_baseline_bench import glove_corpus  # noqa: E402

from arroy_tpu import Database, Reader, Writer  # noqa: E402

M, D, TREES, B, K = 1_183_514, 100, 25, 256, 10
SAS = [int(v) for v in sys.argv[1].split(",")] if len(sys.argv) > 1 else [50, 100, 200, 400]
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results/split_after_r03.log")

cache = f"/tmp/glove_corpus_q_{M}x{D}.npz"
t0 = time.perf_counter()
if os.path.exists(cache):
    z = np.load(cache)
    x, q = z["x"], z["q"]
else:
    x, q = glove_corpus(m=M, dims=D, queries=B)
    np.savez(cache, x=x, q=q)
print(f"corpus: {time.perf_counter() - t0:.0f}s", flush=True)


def measure(s, q, iters=8):
    dq = s.prepare_queries(q)
    t0 = time.perf_counter()
    jax.block_until_ready(s.device_fn(*dq))
    comp = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [s.device_fn(*dq) for _ in range(iters)]
    jax.block_until_ready(outs)
    return len(q) * iters / (time.perf_counter() - t0), comp, outs[-1]


rows = []
for sa in SAS:
    db = Database(f"/tmp/sa_glove_{sa}")
    w = Writer(db, 0, D, metric="cosine")
    st = db.read().state(0)
    have = (
        st is not None and st.metadata is not None
        and len(st.metadata.items) == M and not st.updated
    )
    build_s = 0.0
    if have:
        print(f"[sa={sa}] reusing persisted index", flush=True)
    else:
        t0 = time.perf_counter()
        with db.write() as t:
            t.drop_index(0)
            w.add_items(t, np.arange(M, dtype=np.uint32), x)
            t1 = time.perf_counter()
            w.builder(seed=42).n_trees(TREES).split_after(sa).build(t)
            build_s = time.perf_counter() - t1
        print(f"[sa={sa}] build {build_s:.0f}s", flush=True)
    r = Reader.open(db.read(), 0, db, metric="cosine")
    nq = 64
    exact = r.exact_by_vectors(q[:nq], K, fast=True)
    ex = [set(i for i, _ in e) for e in exact]

    for arm, kw in (
        ("probe_sk8000", dict(search_k=8000, engine="forest", traversal="probe")),
        ("probe_sk16000", dict(search_k=16000, engine="forest", traversal="probe")),
        ("exact_bf16", dict(engine="exact", precision="bf16")),
    ):
        s = r.searcher(K, **kw)
        qps, comp, out = measure(s, q)
        ids = np.asarray(out[0])[:nq, :K]
        rec = sum(len(set(map(int, ri)) & e) for ri, e in zip(ids, ex)) / (nq * K)
        line = (f"[sa={sa}] {arm:14s} {qps:8.0f} qps  recall@{K}={rec:.4f}"
                f"  build={build_s:.0f}s  (compile {comp:.1f}s)")
        print(line, flush=True)
        rows.append(line)

with open(OUT, "a") as f:
    f.write(f"# split_after sweep {M}x{D} cosine, {TREES} trees, B={B} "
            f"(scripts/split_after_sweep.py)\n")
    for line in rows:
        f.write(line + "\n")
print(f"wrote {OUT}", flush=True)
