"""Warm vs cold build time at the GloVe-class scale (VERDICT r2 item 3).

Builds the 1.18M x 100 x 25-tree index twice in one process (different
seeds, same shapes): the first pays XLA compiles, the second is the
warm-process number the ≤400s target applies to.  In-memory Database —
/tmp/glove_1m (the serving index prior measurements use) is not touched.

    python scripts/glove_build_time.py [m] [dims] [trees]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from arroy_tpu import Database, Writer  # noqa: E402

M = int(sys.argv[1]) if len(sys.argv) > 1 else 1_183_514
D = int(sys.argv[2]) if len(sys.argv) > 2 else 100
TREES = int(sys.argv[3]) if len(sys.argv) > 3 else 25

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
from cpu_baseline_bench import glove_corpus  # noqa: E402

t0 = time.perf_counter()
cache = f"/tmp/glove_corpus_{M}x{D}.npy"
if os.path.exists(cache):
    x = np.load(cache)
else:
    x, _ = glove_corpus(m=M, dims=D)
    np.save(cache, x)
print(f"corpus: {time.perf_counter() - t0:.0f}s", flush=True)

db = Database()
for label, seed in (("cold-process", 42), ("warm", 43)):
    w = Writer(db, 0, D, metric="cosine")
    t0 = time.perf_counter()
    with db.write() as txn:
        if label != "cold-process":
            w.clear(txn)
        w.add_items(txn, np.arange(M, dtype=np.uint32), x)
        t1 = time.perf_counter()
        w.builder(seed=seed).n_trees(TREES).build(txn)
        t2 = time.perf_counter()
    print(
        f"{label}: ingest {t1 - t0:.0f}s  build {t2 - t1:.0f}s  "
        f"commit {time.perf_counter() - t2:.0f}s",
        flush=True,
    )
