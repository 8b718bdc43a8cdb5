"""A/B the XLA while-loop traversal vs the Pallas VMEM kernel on TPU.

Run manually when the TPU tunnel is up (one process at a time!):
    python scripts/ab_traversal.py [M] [trees]

Uses the persisted /tmp/db20k index when present so repeat runs skip the
cold build+compile.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp  # noqa: E402

from arroy_tpu import Database, Reader, Writer  # noqa: E402

M = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
TREES = int(sys.argv[2]) if len(sys.argv) > 2 else 10
D = 768
PERSIST = f"/tmp/db{M // 1000}k"

if os.path.isdir(PERSIST) and os.listdir(PERSIST):
    db = Database(PERSIST)
else:
    db = Database(PERSIST)
    w = Writer(db, 0, D)
    rng = np.random.default_rng(42)
    x = rng.standard_normal((M, D)).astype(np.float32)
    t0 = time.perf_counter()
    with db.write() as t:
        w.add_items(t, np.arange(M, dtype=np.uint32), x)
        w.builder(seed=42).n_trees(TREES).build(t)
    print(f"build: {time.perf_counter() - t0:.1f}s", flush=True)

r = Reader.open(db.read(), 0, db)
rng = np.random.default_rng(7)
q = rng.standard_normal((512, D)).astype(np.float32)

for B in (128, 512):
    for sk in (100, 1000, 5000):
        row = {}
        for trav in ("xla", "pallas"):
            s = r.searcher(10, search_k=sk, traversal=trav)
            dq = s.prepare_queries(q[:B])
            jax.block_until_ready(s.device_fn(*dq))  # compile
            t0 = time.perf_counter()
            outs = [s.device_fn(*dq) for _ in range(20)]
            jax.block_until_ready(outs)
            row[trav] = (time.perf_counter() - t0) / 20
        ratio = row["xla"] / row["pallas"]
        print(
            f"B={B} sk={sk}: xla {row['xla']*1e3:8.2f} ms  "
            f"pallas {row['pallas']*1e3:8.2f} ms  ({ratio:.2f}x)",
            flush=True,
        )

# spot-check result parity on-chip
s_x = r.searcher(10, search_k=1000, traversal="xla")
s_p = r.searcher(10, search_k=1000, traversal="pallas")
assert s_x(q[:32]) == s_p(q[:32]), "pallas/xla results diverge on TPU"
print("parity OK", flush=True)
