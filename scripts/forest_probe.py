"""On-chip probe of the forest traversal tiers (round-3 multipop work).

Times the optimistic-tier traversal alone at several multipop widths,
counts truncated queries (the two-tier fallback trigger), and times the
full serving path — so tier costs and fallback frequency are attributed
instead of guessed.

    python scripts/forest_probe.py [db_path] [dims] [trees]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from arroy_tpu import Database, Reader  # noqa: E402
from arroy_tpu.search import (  # noqa: E402
    _SMALL_POPS_MULT,
    _SMALL_POPS_PAD,
    _next_pow2,
    _traverse_batch,
    _traverse_multipop,
    pops_budget,
)

DB = sys.argv[1] if len(sys.argv) > 1 else "/tmp/glove_1m"
DIMS = int(sys.argv[2]) if len(sys.argv) > 2 else 100
B = 256

db = Database(DB)
r = Reader.open(db.read(), 0, db, metric="cosine" if DIMS == 100 else "euclidean")
idx = r._device()
print(
    f"index: {idx.n_items} items, {len(idx.roots)} trees, {idx.n_splits} splits, "
    f"{len(idx.leaf_cum_np)} leaves, mean leaf "
    f"{idx.leaf_cum_np[-1] / len(idx.leaf_cum_np):.1f}",
    flush=True,
)

rng = np.random.default_rng(123)
# corpus-distributed queries: sample stored items + noise
ids = r.item_ids().ids
pick = rng.choice(len(ids), B, replace=False)
q = np.stack([r.item_vector(int(ids[i])) for i in pick]).astype(np.float32)
q += 0.05 * rng.standard_normal(q.shape).astype(np.float32)
s0 = r.searcher(10, engine="exact")
qv, qn, qe, qf = s0.prepare_queries(q)

t = max(len(idx.roots), 1)
roots = jnp.asarray(np.asarray(idx.roots, np.int32))
filter_words = jnp.zeros(1, jnp.uint32)

for sk_req in (5000, 20000):
    sk_exact = sk_req
    sk = _next_pow2(sk_exact)
    pmax = pops_budget(idx, sk_exact, False, 1.0)
    mean_leaf = float(idx.leaf_cum_np[-1]) / len(idx.leaf_cum_np)
    exp_leaf_pops = int(np.ceil(sk_exact / mean_leaf))
    pmax_small = min(pmax, _SMALL_POPS_MULT * exp_leaf_pops + _SMALL_POPS_PAD)
    l_cap = min(min(sk, pmax), idx.max_leaf_pops(sk)) + 1
    print(
        f"\nsk={sk_req}: pmax={pmax} pmax_small={pmax_small} l_cap={l_cap}",
        flush=True,
    )

    for P in (1, 8, 16, 32):
        lc = l_cap + max(P - 1, 0)
        qc = t + min(pmax_small, idx.n_splits) + 1 + max(P - 1, 0)
        args = (
            idx.node_table, idx.normals, idx.aux, idx.leaf_off, idx.leaf_cnt,
            idx.leaf_items, roots, qv, qf,
        )
        try:
            if P == 1:
                fn = lambda: _traverse_batch(
                    idx.metric, int(sk), int(pmax_small), int(idx.max_leaf),
                    False, *args, filter_words, jnp.int32(sk_exact),
                    q_cap=int(qc), l_cap=int(lc), expand=False,
                )
            else:
                fn = lambda: _traverse_multipop(
                    idx.metric, int(sk), int(pmax_small), int(idx.max_leaf),
                    int(P), *args, jnp.int32(sk_exact),
                    q_cap=int(qc), l_cap=int(lc), expand=False,
                )
            t0 = time.perf_counter()
            out = fn()
            jax.block_until_ready(out)
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            iters = 5
            for _ in range(iters):
                out = fn()
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / iters
            log, pops, ncand = out
            pops_np = np.asarray(pops)
            nc = np.asarray(ncand)
            trunc = int(np.sum((pops_np >= pmax_small) & (nc < sk_exact)))
            print(
                f"  P={P:2d}: traverse {dt * 1e3:8.2f} ms/batch  "
                f"pops p50={int(np.median(pops_np))} max={int(pops_np.max())}  "
                f"truncated {trunc}/{B}  (compile {compile_s:.1f}s)",
                flush=True,
            )
        except Exception as e:
            print(f"  P={P:2d}: FAILED {type(e).__name__}: {e}", flush=True)

    # end-to-end serving comparison at this sk
    for P in (1, 16):
        s = r.searcher(10, search_k=sk_req, engine="forest", multipop=P)
        t0 = time.perf_counter()
        jax.block_until_ready(s.device_fn(qv, qn, qe, qf))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        outs = [s.device_fn(qv, qn, qe, qf) for _ in range(5)]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / 5
        print(
            f"  serve P={P:2d}: {dt * 1e3:8.2f} ms/batch -> {B / dt:7.0f} qps "
            f"(compile {compile_s:.1f}s)",
            flush=True,
        )
