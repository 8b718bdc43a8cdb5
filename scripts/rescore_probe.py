"""On-chip bisection of the forest re-score stages (round 3).

The forest serve path at 1.18M x 100 measures ~25x the traversal cost;
this times each stage standalone: leaf-log expansion, the [B, M]
candidate-mask scatter, the chunked matmul scan, and the gather+sort
exact re-score — to decide where the time goes and which rescore mode
should win at which shape.

    python scripts/rescore_probe.py [db] [sk ...]
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
import arroy_tpu.search as S  # noqa: E402

DB = sys.argv[1] if len(sys.argv) > 1 else "/tmp/glove_1m"
SKS = [int(v) for v in sys.argv[2:]] or [5000, 20000]
B = 256

db = Database(DB)
metric_name = None
st = db.read().state(0)
metric_name = st.metadata.distance
r = Reader.open(db.read(), 0, db, metric=metric_name)
idx = r._device()
m = idx.n_items
print(f"index: {m} items x {idx.dims}d, metric {metric_name}", flush=True)

rng = np.random.default_rng(123)
ids = r.item_ids().ids
pick = rng.choice(len(ids), B, replace=False)
q = np.stack([r.item_vector(int(ids[i])) for i in pick]).astype(np.float32)
q += 0.05 * rng.standard_normal(q.shape).astype(np.float32)
s0 = r.searcher(10, engine="exact")
qv, qn, qe, qf = s0.prepare_queries(q)


def timeit(fn, iters=5):
    t0 = time.perf_counter()
    out = fn()
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, compile_s, out


t = max(len(idx.roots), 1)
roots = jnp.asarray(np.asarray(idx.roots, np.int32))
fw = jnp.zeros(1, jnp.uint32)

for sk_req in SKS:
    sk_exact = sk_req
    sk = S._next_pow2(sk_exact)
    pmax = S.pops_budget(idx, sk_exact, False, 1.0)
    mean_leaf = float(idx.leaf_cum_np[-1]) / len(idx.leaf_cum_np)
    pmax_small = min(
        pmax, S._SMALL_POPS_MULT * int(np.ceil(sk_exact / mean_leaf)) + S._SMALL_POPS_PAD
    )
    l_cap = min(min(sk, pmax), idx.max_leaf_pops(sk)) + 1
    qc = t + min(pmax_small, idx.n_splits) + 1
    cap = sk + idx.max_leaf
    print(f"\nsk={sk_req} (cap={cap}, l_cap={l_cap}):", flush=True)

    # traversal (expand=False) -> the leaf log
    def trav():
        return S._traverse_batch(
            idx.metric, int(sk), int(pmax_small), int(idx.max_leaf), False,
            idx.node_table, idx.normals, idx.aux, idx.leaf_off, idx.leaf_cnt,
            idx.leaf_items, roots, qv, qf, fw, jnp.int32(sk_exact),
            q_cap=int(qc), l_cap=int(l_cap), expand=False,
        )

    dt, comp, (log, pops, ncand) = timeit(trav)
    print(f"  traverse(expand=False): {dt * 1e3:8.2f} ms  (compile {comp:.1f}s)", flush=True)

    @jax.jit
    def expand(log):
        return jax.vmap(
            lambda lg: S._expand_one_log(
                lg, idx.leaf_off, idx.leaf_cnt, idx.leaf_items, cap
            )
        )(log)

    dt, comp, cand = timeit(lambda: expand(log))
    print(f"  expansion:              {dt * 1e3:8.2f} ms  (compile {comp:.1f}s)", flush=True)

    @jax.jit
    def build_mask(cand):
        valid0 = cand >= 0
        slots_c = jnp.maximum(cand, 0)
        mask = jnp.zeros((B, m), jnp.bool_)
        mask = mask.at[
            jnp.arange(B, dtype=jnp.int32)[:, None], slots_c
        ].max(valid0)
        return jnp.sum(mask.astype(jnp.int32))

    dt, comp, _ = timeit(lambda: build_mask(cand))
    print(f"  [B,M] mask scatter:     {dt * 1e3:8.2f} ms  (compile {comp:.1f}s)", flush=True)

    chunk = S._scan_chunk(B)
    rows_p, aux_p = None, None
    # build scan operands once (same as serving bind)
    mpad = -(-idx.cap // chunk) * chunk
    pad = mpad - idx.cap
    rows_p = idx.rows
    if idx.metric.name == "euclidean":
        aux_p = S._row_sq(idx.rows)
    elif idx.metric.name == "cosine":
        aux_p = idx.norms
    else:
        aux_p = jnp.zeros(idx.cap, jnp.float32)
    if pad:
        rows_p = jnp.concatenate(
            [rows_p, jnp.zeros((pad, idx.rows.shape[1]), idx.rows.dtype)]
        )
        aux_p = jnp.concatenate([aux_p, jnp.zeros(pad, jnp.float32)])

    def scan_rescore():
        return S._rescore_matmul_scan(
            idx.metric, idx.dims, 16, chunk, idx.slot_to_id, rows_p, aux_p,
            cand, qv, qn, qe,
        )

    dt, comp, _ = timeit(scan_rescore)
    print(f"  rescore matmul_scan:    {dt * 1e3:8.2f} ms  (compile {comp:.1f}s)", flush=True)

    def gather_rescore():
        return S._rescore_batch(
            idx.metric, idx.dims, 16, idx.rows, idx.norms, idx.extras,
            idx.slot_to_id, cand, qv, qn, qe,
        )

    dt, comp, _ = timeit(gather_rescore)
    print(f"  rescore gather+sort:    {dt * 1e3:8.2f} ms  (compile {comp:.1f}s)", flush=True)
