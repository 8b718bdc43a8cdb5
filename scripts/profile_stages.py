"""Stage-level profile of the search hot path on a persisted index.

Times the margin matmul, the traversal while-loop, and the re-score
separately, and reports the actual pop counts, so optimization effort
goes where the time is.  Run on the real chip (one TPU process at a
time):

    python scripts/profile_stages.py [db_path] [B] [sk ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp  # noqa: E402

from arroy_tpu import Database  # noqa: E402
from arroy_tpu.search import (  # noqa: E402
    _next_pow2,
    _rescore_batch,
    _rescore_matmul,
    _traverse_batch,
    pops_budget,
    rescore_mode,
)

DB = sys.argv[1] if len(sys.argv) > 1 else "/tmp/arroy_bench_100000x768_t10_clustered"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 256
SKS = [int(a) for a in sys.argv[3:]] or [2000, 4000, 8000]


def timed(fn, reps=10):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    outs = [fn() for _ in range(reps)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / reps


def main():
    db = Database(DB)
    st = db.read().state(0)
    dev = db.device_index(0, st)
    d = dev.dims
    rng = np.random.default_rng(7)
    qv = jnp.asarray(rng.standard_normal((B, d)).astype(np.float32))
    qn = jnp.linalg.norm(qv, axis=1)
    qe = jnp.zeros(B, jnp.float32)
    qf = jnp.ones(B, jnp.float32)
    roots = jnp.asarray(np.asarray(dev.roots, np.int32))
    t = len(dev.roots)
    print(
        f"index: {dev.n_items} items, {dev.n_nodes} nodes, {t} trees, "
        f"max_leaf={dev.max_leaf}, splits={dev.normals.shape[0]}",
        flush=True,
    )

    dt_m = timed(
        lambda: dev.metric.margin_matrix(dev.normals, dev.aux, qv, qf)
    )
    print(f"margin matmul [B={B} x S={dev.normals.shape[0]}]: {dt_m*1e3:8.2f} ms")

    for sk_req in SKS:
        csr = int(dev.leaf_items.shape[0]) - dev.max_leaf
        ske = min(sk_req, csr)
        sk = _next_pow2(ske)
        pmax = pops_budget(dev, ske, False)
        sk_dyn = jnp.int32(ske)

        q_cap = t + min(pmax, dev.n_splits) + 1
        l_cap = min(min(sk, pmax), dev.max_leaf_pops(sk)) + 1

        def trav():
            return _traverse_batch(
                dev.metric, int(sk), int(pmax), int(dev.max_leaf), False,
                dev.node_table, dev.normals, dev.aux,
                dev.leaf_off, dev.leaf_cnt, dev.leaf_items,
                roots, qv, qf, jnp.zeros(1, jnp.uint32), sk_dyn,
                q_cap=int(q_cap), l_cap=int(l_cap),
            )

        dt_t = timed(trav)
        cand, pops, n_cand = trav()
        pops_np = np.asarray(pops)
        k = max(min(_next_pow2(10), sk + dev.max_leaf), 1)
        mode = rescore_mode(dev.metric, B, int(cand.shape[1]), dev.n_items, "auto")
        impl = _rescore_matmul if mode == "matmul" else _rescore_batch

        def resc():
            return impl(
                dev.metric, dev.dims, int(k), dev.rows, dev.norms, dev.extras,
                dev.slot_to_id, cand, qv, qn, qe,
            )

        dt_r = timed(resc)
        print(
            f"sk={sk_req:6d} (pmax={pmax:6d}): traverse {dt_t*1e3:8.2f} ms  "
            f"rescore[{mode}] {dt_r*1e3:8.2f} ms   "
            f"pops max={pops_np.max()} mean={pops_np.mean():.0f}  "
            f"us/pop={dt_t/max(pops_np.max(),1)*1e6:.1f}",
            flush=True,
        )


def bisect_loop_vs_expand():
    """Append-on: time the traversal with search_k_dyn=0 (zero pops ->
    margins + expansion + dispatch only) vs the full run."""
    db = Database(DB)
    st = db.read().state(0)
    dev = db.device_index(0, st)
    d = dev.dims
    rng = np.random.default_rng(7)
    qv = jnp.asarray(rng.standard_normal((B, d)).astype(np.float32))
    qf = jnp.ones(B, jnp.float32)
    roots = jnp.asarray(np.asarray(dev.roots, np.int32))
    for sk_req in SKS:
        csr = int(dev.leaf_items.shape[0]) - dev.max_leaf
        ske = min(sk_req, csr)
        sk = _next_pow2(ske)
        pmax = pops_budget(dev, ske, False)

        q_cap = len(dev.roots) + min(pmax, dev.n_splits) + 1
        l_cap = min(min(sk, pmax), dev.max_leaf_pops(sk)) + 1

        def trav(skd):
            return _traverse_batch(
                dev.metric, int(sk), int(pmax), int(dev.max_leaf), False,
                dev.node_table, dev.normals, dev.aux,
                dev.leaf_off, dev.leaf_cnt, dev.leaf_items,
                roots, qv, qf, jnp.zeros(1, jnp.uint32), skd,
                q_cap=int(q_cap), l_cap=int(l_cap),
            )

        zero = jnp.int32(0)
        full = jnp.int32(ske)
        dt0 = timed(lambda: trav(zero))
        dt1 = timed(lambda: trav(full))
        _, pops, _ = trav(full)
        mp = int(np.asarray(pops).max())
        print(
            f"sk={sk_req:6d}: zero-pop {dt0*1e3:8.2f} ms  full {dt1*1e3:8.2f} ms"
            f"  -> loop {(dt1-dt0)*1e3:8.2f} ms / {mp} pops"
            f" = {(dt1-dt0)/max(mp,1)*1e6:7.1f} us/pop",
            flush=True,
        )


if __name__ == "__main__":
    (bisect_loop_vs_expand if os.environ.get("PROFILE_BISECT") else main)()
