"""Bisect the real traversal body cost on the persisted 20k index.

Variants of the loop body run on the REAL index arrays (loaded from
/tmp/db20k) so gathers hit the true shapes/addresses.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from arroy_tpu import Database
from arroy_tpu.models.forest import KIND_LEAF, KIND_SPLIT_NONE
from arroy_tpu.search import _next_pow2, pops_budget

B = 128
SK_REQ = 100
ITERS = 40  # fixed trip count == measured max pops


def main():
    db = Database("/tmp/db20k")
    st = db.read().state(0)
    dev = db.device_index(0, st)
    rng = np.random.default_rng(7)
    qv = jnp.asarray(rng.standard_normal((B, 768)).astype(np.float32))
    qf = jnp.ones(B)

    csr = int(dev.leaf_items.shape[0]) - dev.max_leaf
    ske = min(SK_REQ, csr)
    sk = _next_pow2(ske)
    pmax = pops_budget(dev, ske, False)
    t = len(dev.roots)
    q_cap = t + pmax
    l_cap = min(sk, pmax) + 1
    q_iota = jnp.arange(q_cap, dtype=jnp.int32)
    l_iota = jnp.arange(l_cap, dtype=jnp.int32)
    roots = jnp.asarray(np.asarray(dev.roots, np.int32))
    node_table, normals, aux = dev.node_table, dev.normals, dev.aux
    metric = dev.metric

    def make(variant):
        def one(qv1, qf1):
            pq_dist = jnp.where(q_iota < t, jnp.inf, -jnp.inf)
            pq_node = jnp.where(q_iota < t, roots[jnp.minimum(q_iota, t - 1)], 0)

            def body(k, stt):
                pq_dist, pq_node, n_pushed, leaf_log, n_cand = stt
                n_leaf = leaf_log[l_cap - 1]
                m = jnp.max(pq_dist)
                alive = m > -jnp.inf
                mask = pq_dist == m
                nid = jnp.max(jnp.where(mask, pq_node, -1))
                i = jnp.argmax(mask & (pq_node == nid))
                if variant >= 1:
                    row = node_table[nid]
                    knd = row[0]
                    p = row[3]
                else:
                    knd = nid % 3
                    p = nid % 64
                    row = jnp.zeros(8, jnp.int32)
                is_leaf = alive & (knd == KIND_LEAF)
                is_split = alive & ~is_leaf
                cnt = jnp.where(is_leaf, row[5] if variant >= 1 else 7, 0)
                if variant >= 2:
                    log_it = is_leaf & (cnt > 0) & (n_leaf < l_cap - 1)
                    leaf_log = jnp.where(log_it & (l_iota == n_leaf), p, leaf_log)
                    leaf_log = jnp.where(
                        l_iota == l_cap - 1,
                        n_leaf + log_it.astype(jnp.int32),
                        leaf_log,
                    )
                n_cand = n_cand + cnt
                if variant >= 3:
                    margin = jnp.where(
                        knd == KIND_SPLIT_NONE,
                        0.0,
                        metric.base_dot(normals[p], qv1) + aux[p] * qf1,
                    )
                else:
                    margin = m * 0.5
                dl = jnp.minimum(m, -margin)
                dr = jnp.minimum(m, margin)
                at_i = q_iota == i
                at_push = q_iota == n_pushed
                pq_dist = jnp.where(at_i, jnp.where(is_split, dl, -jnp.inf), pq_dist)
                pq_node = jnp.where(at_i & is_split, row[1], pq_node)
                pq_dist = jnp.where(at_push & is_split, dr, pq_dist)
                pq_node = jnp.where(at_push & is_split, row[2], pq_node)
                n_pushed = n_pushed + jnp.where(is_split, 1, 0)
                return (pq_dist, pq_node, n_pushed, leaf_log, n_cand)

            stt = (pq_dist, pq_node, jnp.int32(t), jnp.zeros(l_cap, jnp.int32), jnp.int32(0))
            stt = jax.lax.fori_loop(0, ITERS, body, stt)
            return stt[0][0] + stt[4]

        return jax.jit(jax.vmap(one))

    names = ["v0 pq-only", "v1 +node row", "v2 +leaf log", "v3 +margin"]
    for v, name in enumerate(names):
        f = make(v)
        jax.block_until_ready(f(qv, qf))
        t0 = time.perf_counter()
        outs = [f(qv, qf) for _ in range(10)]
        jax.block_until_ready(outs)
        us = (time.perf_counter() - t0) / 10 / ITERS * 1e6
        print(f"{name:14s}: {us:8.2f} us/iter", flush=True)


if __name__ == "__main__":
    main()
