"""Micro-benchmark: what does one traversal while-iteration cost on TPU?

Variants build up the loop body piece by piece to locate the hot part.
Run on the real chip: python scripts/microbench_traverse.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("MB_B", 128))
Q = int(os.environ.get("MB_Q", 512))
D = int(os.environ.get("MB_D", 768))
N = int(os.environ.get("MB_N", 4096))
ITERS = int(os.environ.get("MB_ITERS", 64))


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    reps = 10
    outs = [fn(*args) for _ in range(reps)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / reps / ITERS * 1e6  # µs per iteration


def main():
    rng = np.random.default_rng(0)
    node_table = jnp.asarray(rng.integers(0, N, (N, 8)).astype(np.int32))
    normals = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    qv = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    q_iota = jnp.arange(Q, dtype=jnp.int32)

    def run(body):
        def one(qv1):
            pq_dist = jnp.where(q_iota < 10, jnp.inf, -jnp.inf)
            pq_node = jnp.zeros(Q, jnp.int32)

            def loop_body(k, st):
                return body(k, st, qv1)

            st = jax.lax.fori_loop(0, ITERS, loop_body, (pq_dist, pq_node, jnp.int32(0)))
            return st[0]

        return jax.jit(jax.vmap(one))

    # v1: pop + select updates only
    def body1(k, st, qv1):
        pq_dist, pq_node, n = st
        m = jnp.max(pq_dist)
        mask = pq_dist == m
        nid = jnp.max(jnp.where(mask, pq_node, -1))
        i = jnp.argmax(mask & (pq_node == nid))
        at_i = q_iota == i
        at_push = q_iota == n
        pq_dist = jnp.where(at_i, m - 1.0, pq_dist)
        pq_node = jnp.where(at_i, nid + 1, pq_node)
        pq_dist = jnp.where(at_push, m - 2.0, pq_dist)
        pq_node = jnp.where(at_push, nid + 2, pq_node)
        return (pq_dist, pq_node, n + 1)

    # v2: + node-table row gather
    def body2(k, st, qv1):
        pq_dist, pq_node, n = st
        m = jnp.max(pq_dist)
        mask = pq_dist == m
        nid = jnp.max(jnp.where(mask, pq_node, -1))
        i = jnp.argmax(mask & (pq_node == nid))
        row = node_table[jnp.clip(nid, 0, N - 1)]
        at_i = q_iota == i
        at_push = q_iota == n
        pq_dist = jnp.where(at_i, m - 1.0, pq_dist)
        pq_node = jnp.where(at_i, row[1], pq_node)
        pq_dist = jnp.where(at_push, m - 2.0, pq_dist)
        pq_node = jnp.where(at_push, row[2], pq_node)
        return (pq_dist, pq_node, n + 1)

    # v3: + normals row gather + dot (the margin)
    def body3(k, st, qv1):
        pq_dist, pq_node, n = st
        m = jnp.max(pq_dist)
        mask = pq_dist == m
        nid = jnp.max(jnp.where(mask, pq_node, -1))
        i = jnp.argmax(mask & (pq_node == nid))
        row = node_table[jnp.clip(nid, 0, N - 1)]
        margin = jnp.sum(normals[row[3] % N] * qv1)
        at_i = q_iota == i
        at_push = q_iota == n
        pq_dist = jnp.where(at_i, jnp.minimum(m, -margin), pq_dist)
        pq_node = jnp.where(at_i, row[1], pq_node)
        pq_dist = jnp.where(at_push, jnp.minimum(m, margin), pq_dist)
        pq_node = jnp.where(at_push, row[2], pq_node)
        return (pq_dist, pq_node, n + 1)

    for name, body in (("pq-only", body1), ("+node row", body2), ("+margin", body3)):
        us = timed(run(body), qv)
        print(f"{name:10s}: {us:8.2f} us/iteration (B={B}, Q={Q})", flush=True)


if __name__ == "__main__":
    main()
