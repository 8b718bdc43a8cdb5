"""On-chip ablation of the multipop traversal body (round 3).

The multipop loop measures ~10 us per QUEUE LANE per iteration (~700x
the single-pop body at equal queue width), identically for the old
[q_cap, P] one-hot and the new [P, L] segment-grid formulations — so
the cost is not in the queue-update math.  This probe times stripped
variants of the body under a fixed iteration count to attribute the
per-iteration cost to a section: pop reduction, node-table gather,
leaf-log update, margin gather, queue writes.

    python scripts/multipop_ablate.py [db] [q_cap] [iters]
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
from arroy_tpu.search import KIND_LEAF, KIND_FREE, KIND_SPLIT_NONE, _INF  # noqa: E402

DB = sys.argv[1] if len(sys.argv) > 1 else "/tmp/glove_1m"
Q_CAP = int(sys.argv[2]) if len(sys.argv) > 2 else 2944
N_IT = int(sys.argv[3]) if len(sys.argv) > 3 else 128
B = 256
P = 8
L_CAP = 1149

db = Database(DB)
st = db.read().state(0)
r = Reader.open(db.read(), 0, db, metric=st.metadata.distance)
idx = r._device()
print(f"index: {idx.n_items} items; q_cap={Q_CAP} P={P} iters={N_IT}", flush=True)

rng = np.random.default_rng(123)
ids = r.item_ids().ids
pick = rng.choice(len(ids), B, replace=False)
q = np.stack([r.item_vector(int(ids[i])) for i in pick]).astype(np.float32)
s0 = r.searcher(10, engine="exact")
qv, qn, qe, qf = s0.prepare_queries(q)

t = max(len(idx.roots), 1)
roots = jnp.asarray(np.asarray(idx.roots, np.int32))
node_table = idx.node_table
normals = idx.normals
aux = idx.aux
metric = idx.metric
s_rows = normals.shape[0]

q_cap = -(-Q_CAP // P) * P
L = q_cap // P
l_cap = L_CAP

q_iota = jnp.arange(q_cap, dtype=jnp.int32)
l_iota = jnp.arange(l_cap, dtype=jnp.int32)
l_grid = jnp.arange(L, dtype=jnp.int32)
p_iota = jnp.arange(P, dtype=jnp.int32)
k_of_j = (q_iota % L) * P + q_iota // L


def make_fn(variant):
    def impl(qv, qf):
        margins_all = metric.margin_matrix(normals, aux, qv, qf)

        def one(margins1):
            pq_dist = jnp.where(k_of_j < t, _INF, -_INF)
            pq_node = jnp.where(k_of_j < t, roots[jnp.minimum(k_of_j, t - 1)], 0)

            def cond(stt):
                return stt[5] < N_IT

            def body(stt):
                pq_dist, pq_node, n_pushed, leaf_log, n_cand, it = stt
                n_leaf = leaf_log[l_cap - 1]
                grid = pq_dist.reshape(P, L)
                vals = jnp.max(grid, axis=1)
                arg = jnp.argmax(grid, axis=1)
                idxs = p_iota * L + arg
                alive = vals > -_INF
                if variant == "nogather":
                    rows = jnp.zeros((P, 8), jnp.int32) + it
                else:
                    nids = pq_node[idxs]
                    rows = node_table[nids]
                knd = rows[:, 0]
                p = rows[:, 3]
                is_leaf = alive & (knd == KIND_LEAF)
                is_split = alive & ~is_leaf & (knd != KIND_FREE)

                if variant != "nolog":
                    cnts = jnp.where(is_leaf, rows[:, 5], 0)
                    log_lane = is_leaf & (cnts > 0)
                    csum_log = jnp.cumsum(log_lane.astype(jnp.int32))
                    n_log = csum_log[P - 1]
                    rank_of = jnp.searchsorted(
                        csum_log, p_iota + 1, side="left"
                    ).astype(jnp.int32)
                    l_rel = l_iota - n_leaf
                    in_log = (l_rel >= 0) & (l_rel < n_log) & (l_iota < l_cap - 1)
                    lane_l = rank_of[jnp.clip(l_rel, 0, P - 1)]
                    leaf_log = jnp.where(in_log, p[lane_l], leaf_log)
                    n_leaf2 = jnp.minimum(n_leaf + n_log, l_cap - 1)
                    leaf_log = jnp.where(l_iota == l_cap - 1, n_leaf2, leaf_log)
                    n_cand = n_cand + jnp.sum(cnts)
                else:
                    n_cand = n_cand + jnp.sum(p)

                if variant == "nomargin":
                    margin = jnp.zeros(P, jnp.float32) + it
                else:
                    margin = jnp.where(
                        knd == KIND_SPLIT_NONE,
                        0.0,
                        margins1[jnp.minimum(p, s_rows - 1)],
                    )
                dl = jnp.minimum(vals, -margin)
                dr = jnp.minimum(vals, margin)

                if variant != "nopop":
                    pop_val = jnp.where(is_split, dl, -_INF)
                    pop_mask = l_grid[None, :] == arg[:, None]
                    pq_dist = jnp.where(
                        pop_mask, pop_val[:, None], grid
                    ).reshape(q_cap)
                    node_grid = pq_node.reshape(P, L)
                    pop_node = jnp.where(is_split, rows[:, 1], nids if variant != "nogather" else p)
                    pq_node = jnp.where(
                        pop_mask, pop_node[:, None], node_grid
                    ).reshape(q_cap)

                if variant != "nopush":
                    csum_s = jnp.cumsum(is_split.astype(jnp.int32))
                    ns = csum_s[P - 1]
                    rank_s = jnp.searchsorted(
                        csum_s, p_iota + 1, side="left"
                    ).astype(jnp.int32)
                    j_rel = k_of_j - n_pushed
                    in_push = (j_rel >= 0) & (j_rel < ns)
                    lane_p = rank_s[jnp.clip(j_rel, 0, P - 1)]
                    pq_dist = jnp.where(in_push, dr[lane_p], pq_dist)
                    pq_node = jnp.where(in_push, rows[lane_p, 2], pq_node)
                    n_pushed = n_pushed + ns
                else:
                    n_pushed = n_pushed + jnp.sum(dr).astype(jnp.int32) % 3

                return (pq_dist, pq_node, n_pushed, leaf_log, n_cand, it + 1)

            log0 = jnp.zeros(l_cap, jnp.int32)
            out = jax.lax.while_loop(
                cond,
                body,
                (pq_dist, pq_node, jnp.int32(t), log0, jnp.int32(0), jnp.int32(0)),
            )
            return out[0].sum() + out[3].sum() + out[4]

        return jax.vmap(one)(margins_all)

    return jax.jit(impl)


for variant in ("full", "nolog", "nomargin", "nogather", "nopush", "nopop"):
    fn = make_fn(variant)
    t0 = time.perf_counter()
    out = fn(qv, qf)
    jax.block_until_ready(out)
    comp = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(3):
        out = fn(qv, qf)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 3
    print(
        f"  {variant:9s}: {dt * 1e3:8.2f} ms/batch  "
        f"{dt / N_IT * 1e6:8.1f} us/iter  (compile {comp:.1f}s)",
        flush=True,
    )
