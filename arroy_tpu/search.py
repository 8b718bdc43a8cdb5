"""Vectorized best-first forest traversal + exact re-scoring.

The reference query engine pops a global max-heap seeded with every tree
root at +inf, descends split planes pushing children at
``min(parent, ∓margin)``, gathers descendants until `search_k` candidate
items are collected, then re-scores candidates exactly and keeps the
top-k (reference: src/reader.rs:317-401).

Here the same priority queue lives in fixed-shape device arrays inside a
`lax.while_loop`, vmapped over a batch of queries: argmax-pop (with the
max-heap's (dist, node-id) tie order), gather of the split row, one fused
margin, and CSR window appends for descendants.  Re-scoring is one
batched gather + distance + `lax.top_k`, replacing `median_based_top_k`
(reference: src/reader.rs:607-640).

Traversal deviates from the reference in exactly one way: a pop budget
(`pmax`) bounds the loop for XLA's static shapes.  The budget is set
high enough to be unreachable for default `search_k` values, and when
filters or exhaustive search are requested it is raised to the total
node count so the traversal is never truncated.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .device import DeviceIndex
from .models.forest import KIND_LEAF, KIND_SPLIT_NONE

_INF = jnp.float32(jnp.inf)


def _next_pow2(n: int) -> int:
    p = 1
    while p < max(n, 1):
        p *= 2
    return p


def pops_budget(idx: DeviceIndex, search_k: int, exhaustive: bool) -> int:
    t = max(len(idx.roots), 1)
    if exhaustive or search_k >= idx.n_items:
        return idx.n_nodes + t
    return min(idx.n_nodes + t, 2 * t + 2 * search_k + 64)


@functools.partial(
    jax.jit,
    static_argnames=("metric", "dims", "search_k", "k", "pmax", "w", "has_filter"),
)
def _search_batch(
    metric,
    dims,
    search_k,
    k,
    pmax,
    w,
    has_filter,
    # index arrays
    rows,
    norms,
    extras,
    slot_to_id,
    kind,
    left,
    right,
    ptr,
    normals,
    aux,
    leaf_off,
    leaf_cnt,
    leaf_items,
    roots,
    # queries
    qv,
    qn,
    qe,
    qf,
    filter_words,
    search_k_dyn,
):
    # `search_k` (static) sizes the buffers; `search_k_dyn` (traced, <= the
    # static bucket) is the exact stopping threshold so results match the
    # reference for any user-provided value, not just pow2 buckets.
    t = roots.shape[0]
    q_cap = t + pmax
    cap = search_k + w

    def one(qv1, qn1, qe1, qf1):
        pq_dist = jnp.full(q_cap, -_INF, jnp.float32).at[:t].set(_INF)
        pq_node = jnp.zeros(q_cap, jnp.int32).at[:t].set(roots)

        def cond(st):
            _, _, _, _, n_cand, pops = st
            return (n_cand < search_k_dyn) & (pops < pmax)

        def body(st):
            pq_dist, pq_node, n_pushed, cand, n_cand, pops = st
            m = jnp.max(pq_dist)

            def do_pop(st):
                pq_dist, pq_node, n_pushed, cand, n_cand, pops = st
                # max-heap pop: max dist, ties broken by larger node id
                # (BinaryHeap<(OrderedFloat, NodeId)>, reference src/reader.rs:342)
                mask = pq_dist == m
                nid = jnp.max(jnp.where(mask, pq_node, -1))
                i = jnp.argmax(mask & (pq_node == nid))
                pq_dist = pq_dist.at[i].set(-_INF)
                knd = kind[nid]
                p = ptr[nid]

                def leaf_case(op):
                    pq_dist, pq_node, n_pushed, cand, n_cand = op
                    off = leaf_off[p]
                    cnt = leaf_cnt[p]
                    win = jax.lax.dynamic_slice(leaf_items, (off,), (w,))
                    valid = jnp.arange(w, dtype=jnp.int32) < cnt
                    if has_filter:
                        slot_c = jnp.maximum(win, 0)
                        word = filter_words[slot_c >> 5]
                        bit = (word >> (slot_c & 31).astype(jnp.uint32)) & jnp.uint32(1)
                        valid = valid & (bit == 1)
                    order = jnp.argsort(~valid, stable=True)  # valid entries first
                    win2 = jnp.where(valid, win, -1)[order]
                    cand = jax.lax.dynamic_update_slice(cand, win2, (n_cand,))
                    return (
                        pq_dist,
                        pq_node,
                        n_pushed,
                        cand,
                        n_cand + jnp.sum(valid.astype(jnp.int32)),
                    )

                def split_case(op):
                    pq_dist, pq_node, n_pushed, cand, n_cand = op
                    margin = jnp.where(
                        knd == KIND_SPLIT_NONE,
                        0.0,
                        metric.base_dot(normals[p], qv1) + aux[p] * qf1,
                    )
                    dl = jnp.minimum(m, -margin)
                    dr = jnp.minimum(m, margin)
                    pq_dist = pq_dist.at[i].set(dl)
                    pq_node = pq_node.at[i].set(left[nid])
                    pq_dist = pq_dist.at[n_pushed].set(dr)
                    pq_node = pq_node.at[n_pushed].set(right[nid])
                    return (pq_dist, pq_node, n_pushed + 1, cand, n_cand)

                pq_dist, pq_node, n_pushed, cand, n_cand = jax.lax.cond(
                    knd == KIND_LEAF,
                    leaf_case,
                    split_case,
                    (pq_dist, pq_node, n_pushed, cand, n_cand),
                )
                return (pq_dist, pq_node, n_pushed, cand, n_cand, pops + 1)

            return jax.lax.cond(
                m > -_INF, do_pop, lambda st: (*st[:5], jnp.int32(pmax)), st
            )

        cand0 = jnp.full(cap, -1, jnp.int32)
        _, _, _, cand, n_cand, _ = jax.lax.while_loop(
            cond,
            body,
            (pq_dist, pq_node, jnp.int32(t), cand0, jnp.int32(0), jnp.int32(0)),
        )

        # ---- exact re-score (reference src/reader.rs:376-400) ----
        valid0 = cand >= 0
        ids = slot_to_id[jnp.maximum(cand, 0)]  # uint32
        # sort valid candidates first, by ascending id (the reference's
        # sort_unstable + dedup, src/reader.rs:378-379)
        order = jnp.lexsort((ids, ~valid0))
        ids_s = ids[order]
        valid_s = valid0[order]
        slots_s = cand[order]
        dup = jnp.concatenate(
            [jnp.zeros(1, bool), (ids_s[1:] == ids_s[:-1]) & valid_s[:-1]]
        )
        invalid = ~valid_s | dup
        slots_c = jnp.maximum(slots_s, 0)
        x = rows[slots_c]
        xn = norms[slots_c]
        xe = extras[slots_c]
        d = metric.built_distance(qv1, qn1, qe1, x, xn, xe)
        d = jnp.where(invalid, _INF, d)
        neg, top_idx = jax.lax.top_k(-d, k)
        out_d = -neg
        out_ids = ids_s[top_idx]
        out_d = jnp.where(
            out_d < _INF, metric.normalized_distance(out_d, dims), jnp.float32(jnp.nan)
        )
        return out_ids, out_d

    return jax.vmap(one)(qv, qn, qe, qf)


def search_batch(
    idx: DeviceIndex,
    qv: np.ndarray,
    qn: np.ndarray,
    qe: np.ndarray,
    qf: np.ndarray,
    count: int,
    search_k: int,
    filter_slots: np.ndarray | None,
) -> tuple[np.ndarray, np.ndarray]:
    """Host wrapper: bucketed static shapes + filter bitset upload."""
    if idx.n_items == 0 or not idx.roots:
        b = qv.shape[0]
        return np.zeros((b, count), np.int64), np.full((b, count), np.nan, np.float32)

    has_filter = filter_slots is not None
    n_words = max((idx.cap + 31) // 32, 1)
    if has_filter:
        words = np.zeros(n_words, np.uint32)
        fs = np.asarray(filter_slots, dtype=np.int64)
        np.bitwise_or.at(words, fs >> 5, np.uint32(1) << (fs & 31).astype(np.uint32))
        filter_words = jnp.asarray(words)
    else:
        filter_words = jnp.zeros(1, jnp.uint32)

    # candidate count includes duplicates across trees (the reference counts
    # `nns.len()` the same way, src/reader.rs:341), so the only safe clamp is
    # the total number of CSR leaf entries — past that the queue is exhausted.
    csr_total = max(int(idx.leaf_items.shape[0]) - idx.max_leaf, 1)
    sk_exact = min(max(search_k, count), csr_total)
    sk = _next_pow2(sk_exact)
    k = min(_next_pow2(count), sk + idx.max_leaf)
    pmax = pops_budget(idx, sk_exact, has_filter)

    # bound the [B, cap, sd] re-score gather: chunk the query batch so the
    # temporary stays under ~256 MB
    cap_rows = sk + idx.max_leaf
    bytes_per_q = max(cap_rows * idx.rows.shape[1] * 4, 1)
    chunk_b = max(1, min(qv.shape[0], (256 << 20) // bytes_per_q))
    if qv.shape[0] > chunk_b:
        parts = [
            search_batch(
                idx,
                qv[i : i + chunk_b],
                qn[i : i + chunk_b],
                qe[i : i + chunk_b],
                qf[i : i + chunk_b],
                count,
                search_k,
                filter_slots,
            )
            for i in range(0, qv.shape[0], chunk_b)
        ]
        return (
            np.concatenate([p[0] for p in parts], axis=0),
            np.concatenate([p[1] for p in parts], axis=0),
        )

    ids, dists = _search_batch(
        idx.metric,
        idx.dims,
        int(sk),
        int(k),
        int(pmax),
        int(idx.max_leaf),
        bool(has_filter),
        idx.rows,
        idx.norms,
        idx.extras,
        idx.slot_to_id,
        idx.kind,
        idx.left,
        idx.right,
        idx.ptr,
        idx.normals,
        idx.aux,
        idx.leaf_off,
        idx.leaf_cnt,
        idx.leaf_items,
        jnp.asarray(np.asarray(idx.roots, np.int32)),
        jnp.asarray(qv),
        jnp.asarray(qn),
        jnp.asarray(qe),
        jnp.asarray(qf),
        filter_words,
        jnp.int32(sk_exact),
    )
    ids = np.asarray(ids).astype(np.int64)[:, :count]
    dists = np.asarray(dists)[:, :count]
    if ids.shape[1] < count:
        pad = count - ids.shape[1]
        ids = np.concatenate([ids, np.zeros((ids.shape[0], pad), ids.dtype)], axis=1)
        dists = np.concatenate(
            [dists, np.full((dists.shape[0], pad), np.nan, dists.dtype)], axis=1
        )
    return ids, dists


# ---------------------------------------------------------------------------
# exact (brute force) search — the recall oracle, and the TPU-native
# "just use the MXU" fast path for small corpora
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("metric", "dims", "k"))
def _exact_batch(metric, dims, k, rows, norms, extras, slot_to_id, live, qv, qn, qe):
    def one(qv1, qn1, qe1):
        d = metric.built_distance(qv1, qn1, qe1, rows, norms, extras)
        d = jnp.where(live, d, _INF)
        neg, idx = jax.lax.top_k(-d, k)
        out_d = -neg
        ids = slot_to_id[idx]
        return ids, jnp.where(
            out_d < _INF, metric.normalized_distance(out_d, dims), jnp.float32(jnp.nan)
        )

    return jax.vmap(one)(qv, qn, qe)


def exact_batch(idx: DeviceIndex, qv, qn, qe, count: int):
    if idx.n_items == 0:
        b = np.asarray(qv).shape[0]
        return np.zeros((b, count), np.int64), np.full((b, count), np.nan, np.float32)
    live = idx.live
    k = min(count, idx.cap)
    ids, dists = _exact_batch(
        idx.metric,
        idx.dims,
        int(k),
        idx.rows,
        idx.norms,
        idx.extras,
        idx.slot_to_id,
        live,
        jnp.asarray(qv),
        jnp.asarray(qn),
        jnp.asarray(qe),
    )
    ids = np.asarray(ids).astype(np.int64)
    dists = np.asarray(dists)
    if k < count:
        pad_i = np.zeros((ids.shape[0], count - k), ids.dtype)
        pad_d = np.full((ids.shape[0], count - k), np.nan, dists.dtype)
        ids = np.concatenate([ids, pad_i], axis=1)
        dists = np.concatenate([dists, pad_d], axis=1)
    return ids, dists
