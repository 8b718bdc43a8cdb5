"""Vectorized best-first forest traversal + exact re-scoring.

The reference query engine pops a global max-heap seeded with every tree
root at +inf, descends split planes pushing children at
``min(parent, ∓margin)``, gathers descendants until `search_k` candidate
items are collected, then re-scores candidates exactly and keeps the
top-k (reference: src/reader.rs:317-401).

Here the same computation is two jitted device stages, vmapped over a
query batch:

1. **traverse** — the priority queue lives in fixed-shape arrays inside
   a `lax.while_loop`: argmax-pop (with the max-heap's (dist, node-id)
   tie order), one fused margin per split pop, and a cumsum-scatter
   append of CSR leaf windows for descendant pops (no per-pop sort).
2. **rescore** — one batched gather+distance sweep over the candidate
   buffers, chunked along the candidate axis to bound the gather
   temporary, then dedup by id and `lax.top_k` (replacing
   `median_based_top_k`, reference: src/reader.rs:607-640).

Traversal deviates from the reference in exactly one way: a pop budget
(`pmax`) bounds the loop for XLA's static shapes.  The budget is set
high enough to be unreachable for default `search_k` values, and when
filters or exhaustive search are requested it is raised to the total
node count so the traversal is never truncated.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from .device import DeviceIndex
from .models.forest import KIND_FREE, KIND_LEAF, KIND_SPLIT_NONE

_INF = jnp.float32(jnp.inf)
#: candidate-axis chunk for the re-score gather ([B, chunk, d] temporary)
_RESCORE_CHUNK = 512


def _row_sq(rows):
    """Per-row squared norm with f32 accumulation (rows may be held
    bf16 under ARROY_SERVING_DTYPE; XLA fuses the upcast into the
    reduction, so no f32 copy is materialized)."""
    r = rows.astype(jnp.float32)
    return jnp.sum(r * r, axis=1)


def _next_pow2(n: int) -> int:
    p = 1
    while p < max(n, 1):
        p *= 2
    return p


def pops_budget(
    idx: DeviceIndex, search_k: int, exhaustive: bool, selectivity: float = 1.0
) -> int:
    """Static pop bound for the traversal loop.

    Unfiltered, every non-empty leaf pop yields >= 1 candidate, so
    ``2*t + 2*search_k + 64`` is unreachable for default budgets.  With a
    candidate filter only a ``selectivity`` fraction of each popped leaf
    window counts toward search_k, so the budget scales by 1/selectivity
    (bounded by the whole forest) instead of always walking every node —
    the reference walks until its queue drains in that case
    (reference: src/reader.rs:345-360), but its per-pop cost is a roaring
    intersect while ours is a window compaction, so the budget is what
    keeps filtered QPS in the same decade as unfiltered.
    """
    t = max(len(idx.roots), 1)
    if exhaustive or search_k >= idx.n_items:
        return idx.n_nodes + t
    sel = min(max(float(selectivity), 1e-9), 1.0)
    budget = min(idx.n_nodes + t, 2 * t + int(np.ceil(2.0 * search_k / sel)) + 64)
    if sel >= 1.0 and idx.leaf_cum_np is not None:
        # unfiltered tight bound from the structure itself: every split
        # node is poppable at most once (one parent each), non-empty leaf
        # pops are bounded by the smallest-leaves-first worst case, and
        # empty/FREE rows each drain at most once
        tight = idx.n_splits + idx.max_leaf_pops(search_k) + idx.n_dead_pops + t + 8
        budget = min(budget, tight)
    return budget


# ---------------------------------------------------------------------------
# stage 1: traversal
# ---------------------------------------------------------------------------


def _expand_one_log(log1, leaf_off, leaf_cnt, leaf_items, cap):
    """One query's leaf log -> `cap` candidate slots (-1 padded).

    Run-length decode of the CSR windows the traversal popped, as two
    tiny scatters + cumsums: row j of the log covers output positions
    [ends[j-1], ends[j]), so scattering each row's (end-delta, CSR-offset
    delta) at its boundary position and prefix-summing yields, for every
    output position c, the covering row's output start and CSR offset —
    O(cap) work.  (The previous formulation ran searchsorted/dense
    compares of [cap] positions against the [l_cap] end table; at
    search_k=32k x l_cap=3.7k it materialized ~30 GB of compare traffic
    and cost 1.4 s/batch on chip — 15x the traversal it postprocesses.)
    Shared by the XLA and Pallas traversal paths so their outputs stay
    bit-identical by construction."""
    l_cap = log1.shape[0]
    cap_iota = jnp.arange(cap, dtype=jnp.int32)
    l_iota = jnp.arange(l_cap, dtype=jnp.int32)
    n_leaf = log1[l_cap - 1]  # running count kept in the tail slot
    live_l = l_iota < n_leaf  # entries >= n_leaf are stale
    counts = jnp.where(live_l, leaf_cnt[log1], 0)  # [l_cap] gather (tiny)
    offs_l = jnp.where(live_l, leaf_off[log1], 0)  # [l_cap] gather (tiny)
    ends = jnp.cumsum(counts)
    begins = ends - counts  # row j begins at output position ends[j-1]

    # start_at_c = ends[sel-1] (output start of the covering row):
    # scatter each row's end-delta at its end position, inclusive-cumsum
    prev_end = jnp.concatenate([jnp.zeros(1, ends.dtype), ends[:-1]])
    d_end = ends - prev_end
    acc = jnp.zeros(cap + 1, jnp.int32)
    acc = acc.at[jnp.minimum(ends, cap)].add(d_end)
    start = jnp.cumsum(acc[:cap])
    # off_at_c = offs[sel]: scatter each row's CSR-offset delta at the
    # position where the row BEGINS, inclusive-cumsum
    prev_off = jnp.concatenate([jnp.zeros(1, offs_l.dtype), offs_l[:-1]])
    d_off = jnp.where(live_l, offs_l - prev_off, 0)
    acc2 = jnp.zeros(cap + 1, jnp.int32)
    acc2 = acc2.at[jnp.minimum(begins, cap)].add(d_off)
    off = jnp.cumsum(acc2[:cap])

    src = off + (cap_iota - start)
    total = jnp.minimum(ends[l_cap - 1], cap)
    vals = leaf_items[jnp.clip(src, 0, leaf_items.shape[0] - 1)]
    return jnp.where(cap_iota < total, vals, -1)


def _traverse_impl(
    metric,
    search_k,
    pmax,
    w,
    has_filter,
    node_table,
    normals,
    aux,
    leaf_off,
    leaf_cnt,
    leaf_items,
    roots,
    qv,
    qf,
    filter_words,
    search_k_dyn,
    q_cap=None,
    l_cap=None,
    expand=True,
):
    """Collect up to `search_k` candidate slots per query (-1 padded).

    ``q_cap``/``l_cap`` are optional tighter capacities computed by the
    caller from the index structure (split count / leaf-size
    distribution).  Capacity never changes results, only array widths —
    the defaults are the always-safe worst case.  ``expand=False``
    returns the raw [l_cap] leaf log instead of expanded candidate
    slots (unfiltered path only) — the two-tier engine expands once
    after selecting between its optimistic and fallback logs, since the
    expansion's [cap, l_cap] compare matrices are the traversal's
    biggest buffers."""
    t = roots.shape[0]
    s_rows = normals.shape[0]
    if q_cap is None:
        q_cap = t + pmax
    cap = search_k + w  # slot `cap` is the trash lane for masked writes

    q_iota = jnp.arange(q_cap, dtype=jnp.int32)
    w_iota = jnp.arange(w, dtype=jnp.int32)
    cap_iota = jnp.arange(cap, dtype=jnp.int32)
    # each non-empty leaf pop contributes >= 1 candidate, so at most
    # min(search_k, pmax) leaf pops are ever logged
    if l_cap is None:
        l_cap = min(search_k, pmax) + 1
    l_iota = jnp.arange(l_cap, dtype=jnp.int32)

    # every query-vs-split margin up front: one MXU matmul, so the pop
    # loop below never touches the d-wide normals (an in-loop [d] gather
    # + dot was ~100x the rest of the body)
    margins_all = metric.margin_matrix(normals, aux, qv, qf)  # [B, S]

    def one(qv1, qf1, margins1):
        pq_dist = jnp.where(q_iota < t, _INF, -_INF)
        pq_node = jnp.where(q_iota < t, roots[jnp.minimum(q_iota, t - 1)], 0)

        def cond(st):
            _, _, _, _, n_cand, pops = st
            return (n_cand < search_k_dyn) & (pops < pmax)

        # NOTE the loop body never touches the candidate buffer and never
        # scatters: a leaf pop only logs its CSR row (a [l_cap] select) and
        # bumps the count; the actual item windows are expanded in one
        # vectorized gather after the loop.  TPU scatters and per-iteration
        # [cap]-wide rewrites both cost milliseconds per pop.
        def body(st):
            pq_dist, pq_node, n_pushed, leaf_log, n_cand, pops = st
            n_leaf = leaf_log[l_cap - 1]  # running count kept in the tail slot
            m = jnp.max(pq_dist)
            alive = m > -_INF
            # max-heap pop: max dist, ties broken by larger node id
            # (BinaryHeap<(OrderedFloat, NodeId)>, reference src/reader.rs:342)
            mask = pq_dist == m
            nid = jnp.max(jnp.where(mask, pq_node, -1))
            i = jnp.argmax(mask & (pq_node == nid))
            row = node_table[nid]  # one gather: kind,left,right,ptr,off,cnt
            knd = row[0]
            p = row[3]
            is_leaf = alive & (knd == KIND_LEAF)
            # FREE rows (deleted nodes, sharding padding) pop as no-ops so
            # a dangling id drains the queue instead of spinning on it
            is_split = alive & ~is_leaf & (knd != KIND_FREE)

            # --- leaf lane: count (and log) the window ---
            cnt = jnp.where(is_leaf, row[5], 0)
            log_it = is_leaf & (cnt > 0) & (n_leaf < l_cap - 1)
            leaf_log = jnp.where(log_it & (l_iota == n_leaf), p, leaf_log)
            leaf_log = jnp.where(
                l_iota == l_cap - 1, n_leaf + log_it.astype(jnp.int32), leaf_log
            )
            n_cand = n_cand + cnt

            # --- split lane: precomputed margin + two pushes ---
            margin = jnp.where(
                knd == KIND_SPLIT_NONE, 0.0, margins1[jnp.minimum(p, s_rows - 1)]
            )
            dl = jnp.minimum(m, -margin)
            dr = jnp.minimum(m, margin)
            at_i = q_iota == i
            at_push = q_iota == n_pushed
            pq_dist = jnp.where(at_i, jnp.where(is_split, dl, -_INF), pq_dist)
            pq_node = jnp.where(at_i & is_split, row[1], pq_node)
            pq_dist = jnp.where(at_push & is_split, dr, pq_dist)
            pq_node = jnp.where(at_push & is_split, row[2], pq_node)
            n_pushed = n_pushed + jnp.where(is_split, 1, 0)
            pops = jnp.where(alive, pops + 1, jnp.int32(pmax))
            return (pq_dist, pq_node, n_pushed, leaf_log, n_cand, pops)

        log0 = jnp.zeros(l_cap, jnp.int32)
        _, _, _, leaf_log, n_cand, pops = jax.lax.while_loop(
            cond,
            body,
            (pq_dist, pq_node, jnp.int32(t), log0, jnp.int32(0), jnp.int32(0)),
        )

        if not expand:
            return leaf_log, pops, n_cand
        # ---- expansion: leaf log -> candidate slots, one big gather ----
        return _expand_one_log(leaf_log, leaf_off, leaf_cnt, leaf_items, cap), pops, n_cand

    def one_filtered(qv1, qf1, margins1):
        """Filtered traversal: windows must be filter-compacted inside the
        loop (the accepted items of a leaf are not contiguous in the CSR, and
        only they count toward search_k — reference src/reader.rs:354-360).
        Slower per pop than the log-based path; filters trade speed for
        selectivity exactly like the reference."""
        pq_dist = jnp.where(q_iota < t, _INF, -_INF)
        pq_node = jnp.where(q_iota < t, roots[jnp.minimum(q_iota, t - 1)], 0)

        def cond(st):
            _, _, _, _, n_cand, pops = st
            return (n_cand < search_k_dyn) & (pops < pmax)

        def body(st):
            pq_dist, pq_node, n_pushed, cand, n_cand, pops = st
            m = jnp.max(pq_dist)
            alive = m > -_INF
            mask = pq_dist == m
            nid = jnp.max(jnp.where(mask, pq_node, -1))
            i = jnp.argmax(mask & (pq_node == nid))
            row = node_table[nid]
            knd = row[0]
            p = row[3]
            is_leaf = alive & (knd == KIND_LEAF)
            # FREE rows (deleted nodes, sharding padding) pop as no-ops so
            # a dangling id drains the queue instead of spinning on it
            is_split = alive & ~is_leaf & (knd != KIND_FREE)

            off = row[4]
            cnt = jnp.where(is_leaf, row[5], 0)
            win = jax.lax.dynamic_slice(leaf_items, (off,), (w,))
            slot_c = jnp.maximum(win, 0)
            word = filter_words[slot_c >> 5]
            bit = (word >> (slot_c & 31).astype(jnp.uint32)) & jnp.uint32(1)
            valid = (w_iota < cnt) & (bit == 1)
            csum = jnp.cumsum(valid.astype(jnp.int32))
            n_valid = jnp.where(is_leaf, csum[w - 1], 0)
            srcw = jnp.searchsorted(csum, w_iota + 1, side="left").astype(jnp.int32)
            compacted = win[jnp.minimum(srcw, w - 1)]
            idx_rel = cap_iota - n_cand
            in_win = (idx_rel >= 0) & (idx_rel < n_valid)
            cand = jnp.where(in_win, compacted[jnp.clip(idx_rel, 0, w - 1)], cand)
            n_cand = n_cand + n_valid

            margin = jnp.where(
                knd == KIND_SPLIT_NONE, 0.0, margins1[jnp.minimum(p, s_rows - 1)]
            )
            dl = jnp.minimum(m, -margin)
            dr = jnp.minimum(m, margin)
            at_i = q_iota == i
            at_push = q_iota == n_pushed
            pq_dist = jnp.where(at_i, jnp.where(is_split, dl, -_INF), pq_dist)
            pq_node = jnp.where(at_i & is_split, row[1], pq_node)
            pq_dist = jnp.where(at_push & is_split, dr, pq_dist)
            pq_node = jnp.where(at_push & is_split, row[2], pq_node)
            n_pushed = n_pushed + jnp.where(is_split, 1, 0)
            pops = jnp.where(alive, pops + 1, jnp.int32(pmax))
            return (pq_dist, pq_node, n_pushed, cand, n_cand, pops)

        cand0 = jnp.full(cap, -1, jnp.int32)
        _, _, _, cand, n_cand, pops = jax.lax.while_loop(
            cond,
            body,
            (pq_dist, pq_node, jnp.int32(t), cand0, jnp.int32(0), jnp.int32(0)),
        )
        return cand, pops, n_cand

    return jax.vmap(one_filtered if has_filter else one)(qv, qf, margins_all)


_traverse_batch = functools.partial(
    jax.jit,
    static_argnames=(
        "metric", "search_k", "pmax", "w", "has_filter", "q_cap", "l_cap",
        "expand",
    ),
)(_traverse_impl)


def _traverse_multipop_impl(
    metric,
    search_k,
    pmax,
    w,
    P,
    node_table,
    normals,
    aux,
    leaf_off,
    leaf_cnt,
    leaf_items,
    roots,
    qv,
    qf,
    search_k_dyn,
    q_cap=None,
    l_cap=None,
    expand=True,
):
    """Multi-pop traversal: pop the best `P` queue entries per iteration.

    A documented deviation from the reference's strict best-first order
    (reference: src/reader.rs:345-372): the queue is viewed as a [P, L]
    grid of P segments and each iteration pops the argmax of EVERY
    segment — the best P entries *per segment*, which approximates the
    global top-P (the global max is always among them; an entry skipped
    this iteration stays queued).  Queue slots are assigned round-robin
    across segments (logical slot k lives at physical lane
    (k mod P)·L + k div P) so pushes disperse instead of piling into one
    segment.  The payoff is breaking the loop's serial-latency bound: a
    query at 1M+ needs thousands of pops and each iteration costs ~the
    same whether it pops 1 or P entries, because every update below is
    a single queue-wide mask or a tiny [P]-table gather — no sorts, no
    [q_cap, P] one-hot matrices, and L stays the minor (vectorized)
    axis.  Recall impact is measured, small, and compensated by the
    search_k knob itself (PARITY.md deviation 11; `multipop=1` keeps
    the bit-exact reference order).

    Unfiltered only — filtered searches route to the exact engine.
    """
    t = roots.shape[0]
    s_rows = normals.shape[0]
    if q_cap is None:
        q_cap = t + pmax
    q_cap = max(q_cap, 2 * P)
    q_cap = -(-q_cap // P) * P  # pad to a multiple of P for the [P, L] view
    L = q_cap // P
    cap = search_k + w
    if l_cap is None:
        l_cap = min(search_k, pmax) + 1

    q_iota = jnp.arange(q_cap, dtype=jnp.int32)
    l_iota = jnp.arange(l_cap, dtype=jnp.int32)
    l_grid = jnp.arange(L, dtype=jnp.int32)
    p_iota = jnp.arange(P, dtype=jnp.int32)
    # physical lane j = p*L + l holds logical slot k = l*P + p (constants)
    k_of_j = (q_iota % L) * P + q_iota // L  # [q_cap]
    margins_all = metric.margin_matrix(normals, aux, qv, qf)  # [B, S]

    def one(qv1, qf1, margins1):
        pq_dist = jnp.where(k_of_j < t, _INF, -_INF)
        pq_node = jnp.where(k_of_j < t, roots[jnp.minimum(k_of_j, t - 1)], 0)

        def cond(st):
            _, _, _, _, n_cand, pops = st
            return (n_cand < search_k_dyn) & (pops < pmax)

        def body(st):
            pq_dist, pq_node, n_pushed, leaf_log, n_cand, pops = st
            n_leaf = leaf_log[l_cap - 1]

            # --- segment-max pop: one minor-axis reduction over [P, L] ---
            grid = pq_dist.reshape(P, L)
            vals = jnp.max(grid, axis=1)  # [P]
            arg = jnp.argmax(grid, axis=1)  # [P] column of each segment's max
            idxs = p_iota * L + arg  # physical lane of each pop
            alive = vals > -_INF
            nids = pq_node[idxs]  # [P] tiny gather
            rows = node_table[nids]  # [P, 8]
            knd = rows[:, 0]
            p = rows[:, 3]
            is_leaf = alive & (knd == KIND_LEAF)
            is_split = alive & ~is_leaf & (knd != KIND_FREE)

            # --- leaf lanes: log each non-empty window (contiguous slots
            # from n_leaf; rank -> lane via a tiny [P] searchsorted table)
            cnts = jnp.where(is_leaf, rows[:, 5], 0)
            log_lane = is_leaf & (cnts > 0)
            csum_log = jnp.cumsum(log_lane.astype(jnp.int32))
            n_log = csum_log[P - 1]
            rank_of = jnp.searchsorted(
                csum_log, p_iota + 1, side="left"
            ).astype(jnp.int32)  # [P] lane of rank r
            l_rel = l_iota - n_leaf
            in_log = (l_rel >= 0) & (l_rel < n_log) & (l_iota < l_cap - 1)
            lane_l = rank_of[jnp.clip(l_rel, 0, P - 1)]
            leaf_log = jnp.where(in_log, p[lane_l], leaf_log)
            n_leaf2 = jnp.minimum(n_leaf + n_log, l_cap - 1)
            leaf_log = jnp.where(l_iota == l_cap - 1, n_leaf2, leaf_log)
            n_cand = n_cand + jnp.sum(cnts)

            # --- split lanes: one margin gather for all P pops ---
            margin = jnp.where(
                knd == KIND_SPLIT_NONE, 0.0, margins1[jnp.minimum(p, s_rows - 1)]
            )
            dl = jnp.minimum(vals, -margin)
            dr = jnp.minimum(vals, margin)
            # popped lanes: split -> left child at dl, else drain to -inf
            pop_val = jnp.where(is_split, dl, -_INF)  # [P]
            pop_mask = l_grid[None, :] == arg[:, None]  # [P, L] single mask
            pq_dist = jnp.where(pop_mask, pop_val[:, None], grid).reshape(q_cap)
            node_grid = pq_node.reshape(P, L)
            # non-split pops keep their node value (their dist is -inf,
            # so the lane is dead and the value never read)
            pop_node = jnp.where(is_split, rows[:, 1], nids)  # [P]
            pq_node = jnp.where(pop_mask, pop_node[:, None], node_grid).reshape(q_cap)

            # pushes: right children at contiguous LOGICAL slots from
            # n_pushed (round-robin across segments via k_of_j)
            csum_s = jnp.cumsum(is_split.astype(jnp.int32))
            ns = csum_s[P - 1]
            rank_s = jnp.searchsorted(csum_s, p_iota + 1, side="left").astype(
                jnp.int32
            )  # [P] lane of the r-th split
            j_rel = k_of_j - n_pushed
            in_push = (j_rel >= 0) & (j_rel < ns)
            lane_p = rank_s[jnp.clip(j_rel, 0, P - 1)]  # [q_cap] from [P] table
            pq_dist = jnp.where(in_push, dr[lane_p], pq_dist)
            pq_node = jnp.where(in_push, rows[lane_p, 2], pq_node)
            n_pushed = n_pushed + ns

            n_alive = jnp.sum(alive.astype(jnp.int32))
            pops = jnp.where(n_alive > 0, pops + n_alive, jnp.int32(pmax))
            return (pq_dist, pq_node, n_pushed, leaf_log, n_cand, pops)

        log0 = jnp.zeros(l_cap, jnp.int32)
        _, _, _, leaf_log, n_cand, pops = jax.lax.while_loop(
            cond,
            body,
            (pq_dist, pq_node, jnp.int32(t), log0, jnp.int32(0), jnp.int32(0)),
        )
        if not expand:
            return leaf_log, pops, n_cand
        return (
            _expand_one_log(leaf_log, leaf_off, leaf_cnt, leaf_items, cap),
            pops,
            n_cand,
        )

    return jax.vmap(one)(qv, qf, margins_all)


_traverse_multipop = functools.partial(
    jax.jit,
    static_argnames=(
        "metric", "search_k", "pmax", "w", "P", "q_cap", "l_cap", "expand",
    ),
)(_traverse_multipop_impl)

#: multipop="auto" resolution: ALWAYS strict best-first.  The P-wide
#: variant was measured a large regression on chip at every scale tried
#: (1.18M x 100 sk=20000: P=16 serves 118 qps vs P=1's 1,309 —
#: results/forest_probe_r03.log; the [P, L] segment-grid pop scans P
#: lanes of selects per iteration and saves too few iterations to pay
#: for them).  The knob stays for explicit experimentation
#: (ARROY_MULTIPOP=<P> / multipop=P); the serving answer to the pop
#: loop's serial latency is the leaf-probe engine (probe.py), not
#: wider pops.
_MULTIPOP_P = 16


def resolve_multipop(n_items: int, want="auto") -> int:
    if want is None or want == "auto":
        env = os.environ.get("ARROY_MULTIPOP")
        if env is not None:
            return max(int(env), 1)
        return 1
    return max(int(want), 1)


# ---------------------------------------------------------------------------
# stage 2: re-score + top-k
# ---------------------------------------------------------------------------


def _rescore_impl(
    metric, dims, k, rows, norms, extras, slot_to_id, cand, qv, qn, qe, normalize=True
):
    b, cap = cand.shape
    valid0 = cand >= 0
    ids = slot_to_id[jnp.maximum(cand, 0)]  # uint32
    # sort valid candidates first, by ascending id (the reference's
    # sort_unstable + dedup, src/reader.rs:378-379)
    # lexsort: valid-first is the primary key so that a genuine id of
    # u32::MAX cannot interleave with invalid padding and dodge the
    # adjacent-duplicate check
    order = jnp.lexsort((ids, ~valid0))
    ids_s = jnp.take_along_axis(ids, order, axis=1)
    valid_s = jnp.take_along_axis(valid0, order, axis=1)
    slots_s = jnp.take_along_axis(cand, order, axis=1)
    dup = jnp.concatenate(
        [jnp.zeros((b, 1), bool), (ids_s[:, 1:] == ids_s[:, :-1]) & valid_s[:, :-1]],
        axis=1,
    )
    invalid = ~valid_s | dup

    # chunked distance sweep along the candidate axis
    n_chunks = max(cap // _RESCORE_CHUNK, 1)
    pad = n_chunks * _RESCORE_CHUNK
    if pad < cap:
        n_chunks += 1
        pad = n_chunks * _RESCORE_CHUNK
    slots_p = jnp.concatenate(
        [jnp.maximum(slots_s, 0), jnp.zeros((b, pad - cap), jnp.int32)], axis=1
    )
    chunks = slots_p.reshape(b, n_chunks, _RESCORE_CHUNK).transpose(1, 0, 2)

    def chunk_fn(slots_c):
        x = rows[slots_c]  # [b, C, sd]
        xn = norms[slots_c]
        xe = extras[slots_c]
        return metric.built_distance(qv[:, None, :], qn[:, None], qe[:, None], x, xn, xe)

    d = jax.lax.map(chunk_fn, chunks)  # [n_chunks, b, C]
    d = d.transpose(1, 0, 2).reshape(b, pad)[:, :cap]
    d = jnp.where(invalid, _INF, d)

    neg, top_idx = jax.lax.top_k(-d, k)
    out_d = -neg
    out_ids = jnp.take_along_axis(ids_s, top_idx, axis=1)
    if not normalize:
        return out_ids, out_d  # raw built distances, +inf where invalid
    out_d = jnp.where(
        out_d < _INF, metric.normalized_distance(out_d, dims), jnp.float32(jnp.nan)
    )
    return out_ids, out_d


_rescore_batch = functools.partial(
    jax.jit, static_argnames=("metric", "dims", "k", "normalize")
)(_rescore_impl)


def _rescore_matmul_impl(
    metric, dims, k, rows, norms, extras, slot_to_id, cand, qv, qn, qe,
    normalize=True,
):
    # (no `live` mask needed: candidates come from built leaf CSRs, which
    # only ever contain live slots; padding is handled via `invalid`)
    """MXU re-score: one [B,d]x[d,M] matmul + per-candidate value gather.

    When B*cap >= M every item row is cheaper to stream once through the
    MXU than to gather per candidate.  Ranking-equivalent to the exact
    re-score; euclidean distances carry matmul-cancellation noise near
    zero (same caveat as `_exact_matmul`).  f32 dot-decomposable metrics
    only — callers fall back to `_rescore_impl` otherwise.
    """
    b, cap = cand.shape
    m = rows.shape[0]
    valid0 = cand >= 0
    slots_c = jnp.maximum(cand, 0)
    # dedup for free: scatter the candidate slots into a [B, M] mask and
    # select on the full distance matrix — each item owns one column, so
    # duplicates collapse without the sort+adjacent-compare the gather
    # re-score needs (an XLA sort of [B, cap] keys was ~2/3 of the whole
    # re-score at search_k=8k)
    mask = jnp.zeros((b, m), jnp.bool_)
    mask = mask.at[jnp.arange(b, dtype=jnp.int32)[:, None], slots_c].max(valid0)

    dots = jax.lax.dot_general(
        qv.astype(rows.dtype), rows, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, M]
    if metric.name == "euclidean":
        x2 = _row_sq(rows)
        q2 = jnp.sum(qv * qv, axis=1)
        d = jnp.maximum(x2[None, :] - 2.0 * dots + q2[:, None], 0.0)
    elif metric.name == "cosine":
        pnqn = norms[None, :] * qn[:, None]
        eps = jnp.float32(np.finfo(np.float32).eps)
        cos = jnp.clip(dots / jnp.where(pnqn > eps, pnqn, 1.0), -1.0, 1.0)
        d = jnp.where(pnqn > eps, (1.0 - cos) / 2.0, 0.0)
    else:  # dot-product
        d = -dots
    d = jnp.where(mask, d, _INF)
    neg, top_idx = jax.lax.top_k(-d, k)
    out_d = -neg
    out_ids = slot_to_id[top_idx]
    if not normalize:
        return out_ids, out_d
    out_d = jnp.where(
        out_d < _INF, metric.normalized_distance(out_d, dims), jnp.float32(jnp.nan)
    )
    return out_ids, out_d


_rescore_matmul = functools.partial(
    jax.jit, static_argnames=("metric", "dims", "k", "normalize")
)(_rescore_matmul_impl)


def _rescore_matmul_scan_impl(
    metric, dims, k, chunk, slot_to_id, rows_p, aux_p, cand, qv, qn, qe,
    normalize=True,
):
    """Chunked MXU re-score for corpora past the [B, M] matrix budget.

    Same candidate-mask semantics as `_rescore_matmul` (scatter → dedup
    for free) but the distance matrix is streamed [B, chunk] at a time
    with a carried top-c, so only the bool mask (1 byte/item/query) is
    ever materialized at full width.  At 1M x 768, B=256, sk=20k the
    per-candidate gather re-score measured 563 ms/batch (gathers run
    far below HBM bandwidth); streaming the whole corpus through the
    MXU costs ~the exact engine's 25-30 ms.

    The carried winners (c = 8k like the bf16 exact engine's select
    stage) get a final per-pair exact re-score: matmul distances carry
    f32 cancellation noise that measurably dented recall on tie-heavy
    corpora (0.994 → 0.966 at 1.18M x 100 cosine, sk=50k) — the exact
    pass restores the gather re-score's values at negligible cost.
    """
    b, cap = cand.shape
    m = rows_p.shape[0]
    valid0 = cand >= 0
    slots_c = jnp.maximum(cand, 0)
    mask = jnp.zeros((b, m), jnp.bool_)
    mask = mask.at[jnp.arange(b, dtype=jnp.int32)[:, None], slots_c].max(valid0)
    q2 = jnp.sum(qv * qv, axis=1)
    n_chunks = m // chunk
    kk = min(max(_next_pow2(8 * k), 64), chunk)

    def body(_, i):
        # stacked per-chunk winners + one final merge (no carried merge
        # on the scan's critical path; same restructure as _exact_scan)
        base = i * chunk
        rc = jax.lax.dynamic_slice(rows_p, (base, 0), (chunk, rows_p.shape[1]))
        ac = jax.lax.dynamic_slice(aux_p, (base,), (chunk,))
        dots = jax.lax.dot_general(
            qv.astype(rc.dtype), rc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if metric.name == "euclidean":
            d = jnp.maximum(ac[None, :] - 2.0 * dots + q2[:, None], 0.0)
        elif metric.name == "cosine":
            pnqn = ac[None, :] * qn[:, None]
            eps = jnp.float32(np.finfo(np.float32).eps)
            cos = jnp.clip(dots / jnp.where(pnqn > eps, pnqn, 1.0), -1.0, 1.0)
            d = jnp.where(pnqn > eps, (1.0 - cos) / 2.0, 0.0)
        else:  # dot-product
            d = -dots
        mc = jax.lax.dynamic_slice(mask, (0, base), (b, chunk))
        d = jnp.where(mc, d, _INF)
        # approx_max_k, not top_k: a [B, chunk] sort per chunk cost
        # ~250 ms/batch at 1.18M on chip; the tiled partial reduction's
        # rare misses sit at rank ~kk >> k and the exact final pass
        # re-ranks the winners anyway
        neg, idx_c = jax.lax.approx_max_k(-d, kk, recall_target=0.99)
        return None, (-neg, idx_c + base)

    _, (d_all, idx_all) = jax.lax.scan(
        body, None, jnp.arange(n_chunks, dtype=jnp.int32)
    )  # [n_chunks, B, kk]
    all_d = d_all.transpose(1, 0, 2).reshape(b, n_chunks * kk)
    all_i = idx_all.transpose(1, 0, 2).reshape(b, n_chunks * kk)
    negs, pos = jax.lax.top_k(-all_d, kk)
    best_d = -negs
    best_i = jnp.take_along_axis(all_i, pos, axis=1)
    # final exact pass over the c winners (per-pair reference formulas)
    x = rows_p[best_i]
    xn = aux_p[best_i] if metric.name == "cosine" else jnp.zeros_like(best_d)
    d_exact = metric.built_distance(
        qv[:, None, :], qn[:, None], qe[:, None], x, xn, jnp.zeros_like(best_d)
    )
    d_exact = jnp.where(best_d < _INF, d_exact, _INF)
    kf = min(k, kk)
    neg, pos = jax.lax.top_k(-d_exact, kf)
    out_d = -neg
    cand_f = jnp.take_along_axis(best_i, pos, axis=1)
    out_ids = slot_to_id[jnp.minimum(cand_f, slot_to_id.shape[0] - 1)]
    if normalize:
        out_d = jnp.where(
            out_d < _INF,
            metric.normalized_distance(out_d, dims),
            jnp.float32(jnp.nan),
        )
    if kf < k:
        pad = k - kf
        out_ids = jnp.concatenate(
            [out_ids, jnp.zeros((b, pad), out_ids.dtype)], axis=1
        )
        out_d = jnp.concatenate(
            [out_d, jnp.full((b, pad), jnp.nan, jnp.float32)], axis=1
        )
    return out_ids, out_d


_rescore_matmul_scan = functools.partial(
    jax.jit, static_argnames=("metric", "dims", "k", "chunk", "normalize")
)(_rescore_matmul_scan_impl)

#: corpora larger than this skip the matmul re-score (the [B, M] dot
#: matrix would dominate memory)
_MATMUL_RESCORE_MAX_ITEMS = 300_000

#: full-width candidate-mask budget for the chunked matmul re-score
#: (1 byte per item per query)
_RESCORE_MASK_BYTES = 512 << 20

#: [B, M] f32 budget above which the re-score must stream chunks
_RESCORE_MATRIX_BYTES = 1 << 30

#: optimistic pop budget for the two-tier traversal, in units of
#: EXPECTED leaf pops (search_k / mean leaf size): the mean observed
#: split-pops-per-needed-leaf-pop is ~12 on clustered corpora; x32 plus
#: slack makes the device-side fallback to the full budget rare
_SMALL_POPS_MULT = 32
_SMALL_POPS_PAD = 256


def _two_tier_impl(
    metric, dims, k, sk, pmax_small, pmax, max_leaf, q_cap_small, q_cap,
    l_cap, rmode, chunk, P,
    node_table, normals, aux, leaf_off, leaf_cnt, leaf_items, roots,
    filter_words, rows, norms, extras, slot_to_id, rows_p, aux_p,
    qv, qn, qe, qf, sk_dyn,
):
    """Optimistic small-queue traversal with a device-side full-budget
    fallback (see make_search_fn) — one compiled program so the lax.cond
    branches trace once per shape, and every index array arrives as an
    argument (a closure capture would bake GBs of constants into the
    executable)."""

    def trav(pm, qc, use_p):
        # multi-pop only on the optimistic (small-queue) tier: its
        # [q_cap, P] one-hot update matrices scale with queue width, and
        # at full budget (hundreds of thousands of lanes at 1M+) they
        # would dominate memory/bandwidth — the rare fallback stays
        # single-pop instead
        if use_p and P > 1:
            return _traverse_multipop_impl(
                metric, sk, pm, max_leaf, P, node_table, normals, aux,
                leaf_off, leaf_cnt, leaf_items, roots, qv, qf, sk_dyn,
                q_cap=qc, l_cap=l_cap, expand=False,
            )
        return _traverse_impl(
            metric, sk, pm, max_leaf, False, node_table, normals, aux,
            leaf_off, leaf_cnt, leaf_items, roots, qv, qf, filter_words,
            sk_dyn, q_cap=qc, l_cap=l_cap, expand=False,
        )

    def do_rescore(cand):
        if rmode == "matmul_scan":
            return _rescore_matmul_scan_impl(
                metric, dims, k, chunk, slot_to_id, rows_p, aux_p, cand,
                qv, qn, qe,
            )
        if rmode == "matmul":
            return _rescore_matmul_impl(
                metric, dims, k, rows, norms, extras, slot_to_id, cand,
                qv, qn, qe,
            )
        return _rescore_impl(
            metric, dims, k, rows, norms, extras, slot_to_id, cand, qv, qn, qe
        )

    log_s, pops_s, ncand_s = trav(pmax_small, q_cap_small, True)
    truncated = jnp.any((pops_s >= pmax_small) & (ncand_s < sk_dyn))
    # the cond selects between the tiny [B, l_cap] leaf logs only; the
    # expansion + re-score (the big buffers) run ONCE on the winner
    log = jax.lax.cond(
        truncated,
        lambda _: trav(pmax, q_cap, False)[0],
        lambda _: log_s,
        None,
    )
    cand = jax.vmap(
        lambda lg: _expand_one_log(lg, leaf_off, leaf_cnt, leaf_items, sk + max_leaf)
    )(log)
    return do_rescore(cand)


_two_tier = functools.partial(
    jax.jit,
    static_argnames=(
        "metric", "dims", "k", "sk", "pmax_small", "pmax", "max_leaf",
        "q_cap_small", "q_cap", "l_cap", "rmode", "chunk", "P",
    ),
)(_two_tier_impl)


def rescore_mode(metric, b: int, cap: int, m: int, want: str = "auto") -> str:
    if want == "exact" or metric.binary or metric.name == "manhattan":
        return "exact"
    if want == "matmul":
        return "matmul"
    if b * cap < m:
        # candidate volume below the corpus: the per-candidate gather
        # moves fewer bytes than streaming every item through the MXU
        return "exact"
    if b * m * 4 <= _RESCORE_MATRIX_BYTES and m <= _MATMUL_RESCORE_MAX_ITEMS:
        return "matmul"
    if b * m <= _RESCORE_MASK_BYTES:
        # past the [B, M] matrix budget: stream the matrix in chunks,
        # materializing only the 1-byte candidate mask at full width
        return "matmul_scan"
    return "exact"


# ---------------------------------------------------------------------------
# serving handle: a bound device-to-device search function
# ---------------------------------------------------------------------------


#: forest-engine traversal="auto" serves the leaf-probe engine at and
#: above this corpus size (the scale class where the serial pop loop
#: collapses on chip — results/probe_sweep_r03.log; below it the
#: classic traversal is competitive and table duplication is unpaid)
_PROBE_MIN_ITEMS = 262_144


def traversal_mode(idx: DeviceIndex, has_filter: bool, pmax: int, search_k: int, want: str = "auto") -> str:
    """Resolve the traversal engine: the XLA while-loop pop walk or the
    leaf-probe engine (probe.py).

    ``ARROY_TRAVERSAL=probe|xla`` resolves ``auto`` only — an explicit
    argument always wins (so A/B reference arms can't be flipped by a
    leaked env var).  Filtered searches and unsupported metrics always
    use XLA.  (A VMEM-resident Pallas pop-loop kernel existed through
    round 3, opt-in and never serving; the probe engine is the answer
    to the serial pop loop on TPU, so the kernel was removed rather
    than measured — see results/probe_sweep_r03.log for the policy
    evidence.)
    """
    import os

    want = (want or "auto").lower()
    if want == "auto":
        want = os.environ.get("ARROY_TRAVERSAL", "auto").lower()
    if want == "auto" and idx.n_items >= _PROBE_MIN_ITEMS:
        # measured policy (results/probe_sweep_r03.log): at 1.18M the
        # leaf-probe engine serves 4,505 qps at recall 0.958 where the
        # strict traversal serves 131 at equal recall; past the scale
        # where the pop loop collapses, auto serves the probe engine
        # (traversal="xla" keeps the bit-exact reference order)
        want = "probe"
    if want == "probe":
        from . import probe as _probe

        # the leaf-probe engine (probe.py) replaces the pop loop with
        # centroid-ranked block probing; since r5 it serves filtered
        # queries (block-slot masking, budget scaled by selectivity)
        # and binary-quantized metrics (native packed-word blocks) too
        if _probe.supports(idx.metric):
            return "probe"
    return "xla"


def make_search_fn(
    idx: DeviceIndex,
    count: int,
    search_k: int,
    filter_slots: np.ndarray | None = None,
    rescore: str = "exact",
    traversal: str = "auto",
    multipop="auto",
    state=None,
    probe_trees="auto",
    probe_block="auto",
    probe_dtype="auto",
):
    """Return a device-resident search callable (the serving hot path).

    The returned ``fn(qv, qn, qe, qf) -> (ids_u32, dists)`` takes device
    arrays and returns device arrays — no host synchronization, so calls
    pipeline back-to-back.  This is how a production server should drive
    the engine; the ``QueryBuilder`` path adds host conversions per call.

    ``multipop``: pops per traversal iteration.  1 = the reference's
    strict best-first order; P>1 batches P pops per step with a
    slightly different candidate stream — measured a regression on chip
    at every scale (see `resolve_multipop`), so "auto" = 1 always
    (ARROY_MULTIPOP overrides for experiments).
    """
    if idx.n_items == 0 or not idx.roots:
        def empty_fn(qv, qn, qe, qf):
            b = qv.shape[0]
            return (
                jnp.zeros((b, max(count, 1)), jnp.uint32),
                jnp.full((b, max(count, 1)), jnp.nan, jnp.float32),
            )

        return empty_fn

    has_filter = filter_slots is not None
    csr_total = max(int(idx.leaf_items.shape[0]) - idx.max_leaf, 1)
    sk_exact = min(max(search_k, count), csr_total)

    # NOTE: filtered queries here keep TRAVERSAL semantics (the
    # reference's roaring-∩-at-leaves contract incl. the search_k budget,
    # src/reader.rs:345-360) — this is the `nns()` path.  The "filters →
    # masked exact matmul at any size" routing lives one layer up, in
    # `Searcher(engine="auto")` (reader.py), which is the documented
    # auto-policy layer; PARITY.md deviation 9.  The one shortcut below
    # (filter pool ≤ search_k) is semantically EQUAL to the traversal:
    # with fewer filtered items than the candidate budget the reference's
    # queue drains completely and collects the whole pool.
    if has_filter and len(filter_slots) <= sk_exact:
        # The filter pool fits inside the candidate budget: the reference's
        # traversal would (best case) collect exactly these items before
        # re-scoring (reference: src/reader.rs:345-360,381-391), so skip the
        # forest walk entirely and re-score the whole filter set — exact
        # results over the candidates, at gather+top_k cost.
        n_f = len(filter_slots)
        capf = _next_pow2(max(n_f, 1))
        cand_np = np.full(capf, -1, np.int32)
        cand_np[:n_f] = np.asarray(filter_slots, np.int32)
        cand_const = jnp.asarray(cand_np)
        kf = max(min(_next_pow2(count), capf), 1)

        def filter_fn(qv, qn, qe, qf):
            b = qv.shape[0]
            cand = jnp.broadcast_to(cand_const, (b, capf))
            mode = rescore_mode(idx.metric, int(b), capf, idx.n_items, rescore)
            impl = _rescore_matmul if mode == "matmul" else _rescore_batch
            return impl(
                idx.metric,
                idx.dims,
                int(kf),
                idx.rows,
                idx.norms,
                idx.extras,
                idx.slot_to_id,
                cand,
                qv,
                qn,
                qe,
            )

        return filter_fn

    if has_filter:
        n_words = max((idx.cap + 31) // 32, 1)
        words = np.zeros(n_words, np.uint32)
        fs = np.asarray(filter_slots, dtype=np.int64)
        np.bitwise_or.at(words, fs >> 5, np.uint32(1) << (fs & 31).astype(np.uint32))
        filter_words = jnp.asarray(words)
        selectivity = len(filter_slots) / max(idx.n_items, 1)
    else:
        filter_words = jnp.zeros(1, jnp.uint32)
        selectivity = 1.0

    sk = _next_pow2(sk_exact)
    k = max(min(_next_pow2(count), sk + idx.max_leaf), 1)
    pmax = pops_budget(idx, sk_exact, False, selectivity)
    t = max(len(idx.roots), 1)
    # multi-pop only applies to the unfiltered XLA loop (filters and the
    # Pallas kernel keep the strict single-pop order)
    P = 1 if has_filter else resolve_multipop(idx.n_items, multipop)
    # tight widths from the index structure (capacity only, results
    # unchanged): pushes happen once per split pop; non-empty leaf logs
    # are bounded by the smallest-leaves-first worst case.  P-wide pops
    # can overshoot both by up to P-1 entries before the loop stops.
    q_cap = t + min(pmax, idx.n_splits) + 1 + max(P - 1, 0)
    l_cap = min(min(sk, pmax), idx.max_leaf_pops(sk)) + 1 + max(P - 1, 0)
    roots = jnp.asarray(np.asarray(idx.roots, np.int32))
    sk_dyn = jnp.int32(sk_exact)
    trav = traversal_mode(idx, has_filter, pmax, int(sk), traversal)
    if trav == "probe":
        if state is None:
            trav = "xla"  # no host snapshot to build block tables from
        else:
            from .probe import make_probe_fn

            return make_probe_fn(
                idx, state, count, sk_exact,
                n_trees=probe_trees, block=probe_block, dtype=probe_dtype,
                filter_slots=filter_slots if has_filter else None,
            )
    rescore_scan_state: dict = {}

    def _rescore_scan_operands(chunk):
        if chunk not in rescore_scan_state:
            mpad = -(-idx.cap // chunk) * chunk
            pad = mpad - idx.cap
            rows_p = idx.rows
            if idx.metric.name == "euclidean":
                aux = _row_sq(idx.rows)
            elif idx.metric.name == "cosine":
                aux = idx.norms
            else:
                aux = jnp.zeros(idx.cap, jnp.float32)
            if pad:
                rows_p = jnp.concatenate(
                    [rows_p, jnp.zeros((pad, idx.rows.shape[1]), idx.rows.dtype)]
                )
                aux = jnp.concatenate([aux, jnp.zeros(pad, jnp.float32)])
            rescore_scan_state[chunk] = (rows_p, aux)
        return rescore_scan_state[chunk]

    # Two-tier traversal: the per-pop cost is O(q_cap) lane-wide selects,
    # and the always-safe q_cap (every split poppable once) is 10-100x
    # the pops a real query needs.  Run an optimistic small-queue pass;
    # if any query truncated (pop cap hit before search_k candidates), a
    # device-side lax.cond re-runs the batch through the full-capacity
    # path — results stay bit-identical to the single-tier engine, with
    # no host sync in the serving path.
    #
    # The optimistic budget is EXPECTATION-based: pops to reach sk with
    # mean-sized leaves, x32 headroom (observed split-pops per leaf pop
    # is ~12 on clustered corpora).  The smallest-leaves-first bound the
    # fallback uses is 10-30x bigger on mixed-leaf forests (e.g. 1.18M
    # x 100: ~96k-lane queues vs ~3.5k), and queue width is the per-
    # iteration cost.
    if idx.leaf_cum_np is not None and len(idx.leaf_cum_np):
        mean_leaf = float(idx.leaf_cum_np[-1]) / len(idx.leaf_cum_np)
    else:
        mean_leaf = float(max(idx.max_leaf, 1))
    exp_leaf_pops = int(np.ceil(sk_exact / max(mean_leaf, 1.0)))
    pmax_small = min(pmax, _SMALL_POPS_MULT * exp_leaf_pops + _SMALL_POPS_PAD)
    two_tier = (not has_filter) and pmax_small < pmax // 2
    if not two_tier:
        # single-tier runs at the full queue width, where the multipop
        # [q_cap, P] update matrices would dominate memory (they fault
        # the device at 590k x 16 x B) — strict single-pop there
        P = 1
    q_cap_small = t + min(pmax_small, idx.n_splits) + 1 + max(P - 1, 0)

    def _traverse_x(qv, qf, pm, qc):
        if P > 1:
            return _traverse_multipop(
                idx.metric,
                int(sk),
                int(pm),
                int(idx.max_leaf),
                int(P),
                idx.node_table,
                idx.normals,
                idx.aux,
                idx.leaf_off,
                idx.leaf_cnt,
                idx.leaf_items,
                roots,
                qv,
                qf,
                sk_dyn,
                q_cap=int(qc),
                l_cap=int(l_cap),
            )
        return _traverse_batch(
            idx.metric,
            int(sk),
            int(pm),
            int(idx.max_leaf),
            bool(has_filter),
            idx.node_table,
            idx.normals,
            idx.aux,
            idx.leaf_off,
            idx.leaf_cnt,
            idx.leaf_items,
            roots,
            qv,
            qf,
            filter_words,
            sk_dyn,
            q_cap=int(qc),
            l_cap=int(l_cap),
        )

    def _do_rescore(cand, qv, qn, qe):
        mode = rescore_mode(
            idx.metric, int(qv.shape[0]), int(cand.shape[1]), idx.n_items, rescore
        )
        if mode == "matmul_scan":
            chunk = _scan_chunk(int(qv.shape[0]))
            rows_p, aux_p = _rescore_scan_operands(chunk)
            return _rescore_matmul_scan(
                idx.metric,
                idx.dims,
                int(k),
                chunk,
                idx.slot_to_id,
                rows_p,
                aux_p,
                cand,
                qv,
                qn,
                qe,
            )
        impl = _rescore_matmul if mode == "matmul" else _rescore_batch
        return impl(
            idx.metric,
            idx.dims,
            int(k),
            idx.rows,
            idx.norms,
            idx.extras,
            idx.slot_to_id,
            cand,
            qv,
            qn,
            qe,
        )

    #: candidate-buffer width (static: search_k bucket + widest leaf)
    cap_c = int(sk) + int(idx.max_leaf)
    dummy_rows = jnp.zeros((1, 1), idx.rows.dtype)
    dummy_aux = jnp.zeros(1, jnp.float32)

    def fn(qv, qn, qe, qf):
        if two_tier:
            b = int(qv.shape[0])
            rmode = rescore_mode(idx.metric, b, cap_c, idx.n_items, rescore)
            if rmode == "matmul_scan":
                chunk = _scan_chunk(b)
                rows_p, aux_p = _rescore_scan_operands(chunk)
            else:
                chunk, rows_p, aux_p = 0, dummy_rows, dummy_aux
            return _two_tier(
                idx.metric,
                idx.dims,
                int(k),
                int(sk),
                int(pmax_small),
                int(pmax),
                int(idx.max_leaf),
                int(q_cap_small),
                int(q_cap),
                int(l_cap),
                rmode,
                chunk,
                int(P),
                idx.node_table,
                idx.normals,
                idx.aux,
                idx.leaf_off,
                idx.leaf_cnt,
                idx.leaf_items,
                roots,
                filter_words,
                idx.rows,
                idx.norms,
                idx.extras,
                idx.slot_to_id,
                rows_p,
                aux_p,
                qv,
                qn,
                qe,
                qf,
                sk_dyn,
            )
        cand, _, _ = _traverse_x(qv, qf, pmax, q_cap)
        return _do_rescore(cand, qv, qn, qe)

    return fn


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
    """Host wrapper over `make_search_fn` (per-call upload/download)."""
    if idx.n_items == 0 or not idx.roots:
        b = qv.shape[0]
        return np.zeros((b, count), np.int64), np.full((b, count), np.nan, np.float32)

    # keep device temporaries bounded for very large query batches
    max_b = 1024
    if qv.shape[0] > max_b:
        parts = [
            search_batch(
                idx,
                qv[i : i + max_b],
                qn[i : i + max_b],
                qe[i : i + max_b],
                qf[i : i + max_b],
                count,
                search_k,
                filter_slots,
            )
            for i in range(0, qv.shape[0], max_b)
        ]
        return (
            np.concatenate([p[0] for p in parts]),
            np.concatenate([p[1] for p in parts]),
        )

    fn = make_search_fn(idx, count, search_k, filter_slots)
    ids, dists = fn(
        jnp.asarray(qv), jnp.asarray(qn), jnp.asarray(qe), jnp.asarray(qf)
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
# exact serving engine — a device-resident brute-force searcher
# ---------------------------------------------------------------------------
#
# On the MXU, scoring every item is one [B,d]x[d,M] matmul: at 100k x 768
# that is ~39 GFLOP per 256-query batch, i.e. ~1 ms — faster than any
# traversal, at recall 1.0.  Past the [B, M] dot-matrix budget the scan
# streams item chunks with a carried top-k, and on-chip measurements at
# every scale tried (100k/262k/1M x 768, 1.18M x 100 — STATUS.md
# crossover table) show the streamed exact engine still beating the
# forest at equal recall: within one chip's HBM there is no measured
# crossover.  A production deployment should treat exact as the
# recall-1.0 endpoint of the reference's search_k knob (reference:
# src/reader.rs:330-335); `Searcher(engine=...)` exposes the choice and
# `engine="auto"` (the default) applies it.


def _exact_f32_impl(
    metric, dims, k, c, rows, norms, extras, slot_to_id, live, qv, qn, qe, qf
):
    """f32 matmul scores + top-c select + exact per-pair re-score.

    The matmul distance forms (x² - 2q·x + q²) carry cancellation noise
    near ties; re-scoring the top-c candidates with the reference's exact
    formulas removes it at negligible cost (c << M)."""
    name = metric.name
    dots = jax.lax.dot_general(
        qv.astype(rows.dtype), rows, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, M]
    if name == "euclidean":
        x2 = _row_sq(rows)
        score = 2.0 * dots - x2[None, :]  # argmin d == argmax score
    elif name == "cosine":
        safe = jnp.where(norms > 0.0, norms, 1.0)
        score = dots / safe[None, :]
    else:  # dot-product: query extra coordinate is 0, so score = dot
        score = dots
    score = jnp.where(live[None, :], score, -_INF)
    # approx_max_k is the TPU-native top-c (tiled partial reductions);
    # lax.top_k at c=32 over [B, M] costs ~4x the whole matmul.  The
    # recall_target misses are rank >> k and removed by the re-score.
    neg_sc, cand = jax.lax.approx_max_k(score, c, recall_target=0.99)

    x = rows[cand]
    xn = norms[cand]
    xe = extras[cand]
    d = metric.built_distance(qv[:, None, :], qn[:, None], qe[:, None], x, xn, xe)
    d = jnp.where(live[cand] & (neg_sc > -_INF), d, _INF)
    neg, top_idx = jax.lax.top_k(-d, k)
    out_d = -neg
    ids = slot_to_id[jnp.take_along_axis(cand, top_idx, axis=1)]
    out_d = jnp.where(
        out_d < _INF, metric.normalized_distance(out_d, dims), jnp.float32(jnp.nan)
    )
    return ids, out_d


_exact_f32 = functools.partial(
    jax.jit, static_argnames=("metric", "dims", "k", "c")
)(_exact_f32_impl)


def _exact_scan_impl(
    metric, dims, k, chunk, rows, norms, extras, slot_to_id, live,
    rows_mm, aux_p, live_p, qv, qn, qe, qf,
):
    """Streaming exact search: scan item chunks, carry a running top-k.

    Bounds device memory to [B, chunk] regardless of corpus size, so the
    exact engine serves any HBM-resident corpus (the [B, M] dot matrix
    at B=1024 x M=4M would be 16 GB).  ``rows_mm`` is the streaming
    matmul operand padded to a chunk multiple (optionally bf16 — its
    dtype decides the MXU rate); ``aux_p``/``live_p`` are the padded
    per-item score term (x² for euclidean, norm for cosine) and live
    mask.  The carried winners get one exact f32 re-score at the end
    against the unpadded arrays."""
    name = metric.name
    b = qv.shape[0]
    m = rows_mm.shape[0]
    n_chunks = m // chunk
    qmm = qv.astype(rows_mm.dtype)

    k2 = max(min(_next_pow2(8 * k), chunk), 128)

    def body(_, i):
        # no carried merge: each chunk emits its own top-k2 and ONE final
        # top_k merges the stacked winners — the per-step cat+top_k this
        # replaces sat on the scan's serial critical path
        base = i * chunk
        rc = jax.lax.dynamic_slice(rows_mm, (base, 0), (chunk, rows_mm.shape[1]))
        dots = jax.lax.dot_general(
            qmm, rc, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [B, chunk]
        xc = jax.lax.dynamic_slice(aux_p, (base,), (chunk,))
        if name == "euclidean":
            score = 2.0 * dots - xc[None, :]
        elif name == "cosine":
            safe = jnp.where(xc > 0.0, xc, 1.0)
            score = dots / safe[None, :]
        else:
            score = dots
        lc = jax.lax.dynamic_slice(live_p, (base,), (chunk,))
        score = jnp.where(lc[None, :], score, -_INF)
        _, idx_c = jax.lax.approx_max_k(score, k2, recall_target=0.99)
        sc = jnp.take_along_axis(score, idx_c, axis=1)
        return None, (sc, idx_c + base)

    _, (sc_all, idx_all) = jax.lax.scan(
        body, None, jnp.arange(n_chunks, dtype=jnp.int32)
    )  # [n_chunks, B, k2]
    all_s = sc_all.transpose(1, 0, 2).reshape(b, n_chunks * k2)
    all_i = idx_all.transpose(1, 0, 2).reshape(b, n_chunks * k2)
    # single final merge; top_k keeps the first occurrence on ties, so
    # lower chunks (lower slots) still win like the full-matrix path
    best_s, pos = jax.lax.top_k(all_s, k2)
    cand = jnp.take_along_axis(all_i, pos, axis=1)
    # padded-region winners carry score -inf (live_p False) and are
    # masked below; clamp only to keep the gathers in bounds
    cand = jnp.minimum(cand, rows.shape[0] - 1)

    x = rows[cand]
    xn = norms[cand]
    xe = extras[cand]
    d = metric.built_distance(qv[:, None, :], qn[:, None], qe[:, None], x, xn, xe)
    d = jnp.where(live[cand] & (best_s > -_INF), d, _INF)
    neg, top_idx = jax.lax.top_k(-d, k)
    out_d = -neg
    ids = slot_to_id[jnp.take_along_axis(cand, top_idx, axis=1)]
    out_d = jnp.where(
        out_d < _INF, metric.normalized_distance(out_d, dims), jnp.float32(jnp.nan)
    )
    return ids, out_d


_exact_scan = functools.partial(
    jax.jit, static_argnames=("metric", "dims", "k", "chunk")
)(_exact_scan_impl)

#: stream item chunks once the full [B, M] dot matrix would exceed this.
#: 4 GB default (v5e-1 has 16 GB HBM; the corpus + bf16 copy + matrix
#: must co-reside): at B=256 the single-matmul path then serves up to
#: ~4M items — scan steps each pay an approx_max_k pass over the score
#: block, so skipping the scan entirely is the biggest merge saving.
_EXACT_DOTS_BYTES = int(os.environ.get("ARROY_EXACT_DOTS_BYTES", 4 << 30))
_EXACT_SCAN_CHUNK = 65_536


def _scan_chunk(batch: int) -> int:
    """Item-chunk width for the streaming exact paths: the largest pow2
    multiple of `_EXACT_SCAN_CHUNK` whose [batch, chunk] distance block
    stays within half the dot-matrix budget.  Bigger chunks mean fewer
    sequential scan steps (each pays a top_k merge); the floor keeps the
    compiled-shape bucket count small."""
    c = _EXACT_SCAN_CHUNK
    while batch * (c * 2) * 4 <= _EXACT_DOTS_BYTES // 2:
        c *= 2
    return c


def _exact_bq_scan_impl(
    metric_name, dims, k, chunk, interpret, mxu, slot_to_id,
    rows_p, norms_p, live_p, qv, qn,
):
    """Streaming BQ exact search: score one item chunk at a time.

    The BQ analog of `_exact_scan` — bounds device memory to [B, chunk]
    so binary corpora beyond the 1 GB distance-matrix limit (>~262k
    items at B=1024) still get exact service.  Unlike the f32 scan, the
    per-chunk distances are already exact, so the carried winners need
    no final re-score; ties resolve lowest-slot-first because earlier
    chunks sit first in the concatenated top-k, matching
    `_exact_bq_matrix`'s full-matrix `lax.top_k`.

    Two chunk kernels, identical results:

    * ``mxu=False``: VPU popcounts over the packed words (`rows_p` is
      [M, w] uint32) — minimal HBM (1 bit/dim).
    * ``mxu=True``: `rows_p` is the ±1 **bf16 decode** [M, d_pad] and
      hamming comes off the MXU as ``h = (d_pad - q̃·x̃)/2`` — exact,
      since ±1 products accumulate in f32 and |sum| <= d_pad << 2^24.
      Trades 16x the packed bytes (gated by ARROY_BQ_DECODE_BYTES) for
      MXU throughput; see STATUS.md for on-chip numbers.
    """
    from .ops.binary import WORD_BITS, unpack_bits_jnp
    from .ops.pallas_kernels import bq_hamming_matrix

    b = qv.shape[0]
    m = rows_p.shape[0]
    n_chunks = m // chunk
    if mxu:
        d_pad = rows_p.shape[1]
        qdec = unpack_bits_jnp(qv, d_pad).astype(jnp.bfloat16)
    else:
        d_pad = rows_p.shape[1] * WORD_BITS

    kk = min(k, chunk)

    def body(_, i):
        # stacked per-chunk winners + one final merge (no carried merge
        # on the scan's critical path; same restructure as _exact_scan)
        base = i * chunk
        rc = jax.lax.dynamic_slice(rows_p, (base, 0), (chunk, rows_p.shape[1]))
        if mxu:
            dot = jax.lax.dot_general(
                qdec, rc, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            h = (d_pad - dot) * 0.5
        else:
            h = bq_hamming_matrix(qv, rc, interpret=interpret).astype(jnp.float32)
        if metric_name == "binary quantized euclidean":
            d = 4.0 * h
        elif metric_name == "binary quantized manhattan":
            d = 2.0 * h
        else:  # binary quantized cosine
            nc = jax.lax.dynamic_slice(norms_p, (base,), (chunk,))
            pq = d_pad - 2.0 * h
            pnqn = nc[None, :] * qn[:, None]
            cos = pq / jnp.where(pnqn != 0.0, pnqn, 1.0)
            d = jnp.where(pnqn != 0.0, (1.0 - cos) / 2.0, 0.0)
        lc = jax.lax.dynamic_slice(live_p, (base,), (chunk,))
        d = jnp.where(lc[None, :], d, _INF)
        neg, idx_c = jax.lax.top_k(-d, kk)
        return None, (-neg, idx_c + base)

    _, (d_all, idx_all) = jax.lax.scan(
        body, None, jnp.arange(n_chunks, dtype=jnp.int32)
    )  # [n_chunks, B, kk]
    all_d = d_all.transpose(1, 0, 2).reshape(b, n_chunks * kk)
    all_i = idx_all.transpose(1, 0, 2).reshape(b, n_chunks * kk)
    # ties keep lowest-slot-first: chunk-major layout + top_k's
    # first-occurrence preference, matching _exact_bq_matrix
    negs, pos = jax.lax.top_k(-all_d, kk)
    best_d = -negs
    cand = jnp.take_along_axis(all_i, pos, axis=1)
    out_d = best_d
    ids = slot_to_id[jnp.minimum(cand, slot_to_id.shape[0] - 1)]
    if metric_name == "binary quantized euclidean":
        norm_fn = lambda v: v / dims
    elif metric_name == "binary quantized manhattan":
        norm_fn = lambda v: jnp.maximum(v, 0.0) / dims
    else:
        norm_fn = lambda v: v
    out_d = jnp.where(out_d < _INF, norm_fn(out_d), jnp.float32(jnp.nan))
    if kk < k:
        pad = k - kk
        ids = jnp.concatenate([ids, jnp.zeros((b, pad), ids.dtype)], axis=1)
        out_d = jnp.concatenate(
            [out_d, jnp.full((b, pad), jnp.nan, jnp.float32)], axis=1
        )
    return ids, out_d


_exact_bq_scan = functools.partial(
    jax.jit,
    static_argnames=("metric_name", "dims", "k", "chunk", "interpret", "mxu"),
)(_exact_bq_scan_impl)

#: decoded ±1 bf16 corpus budget for the BQ MXU scan (16x the packed size)
_BQ_DECODE_BYTES = int(os.environ.get("ARROY_BQ_DECODE_BYTES", 4 << 30))


def _exact_f32_direct_impl(
    metric, dims, k, rows, norms, extras, slot_to_id, live, qv, qn, qe, qf
):
    """f32 matmul + direct top_k + exact re-score — the fastest f32 mode.

    Distances come from the matmul decomposition (x² - 2q·x + q² for
    euclidean), which carries f32 cancellation noise near ties: without
    a re-score, measured recall slid to 0.9805 on clustered 768-d data
    at 100k (VERDICT r4 weak #9).  Re-scoring the top 4k candidates with
    the reference's exact per-pair formulas removes the noise at ~1/2500
    of the matmul's FLOPs (B×4k×d vs B×M×d), restoring recall ≥0.99
    while keeping the single full-matrix select."""
    name = metric.name
    dots = jax.lax.dot_general(
        qv.astype(rows.dtype), rows, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if name == "euclidean":
        x2 = _row_sq(rows)
        q2 = jnp.sum(qv * qv, axis=1)
        d = jnp.maximum(x2[None, :] - 2.0 * dots + q2[:, None], 0.0)
    elif name == "cosine":
        pnqn = norms[None, :] * qn[:, None]
        eps = jnp.float32(np.finfo(np.float32).eps)
        cos = jnp.clip(dots / jnp.where(pnqn > eps, pnqn, 1.0), -1.0, 1.0)
        d = jnp.where(pnqn > eps, (1.0 - cos) / 2.0, 0.0)
    else:  # dot-product
        d = -dots
    d = jnp.where(live[None, :], d, _INF)
    k2 = min(max(4 * k, 32), rows.shape[0])
    neg2, cand = jax.lax.top_k(-d, k2)
    # exact re-score of the candidate shortlist (noise only reorders
    # near-ties, which all sit well inside the 4k cut)
    x = rows[cand]
    xn = norms[cand]
    xe = extras[cand]
    dr = metric.built_distance(qv[:, None, :], qn[:, None], qe[:, None], x, xn, xe)
    dr = jnp.where(-neg2 < _INF, dr, _INF)
    neg, top_idx = jax.lax.top_k(-dr, k)
    out_d = -neg
    ids = slot_to_id[jnp.take_along_axis(cand, top_idx, axis=1)]
    out_d = jnp.where(
        out_d < _INF, metric.normalized_distance(out_d, dims), jnp.float32(jnp.nan)
    )
    return ids, out_d


_exact_f32_direct = functools.partial(
    jax.jit, static_argnames=("metric", "dims", "k")
)(_exact_f32_direct_impl)


def _exact_bf16_impl(
    metric, dims, k, c, cut_bf16, rows, rows_bf16, norms, extras,
    slot_to_id, live, qv, qn, qe, qf,
):
    """Two-stage: bf16 MXU dots select `c` candidates per query
    (approx_max_k), then f32 re-score of the candidates and final top_k.

    bf16 keeps ~3 significant digits — more than enough to separate the
    top-k from rank-c — and runs the MXU at twice the f32 rate with half
    the HBM read traffic.

    `cut_bf16` stores the [B, M] cut-score matrix in bf16: the pipeline
    is bound by that matrix's HBM round trip (write after the matmul
    epilogue, read by approx_max_k — ~1.6 GB at [2048, 100k] f32), so
    halving its bytes is worth ~1 ms/batch; the bf16 rounding only
    reorders candidates near rank c, which the exact f32 re-score of the
    top-c washes out (same argument as int8 stage-1 quantization)."""
    name = metric.name
    dots = jax.lax.dot_general(
        qv.astype(jnp.bfloat16),
        rows_bf16,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, M] f32 accumulated from bf16 inputs
    if name == "euclidean":
        x2 = _row_sq(rows)
        score = 2.0 * dots - x2[None, :]  # argmin d == argmax score
    elif name == "cosine":
        safe = jnp.where(norms > 0.0, norms, 1.0)
        score = dots / safe[None, :]
    else:  # dot-product: query extra coordinate is 0, so score = dot
        score = dots
    score = jnp.where(live[None, :], score, -_INF)
    if cut_bf16:
        score = score.astype(jnp.bfloat16)
    _, cand = jax.lax.approx_max_k(score, c, recall_target=0.98)  # [B, c]

    # stage 2: exact f32 on the candidate set
    x = rows[cand]  # [B, c, sd]
    xn = norms[cand]
    xe = extras[cand]
    d = metric.built_distance(qv[:, None, :], qn[:, None], qe[:, None], x, xn, xe)
    d = jnp.where(live[cand], d, _INF)
    neg, top_idx = jax.lax.top_k(-d, k)
    out_d = -neg
    ids = slot_to_id[jnp.take_along_axis(cand, top_idx, axis=1)]
    out_d = jnp.where(
        out_d < _INF, metric.normalized_distance(out_d, dims), jnp.float32(jnp.nan)
    )
    return ids, out_d


_exact_bf16 = functools.partial(
    jax.jit, static_argnames=("metric", "dims", "k", "c", "cut_bf16")
)(_exact_bf16_impl)


def _exact_int8_impl(
    metric, dims, k, c, cut_bf16, rows, rows_i8, iscale, norms, extras,
    slot_to_id, live, qv, qn, qe, qf,
):
    """Two-stage int8: quantized MXU dots select `c` candidates, exact
    f32 re-score ranks them.

    Rows are per-item max-abs int8 (x ≈ iscale_i · r_i8); queries are
    per-row max-abs int8.  The int8 matmul reads HALF the bf16 corpus
    bytes and runs the MXU at its int8 rate; the ~0.4%-relative dot
    error only reorders candidates near rank c, which the exact f32
    re-score of the top-c washes out (measured candidate recall ~0.99
    at c=32 on 100k x 768 — results/exact_profile_r04.log)."""
    name = metric.name
    qmax = jnp.max(jnp.abs(qv), axis=1)
    qsc = jnp.where(qmax > 0, qmax / 127.0, 1.0)  # [B]
    qi8 = jnp.clip(jnp.round(qv / qsc[:, None]), -127, 127).astype(jnp.int8)
    doti = jax.lax.dot_general(
        qi8, rows_i8, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [B, M] i32
    dots = doti.astype(jnp.float32) * (qsc[:, None] * iscale[None, :])
    if name == "euclidean":
        x2 = _row_sq(rows)
        score = 2.0 * dots - x2[None, :]
    elif name == "cosine":
        safe = jnp.where(norms > 0.0, norms, 1.0)
        score = dots / safe[None, :]
    else:  # dot-product: query extra coordinate is 0
        score = dots
    score = jnp.where(live[None, :], score, -_INF)
    if cut_bf16:  # halve the [B, M] HBM round trip — see _exact_bf16_impl
        score = score.astype(jnp.bfloat16)
    _, cand = jax.lax.approx_max_k(score, c, recall_target=0.95)

    x = rows[cand]
    xn = norms[cand]
    xe = extras[cand]
    d = metric.built_distance(qv[:, None, :], qn[:, None], qe[:, None], x, xn, xe)
    d = jnp.where(live[cand], d, _INF)
    neg, top_idx = jax.lax.top_k(-d, k)
    out_d = -neg
    ids = slot_to_id[jnp.take_along_axis(cand, top_idx, axis=1)]
    out_d = jnp.where(
        out_d < _INF, metric.normalized_distance(out_d, dims), jnp.float32(jnp.nan)
    )
    return ids, out_d


_exact_int8 = functools.partial(
    jax.jit, static_argnames=("metric", "dims", "k", "c", "cut_bf16")
)(_exact_int8_impl)


def _exact_fused_impl(
    metric, dims, k, c, int8, interp, rows, norms, extras, slot_to_id, live,
    xq, mult, add, pos_to_slot, qv, qn, qe, qf,
):
    """Two-stage exact search with the fused Pallas select stage.

    Stage 1 (`ops/pallas_exact.fused_block_select`) scores every item
    and keeps the per-block top-2 without materializing [B, M]; stage 2
    cuts the 2·nb block winners to `c` by packed-key order (monotonic
    with score) and re-scores them exactly in f32 (the oversample +
    exact re-score contract, reference src/reader.rs:381-401)."""
    from .ops.pallas_exact import DEAD_KEY_MAX, fused_block_select

    d_pad = xq.shape[1]
    if int8:
        qmax = jnp.max(jnp.abs(qv), axis=1)
        qsc = jnp.where(qmax > 0, qmax / 127.0, 1.0)
        q = jnp.clip(jnp.round(qv / qsc[:, None]), -127, 127).astype(jnp.int8)
    else:
        qsc = jnp.ones(qv.shape[0], jnp.float32)
        q = qv.astype(jnp.bfloat16)
    if d_pad != q.shape[1]:
        q = jnp.concatenate(
            [q, jnp.zeros((q.shape[0], d_pad - q.shape[1]), q.dtype)], axis=1
        )

    keys, idxp = fused_block_select(q, xq, qsc, mult, add, interpret=interp)
    cw = min(c, keys.shape[1])
    selk, sel = jax.lax.top_k(keys, cw)
    cand = pos_to_slot[jnp.take_along_axis(idxp, sel, axis=1)]  # [B, cw] slots

    x = rows[cand]
    xn = norms[cand]
    xe = extras[cand]
    d = metric.built_distance(qv[:, None, :], qn[:, None], qe[:, None], x, xn, xe)
    # keys at/below DEAD_KEY_MAX mark padding/dead positions (which alias
    # slot 0 through pos_to_slot — key-masking also prevents duplicate ids)
    d = jnp.where(live[cand] & (selk > DEAD_KEY_MAX), d, _INF)
    neg, top_idx = jax.lax.top_k(-d, k)
    out_d = -neg
    ids = slot_to_id[jnp.take_along_axis(cand, top_idx, axis=1)]
    out_d = jnp.where(
        out_d < _INF, metric.normalized_distance(out_d, dims), jnp.float32(jnp.nan)
    )
    return ids, out_d


_exact_fused = functools.partial(
    jax.jit, static_argnames=("metric", "dims", "k", "c", "int8", "interp")
)(_exact_fused_impl)


def _fused_tables(metric, rows, norms, live, int8: bool):
    """Bind-time corpus tables for the fused select kernel.

    Rows are laid out in a fixed pseudorandom position order so
    insertion-order clustering cannot concentrate a query's true
    neighbors into one select block (top-2 per block would shadow the
    third); `pos_to_slot` maps kernel positions back to store slots.
    Returns (xq [Mp, d_pad], mult [Mp], add [Mp], pos_to_slot [Mp])."""
    from .ops.pallas_exact import DEFAULT_BM, DEFAULT_GP

    cap, sd = rows.shape
    mp = -(-cap // DEFAULT_BM) * DEFAULT_BM
    if mp // DEFAULT_BM >= DEFAULT_GP:  # group-align (see fused_block_select)
        mp = -(-mp // (DEFAULT_BM * DEFAULT_GP)) * (DEFAULT_BM * DEFAULT_GP)
    rng = np.random.default_rng(0x5EEDED)
    p2s = np.zeros(mp, np.int32)
    p2s[:cap] = rng.permutation(cap).astype(np.int32)
    pos_to_slot = jnp.asarray(p2s)
    valid = jnp.arange(mp) < cap
    rows_p = rows[pos_to_slot]  # [mp, sd] f32, transient
    if int8:
        mx = jnp.max(jnp.abs(rows_p), axis=1)
        iscale = jnp.where(mx > 0, mx / 127.0, 1.0)
        xq = jnp.clip(
            jnp.round(rows_p / iscale[:, None]), -127, 127
        ).astype(jnp.int8)
    else:
        iscale = jnp.ones(mp, jnp.float32)
        xq = rows_p.astype(jnp.bfloat16)
    d_pad = -(-sd // 128) * 128
    if d_pad != sd:
        xq = jnp.concatenate([xq, jnp.zeros((mp, d_pad - sd), xq.dtype)], axis=1)
    name = metric.name
    if name == "euclidean":
        mult = 2.0 * iscale
        base_add = -jnp.sum(rows_p * rows_p, axis=1)
    elif name == "cosine":
        norms_p = norms[pos_to_slot]
        mult = iscale / jnp.where(norms_p > 0.0, norms_p, 1.0)
        base_add = jnp.zeros(mp, jnp.float32)
    else:  # dot-product: query extra coordinate is 0
        mult = iscale
        base_add = jnp.zeros(mp, jnp.float32)
    add = jnp.where(live[pos_to_slot] & valid, base_add, -_INF)
    return xq, mult, add, pos_to_slot


def exact_engine_supported(metric) -> bool:
    return metric.binary or metric.name in (
        "euclidean",
        "cosine",
        "dot-product",
        "manhattan",
    )


def make_exact_fn(
    idx: DeviceIndex,
    count: int,
    filter_slots: np.ndarray | None = None,
    precision: str = "auto",
):
    """Device-resident exact searcher: ``fn(qv, qn, qe, qf) -> (ids, d)``.

    Same contract as `make_search_fn` (device in, device out, pipelines
    back-to-back).  ``precision``: "f32x1" single-stage direct top_k,
    "f32" matmul + top-c + exact re-score, "bf16" two-stage (bf16
    candidate select + f32 re-score), "int8" two-stage (per-item max-abs
    quantized MXU dots + f32 re-score — half the bf16 HBM read), "auto"
    = bf16 for f32 euclidean/cosine/dot-product, else the exact
    per-metric matrix path.  Filters mask distance columns — exact
    filtered search at any selectivity (the roaring-∩ role, reference
    src/reader.rs:354-360).
    """
    k = max(min(count, max(idx.n_items, 1)), 1)
    metric = idx.metric

    if idx.n_items == 0:
        def empty_fn(qv, qn, qe, qf):
            b = qv.shape[0]
            return (
                jnp.zeros((b, max(count, 1)), jnp.uint32),
                jnp.full((b, max(count, 1)), jnp.nan, jnp.float32),
            )

        return empty_fn

    live = idx.live
    if filter_slots is not None:
        mask = np.zeros(idx.cap, bool)
        mask[np.asarray(filter_slots, np.int64)] = True
        live = jnp.logical_and(live, jnp.asarray(mask))

    if metric.binary:
        import jax as _jax

        interp = _jax.default_backend() == "cpu"
        bq_scan_state: dict = {}

        def _bq_scan_operands(chunk, mxu):
            key = (chunk, mxu)
            if key not in bq_scan_state:
                from .ops.binary import unpack_bits_jnp

                mpad = -(-idx.cap // chunk) * chunk
                pad = mpad - idx.cap
                if mxu:
                    d_pad = idx.rows.shape[1] * 32
                    # decode in pieces: the [n, w, 32] unpack temporary
                    # would be 32x the packed size in one shot
                    step = 65_536
                    rows_p = jnp.concatenate(
                        [
                            unpack_bits_jnp(
                                idx.rows[i : i + step], d_pad
                            ).astype(jnp.bfloat16)
                            for i in range(0, idx.cap, step)
                        ]
                        + (
                            [jnp.zeros((pad, d_pad), jnp.bfloat16)] if pad else []
                        )
                    )
                else:
                    rows_p = idx.rows
                    if pad:
                        rows_p = jnp.concatenate(
                            [
                                rows_p,
                                jnp.zeros((pad, idx.rows.shape[1]), idx.rows.dtype),
                            ]
                        )
                norms_p, live_p = idx.norms, live
                if pad:
                    norms_p = jnp.concatenate([norms_p, jnp.zeros(pad, jnp.float32)])
                    live_p = jnp.concatenate([live_p, jnp.zeros(pad, bool)])
                bq_scan_state[key] = (rows_p, norms_p, live_p)
            return bq_scan_state[key]

        def bq_fn(qv, qn, qe, qf):
            # the [B, M] popcount matrix follows the same memory budget
            # as the f32 dot matrix; stream chunks past it
            if int(qv.shape[0]) * idx.cap * 4 > _EXACT_DOTS_BYTES:
                chunk = _scan_chunk(int(qv.shape[0]))
                mxu = idx.cap * idx.rows.shape[1] * 32 * 2 <= _BQ_DECODE_BYTES
                rows_p, norms_p, live_p = _bq_scan_operands(chunk, mxu)
                return _exact_bq_scan(
                    metric.name, idx.dims, int(k), chunk, interp, mxu,
                    idx.slot_to_id, rows_p, norms_p, live_p, qv, qn,
                )
            return _exact_bq_matrix(
                metric.name, idx.dims, int(k), idx.rows, idx.norms,
                idx.slot_to_id, live, qv, qn, interp,
            )

        return bq_fn

    if metric.name == "manhattan":
        def man_fn(qv, qn, qe, qf):
            return _exact_batch(
                metric, idx.dims, int(k), idx.rows, idx.norms, idx.extras,
                idx.slot_to_id, live, qv, qn, qe,
            )

        return man_fn

    if precision == "auto":
        precision = "bf16"

    scan_state: dict = {}

    def _scan_operands(dtype, chunk):
        """Padded streaming operands for `_exact_scan`, built lazily on
        the first batch large enough to need chunking (the padded copy
        of the row matrix costs memory; bf16 halves it)."""
        key = (str(dtype), chunk)
        if key not in scan_state:
            mpad = -(-idx.cap // chunk) * chunk
            pad = mpad - idx.cap
            rows_mm = idx.rows.astype(dtype)
            if metric.name == "euclidean":
                aux = _row_sq(idx.rows)
            elif metric.name == "cosine":
                aux = idx.norms
            else:
                aux = jnp.zeros(idx.cap, jnp.float32)
            live_p = live
            if pad:
                rows_mm = jnp.concatenate(
                    [rows_mm, jnp.zeros((pad, idx.rows.shape[1]), dtype)]
                )
                aux = jnp.concatenate([aux, jnp.zeros(pad, jnp.float32)])
                live_p = jnp.concatenate([live, jnp.zeros(pad, bool)])
            scan_state[key] = (rows_mm, aux, live_p)
        return scan_state[key]

    def _maybe_scan(qv, qn, qe, qf, dtype):
        if int(qv.shape[0]) * idx.cap * 4 <= _EXACT_DOTS_BYTES:
            return None
        chunk = _scan_chunk(int(qv.shape[0]))
        rows_mm, aux_p, live_p = _scan_operands(dtype, chunk)
        return _exact_scan(
            metric, idx.dims, int(k), chunk, idx.rows, idx.norms,
            idx.extras, idx.slot_to_id, live, rows_mm, aux_p, live_p,
            qv, qn, qe, qf,
        )

    if precision == "f32x1":
        def f32x1_fn(qv, qn, qe, qf):
            out = _maybe_scan(qv, qn, qe, qf, idx.rows.dtype)
            if out is not None:
                return out
            return _exact_f32_direct(
                metric, idx.dims, int(k), idx.rows, idx.norms, idx.extras,
                idx.slot_to_id, live, qv, qn, qe, qf,
            )

        return f32x1_fn
    # candidate-select width for the two-stage modes: approx_max_k cost
    # GROWS steeply with c on TPU (measured: c=128 adds +6 ms over the
    # 3.5 ms matmul at [1024, 100k]; c=32 adds +0.5 ms), while candidate
    # recall at c=32 is already ~0.99 — results/exact_profile_r04.log.
    _c_env = os.environ.get("ARROY_EXACT_C")
    c = (
        int(_c_env)
        if _c_env
        else max(min(_next_pow2(3 * k), idx.cap), 32)
    )
    # cut-score dtype for the two-stage modes (ARROY_CUT_DTYPE): the
    # [B, M] matrix's HBM round trip dominates the pipeline; storing it
    # bf16 halves that traffic while the exact f32 re-score of the top-c
    # keeps the final ranking exact.  Measured on chip at 100k x 768
    # under the chain protocol (results/cut_dtype_r05.jsonl): the bf16
    # cut WINS for the bf16 mode (402.1k vs 384.7k qps, recall identical
    # 0.9977 — the f32->bf16 convert fuses into the matmul epilogue) but
    # LOSES for int8 (502.2k vs 535.7k — the i32 matmul output must be
    # scaled before the cast, so the convert is a separate elementwise
    # pass that ADDS traffic).  Default follows the measurement
    # per-precision; the env knob forces both modes either way.
    _cut_env = os.environ.get("ARROY_CUT_DTYPE")

    def _cut_bf16(default: bool) -> bool:
        return _cut_env == "bf16" if _cut_env else default

    # fused Pallas select (ops/pallas_exact): scores every item without
    # materializing [B, M] — no HBM score round trips AND no streaming
    # scan needed at any HBM-resident corpus size.  OPT-IN
    # (ARROY_EXACT_FUSED=1): its select stage runs at 89.5% of bf16 peak,
    # but END-TO-END the unfused two-stage wins at both precisions under
    # the steady-state chain protocol at 100k x 768 — bf16 389k vs 314k
    # qps, int8 535k vs 415k (results/fused_vs_unfused_r05.jsonl) — the
    # pipeline is bound by the cut + re-score, not the select, so the
    # measured-fastest path serves by default (r4 shipped fused as
    # default against its own 0.87x artifact; VERDICT r4 #3).
    def _fused_ready(int8: bool) -> dict | None:
        if os.environ.get("ARROY_EXACT_FUSED", "0") != "1":
            return None
        from .ops.pallas_exact import DEFAULT_BM

        mp = -(-idx.cap // DEFAULT_BM) * DEFAULT_BM
        nb2 = 2 * (mp // DEFAULT_BM)
        xq_bytes = mp * (-(-idx.rows.shape[1] // 128) * 128) * (1 if int8 else 2)
        if (
            idx.cap < int(os.environ.get("ARROY_FUSED_MIN_ITEMS", 32768))
            or nb2 < max(int(k), 32)
            or xq_bytes > int(os.environ.get("ARROY_FUSED_TABLE_BYTES", 3 << 30))
        ):
            return None
        xq, mult, add, pos_to_slot = _fused_tables(
            metric, idx.rows, idx.norms, live, int8
        )
        return {
            "ok": True,
            "tables": (xq, mult, add, pos_to_slot),
            "interp": jax.default_backend() == "cpu",
        }

    def _try_fused(st, int8, qv, qn, qe, qf):
        if st is None or not st["ok"]:
            return None
        xq, mult, add, pos_to_slot = st["tables"]
        try:
            return _exact_fused(
                metric, idx.dims, int(k), int(c), int8, st["interp"],
                idx.rows, idx.norms, idx.extras, idx.slot_to_id, live,
                xq, mult, add, pos_to_slot, qv, qn, qe, qf,
            )
        except Exception:  # Mosaic/compile failure: unfused from now on
            st["ok"] = False
            import warnings

            warnings.warn(
                "fused exact select kernel failed to compile; "
                "falling back to the unfused two-stage path",
                RuntimeWarning,
            )
            return None

    if precision == "bf16":
        fused_st = _fused_ready(int8=False)
        lazy: dict = {}

        def bf16_fn(qv, qn, qe, qf):
            out = _try_fused(fused_st, False, qv, qn, qe, qf)
            if out is not None:
                return out
            out = _maybe_scan(qv, qn, qe, qf, jnp.bfloat16)
            if out is not None:
                return out
            if "rows_bf16" not in lazy:  # cast once, on first unfused use
                lazy["rows_bf16"] = idx.rows.astype(jnp.bfloat16)
            return _exact_bf16(
                metric, idx.dims, int(k), int(c), _cut_bf16(True), idx.rows,
                lazy["rows_bf16"], idx.norms, idx.extras, idx.slot_to_id,
                live, qv, qn, qe, qf,
            )

        return bf16_fn
    if precision == "int8":
        fused_st = _fused_ready(int8=True)
        lazy = {}

        def int8_fn(qv, qn, qe, qf):
            out = _try_fused(fused_st, True, qv, qn, qe, qf)
            if out is not None:
                return out
            out = _maybe_scan(qv, qn, qe, qf, jnp.bfloat16)
            if out is not None:
                return out
            if "i8" not in lazy:
                # per-item max-abs quantization, computed once on device
                # (reads the f32 corpus once)
                mx = jnp.max(jnp.abs(idx.rows), axis=1)
                iscale = jnp.where(mx > 0, mx / 127.0, 1.0)
                rows_i8 = jnp.clip(
                    jnp.round(idx.rows / iscale[:, None]), -127, 127
                ).astype(jnp.int8)
                lazy["i8"] = (rows_i8, iscale)
            rows_i8, iscale = lazy["i8"]
            return _exact_int8(
                metric, idx.dims, int(k), int(c), _cut_bf16(False), idx.rows,
                rows_i8, iscale, idx.norms, idx.extras, idx.slot_to_id,
                live, qv, qn, qe, qf,
            )

        return int8_fn

    c32 = max(min(_next_pow2(8 * k), idx.cap), 128)

    def f32_fn(qv, qn, qe, qf):
        out = _maybe_scan(qv, qn, qe, qf, idx.rows.dtype)
        if out is not None:
            return out
        return _exact_f32(
            metric, idx.dims, int(k), int(c32), idx.rows, idx.norms,
            idx.extras, idx.slot_to_id, live, qv, qn, qe, qf,
        )

    return f32_fn


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


@functools.partial(jax.jit, static_argnames=("metric_name", "dims", "k"))
def _exact_matmul(metric_name, dims, k, rows, norms, extras, slot_to_id, live, qv, qn):
    """MXU brute force for dot-decomposable metrics.

    One [B, d] x [d, M] matmul gives every query-item dot product; the
    metric-specific distance is reconstructed from dots and norms.  This
    is the small-corpus fast path: ranking-equivalent to the reference
    formulas (euclidean uses ||x||^2 - 2x.q + ||q||^2, which can differ
    in final bits from the sum-of-squares form the oracle uses).
    """
    dots = jax.lax.dot_general(
        qv.astype(rows.dtype), rows, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, M]
    if metric_name == "euclidean":
        x2 = _row_sq(rows)
        q2 = jnp.sum(qv * qv, axis=1)
        d = x2[None, :] - 2.0 * dots + q2[:, None]
        d = jnp.maximum(d, 0.0)
        norm_fn = lambda v: jnp.sqrt(jnp.maximum(v, 0.0))
    elif metric_name == "cosine":
        pnqn = norms[None, :] * qn[:, None]
        eps = jnp.float32(np.finfo(np.float32).eps)
        cos = jnp.clip(dots / jnp.where(pnqn > eps, pnqn, 1.0), -1.0, 1.0)
        d = jnp.where(pnqn > eps, (1.0 - cos) / 2.0, 0.0)
        norm_fn = lambda v: v
    else:  # dot-product
        d = -dots
        norm_fn = lambda v: -v
    d = jnp.where(live[None, :], d, _INF)
    neg, idx = jax.lax.top_k(-d, k)
    out_d = -neg
    ids = slot_to_id[idx]
    return ids, jnp.where(out_d < _INF, norm_fn(out_d), jnp.float32(jnp.nan))


@functools.partial(jax.jit, static_argnames=("metric_name", "dims", "k", "interpret"))
def _exact_bq_matrix(metric_name, dims, k, rows, norms, slot_to_id, live, qv, qn, interpret):
    """Tiled Pallas popcount distance matrix for BQ metrics."""
    from .ops.binary import WORD_BITS
    from .ops.pallas_kernels import bq_hamming_matrix

    h = bq_hamming_matrix(qv, rows, interpret=interpret).astype(jnp.float32)  # [B, M]
    if metric_name == "binary quantized euclidean":
        d = 4.0 * h
        norm_fn = lambda v: v / dims
    elif metric_name == "binary quantized manhattan":
        d = 2.0 * h
        norm_fn = lambda v: jnp.maximum(v, 0.0) / dims
    else:  # binary quantized cosine
        d_pad = rows.shape[1] * WORD_BITS
        pq = d_pad - 2.0 * h
        pnqn = norms[None, :] * qn[:, None]
        cos = pq / jnp.where(pnqn != 0.0, pnqn, 1.0)
        d = jnp.where(pnqn != 0.0, (1.0 - cos) / 2.0, 0.0)
        norm_fn = lambda v: v
    d = jnp.where(live[None, :], d, _INF)
    neg, idx2 = jax.lax.top_k(-d, k)
    out_d = -neg
    ids = slot_to_id[idx2]
    return ids, jnp.where(out_d < _INF, norm_fn(out_d), jnp.float32(jnp.nan))


def exact_batch(idx: DeviceIndex, qv, qn, qe, count: int, fast: bool = False):
    if idx.n_items == 0:
        b = np.asarray(qv).shape[0]
        return np.zeros((b, count), np.int64), np.full((b, count), np.nan, np.float32)
    live = idx.live
    k = min(count, idx.cap)
    if fast and idx.metric.binary:
        import jax as _jax

        ids, dists = _exact_bq_matrix(
            idx.metric.name,
            idx.dims,
            int(k),
            idx.rows,
            idx.norms,
            idx.slot_to_id,
            live,
            jnp.asarray(qv),
            jnp.asarray(qn),
            _jax.default_backend() == "cpu",  # interpret only on CPU (the
            # TPU backend registers as "axon" through the tunnel plugin)
        )
        ids = np.asarray(ids).astype(np.int64)
        dists = np.asarray(dists)
        if k < count:
            ids = np.concatenate(
                [ids, np.zeros((ids.shape[0], count - k), ids.dtype)], axis=1
            )
            dists = np.concatenate(
                [dists, np.full((dists.shape[0], count - k), np.nan, dists.dtype)],
                axis=1,
            )
        return ids, dists
    if fast and not idx.metric.binary and idx.metric.name in (
        "euclidean",
        "cosine",
        "dot-product",
    ):
        ids, dists = _exact_matmul(
            idx.metric.name,
            idx.dims,
            int(k),
            idx.rows,
            idx.norms,
            idx.extras,
            idx.slot_to_id,
            live,
            jnp.asarray(qv),
            jnp.asarray(qn),
        )
        ids = np.asarray(ids).astype(np.int64)
        dists = np.asarray(dists)
        if k < count:
            ids = np.concatenate(
                [ids, np.zeros((ids.shape[0], count - k), ids.dtype)], axis=1
            )
            dists = np.concatenate(
                [dists, np.full((dists.shape[0], count - k), np.nan, dists.dtype)],
                axis=1,
            )
        return ids, dists
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
