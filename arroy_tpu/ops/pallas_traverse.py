"""Monolithic Pallas traversal kernel: the whole pop loop in VMEM.

The XLA traversal (`search._traverse_impl`) runs the best-first pop loop
as a vmapped `lax.while_loop`; its loop-carried priority-queue arrays
round-trip HBM every iteration and each body is a chain of small
latency-bound ops.  This kernel runs the identical computation with all
state resident in VMEM:

- grid over query blocks of ``_QBLK`` (a block exits its while loop as
  soon as its own queries are done — no batch-wide lockstep),
- the packed node table ``[Np, 8]`` stays in VMEM for the whole kernel,
- per-pop node rows are fetched with dynamic row reads into a tiny
  scratch, margins are selected from the precomputed margin block by a
  one-hot reduce (no scalar extraction on the write side),
- the kernel emits each query's leaf log (CSR rows of the leaves it
  popped); the candidate expansion stays in stock XLA outside.

Pop order, tie-breaking, the leaf log protocol and the pop budget are
bit-identical to the XLA path (asserted by tests/test_pallas.py), so
`search_k` semantics match the reference best-first queue the same way
(reference: src/reader.rs:317-401).

Off-TPU the kernel runs under ``interpret=True`` (CPU tests); on-chip
use is gated by `fits` (node table + margin block must fit VMEM).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.forest import KIND_FREE, KIND_LEAF, KIND_SPLIT_NONE

_INF = jnp.float32(jnp.inf)
_QBLK = 8  # queries per grid step (one VPU sublane tile)

#: VMEM budget for the resident inputs (node table is lane-padded 8->128
#: by Mosaic, so it costs Np*512 bytes; leave headroom for pq state)
_VMEM_BUDGET = 10 * (1 << 20)


def fits(n_nodes: int, s_rows: int, q_cap: int, l_cap: int) -> bool:
    node_bytes = n_nodes * 128 * 4  # lane padding 8 -> 128
    marg_bytes = _QBLK * s_rows * 4
    state_bytes = _QBLK * (2 * q_cap + l_cap) * 4 * 2  # carries double-buffered
    return node_bytes + marg_bytes + state_bytes < _VMEM_BUDGET


def _kernel(
    t,
    pmax,
    q_cap,
    l_cap,
    n_nodes,
    s_rows,
    skdyn_ref,
    node_ref,
    marg_ref,
    init_ref,
    log_ref,
    ncand_ref,
    pops_ref,
    rows_s,
    nid_s,
):
    inf = float("inf")  # python float: folds into the ops (jnp scalars
    # would be captured constants, which pallas_call rejects)
    sk = skdyn_ref[0, 0]
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (_QBLK, q_cap), 1)
    l_iota = jax.lax.broadcasted_iota(jnp.int32, (_QBLK, l_cap), 1)
    s_iota = jax.lax.broadcasted_iota(jnp.int32, (_QBLK, s_rows), 1)
    marg = marg_ref[:]  # [Q, S]

    pq_dist0 = jnp.where(c_iota < t, inf, -inf)
    pq_node0 = jnp.broadcast_to(init_ref[:], (_QBLK, q_cap))
    zeros1 = jnp.zeros((_QBLK, 1), jnp.int32)

    def cond(st):
        _, _, _, _, n_cand, pops = st
        return jnp.any((n_cand < sk) & (pops < pmax))

    def body(st):
        pq_dist, pq_node, n_pushed, leaf_log, n_cand, pops = st
        active = (n_cand < sk) & (pops < pmax)  # [Q, 1]
        m = jnp.max(pq_dist, axis=1, keepdims=True)
        alive = (m > -inf) & active
        # max-heap pop: max dist, ties broken by larger node id, then by
        # first queue slot (identical to the XLA path's argmax)
        mask = pq_dist == m
        nid = jnp.max(jnp.where(mask, pq_node, -1), axis=1, keepdims=True)
        sel = mask & (pq_node == nid)
        at_i = sel & (jnp.cumsum(sel.astype(jnp.int32), axis=1) == 1)

        # fetch the popped node rows: Q dynamic row reads through scratch
        nid_s[:, :] = jnp.clip(nid, 0, n_nodes - 1)
        for j in range(_QBLK):
            nj = nid_s[j, 0]
            rows_s[pl.ds(j, 1), :] = node_ref[pl.ds(nj, 1), :]
        rows = rows_s[:, :]  # [Q, 8]: kind,left,right,ptr,off,cnt,0,0
        knd = rows[:, 0:1]
        left = rows[:, 1:2]
        right = rows[:, 2:3]
        p = rows[:, 3:4]
        is_leaf = alive & (knd == KIND_LEAF)
        is_split = alive & ~is_leaf & (knd != KIND_FREE)

        # --- leaf lane: log the CSR row, bump the running count ---
        cnt = jnp.where(is_leaf, rows[:, 5:6], 0)
        n_leaf = leaf_log[:, l_cap - 1 :]
        log_it = is_leaf & (cnt > 0) & (n_leaf < l_cap - 1)
        new_log = jnp.where(log_it & (l_iota == n_leaf), p, leaf_log)
        new_log = jnp.where(
            l_iota == l_cap - 1, n_leaf + log_it.astype(jnp.int32), new_log
        )
        new_ncand = n_cand + cnt

        # --- split lane: one-hot margin select + two pushes ---
        p_c = jnp.clip(p, 0, s_rows - 1)
        margin = jnp.sum(
            jnp.where(s_iota == p_c, marg, 0.0), axis=1, keepdims=True
        )
        margin = jnp.where(knd == KIND_SPLIT_NONE, 0.0, margin)
        dl = jnp.minimum(m, -margin)
        dr = jnp.minimum(m, margin)
        at_push = c_iota == n_pushed
        new_dist = jnp.where(at_i, jnp.where(is_split, dl, -inf), pq_dist)
        new_node = jnp.where(at_i & is_split, left, pq_node)
        new_dist = jnp.where(at_push & is_split, dr, new_dist)
        new_node = jnp.where(at_push & is_split, right, new_node)
        new_pushed = n_pushed + is_split.astype(jnp.int32)
        new_pops = jnp.where(alive, pops + 1, jnp.int32(pmax))

        # finished queries freeze (the vmapped while_loop's per-lane gate)
        return (
            jnp.where(active, new_dist, pq_dist),
            jnp.where(active, new_node, pq_node),
            jnp.where(active, new_pushed, n_pushed),
            jnp.where(active, new_log, leaf_log),
            jnp.where(active, new_ncand, n_cand),
            jnp.where(active, new_pops, pops),
        )

    st = (
        pq_dist0,
        pq_node0,
        jnp.full((_QBLK, 1), t, jnp.int32),
        jnp.zeros((_QBLK, l_cap), jnp.int32),
        zeros1,
        zeros1,
    )
    _, _, _, leaf_log, n_cand, pops = jax.lax.while_loop(cond, body, st)
    log_ref[:, :] = leaf_log
    ncand_ref[:, :] = n_cand
    pops_ref[:, :] = pops


@functools.partial(
    jax.jit,
    static_argnames=("search_k", "pmax", "w", "t", "interpret"),
)
def _traverse_pallas_logs(
    search_k,
    pmax,
    w,
    t,
    interpret,
    node_table,
    margins,
    init_node,
    search_k_dyn,
):
    """Run the pop loop; returns (leaf_log [B, l_cap], n_cand, pops)."""
    b = margins.shape[0]
    s_rows = margins.shape[1]
    n_nodes = node_table.shape[0]
    q_cap = t + pmax
    l_cap = min(search_k, pmax) + 1

    bp = pl.cdiv(b, _QBLK) * _QBLK
    if bp > b:
        margins = jnp.concatenate(
            [margins, jnp.zeros((bp - b, s_rows), margins.dtype)], axis=0
        )

    kern = functools.partial(_kernel, t, pmax, q_cap, l_cap, n_nodes, s_rows)
    logs, ncand, pops = pl.pallas_call(
        kern,
        grid=(bp // _QBLK,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (n_nodes, 8), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((_QBLK, s_rows), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_cap), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_QBLK, l_cap), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_QBLK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_QBLK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, l_cap), jnp.int32),
            jax.ShapeDtypeStruct((bp, 1), jnp.int32),
            jax.ShapeDtypeStruct((bp, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((_QBLK, 8), jnp.int32),
            pltpu.VMEM((_QBLK, 1), jnp.int32),
        ],
        interpret=interpret,
    )(
        jnp.asarray(search_k_dyn, jnp.int32).reshape(1, 1),
        node_table,
        margins,
        init_node,
    )
    return logs[:b], ncand[:b, 0], pops[:b, 0]


@functools.partial(
    jax.jit, static_argnames=("search_k", "pmax", "w")
)
def _expand_logs(search_k, pmax, w, leaf_log, leaf_off, leaf_cnt, leaf_items):
    """Leaf log -> candidate slots: the same cumsum/searchsorted expansion
    as the XLA path's `one()` tail (search.py)."""
    l_cap = leaf_log.shape[1]
    cap = search_k + w
    cap_iota = jnp.arange(cap, dtype=jnp.int32)
    l_iota = jnp.arange(l_cap, dtype=jnp.int32)

    def one(log1):
        n_leaf = log1[l_cap - 1]
        live_l = l_iota < n_leaf
        counts = jnp.where(live_l, leaf_cnt[log1], 0)
        ends = jnp.cumsum(counts)
        sel = jnp.searchsorted(ends, cap_iota, side="right").astype(jnp.int32)
        sel_c = jnp.minimum(sel, l_cap - 1)
        start = ends[sel_c] - counts[sel_c]
        src = leaf_off[log1[sel_c]] + (cap_iota - start)
        total = jnp.minimum(ends[l_cap - 1], cap)
        vals = leaf_items[jnp.minimum(src, leaf_items.shape[0] - 1)]
        return jnp.where(cap_iota < total, vals, -1)

    return jax.vmap(one)(leaf_log)


def traverse_pallas(
    metric,
    search_k: int,
    pmax: int,
    w: int,
    node_table,
    normals,
    aux,
    leaf_off,
    leaf_cnt,
    leaf_items,
    roots: np.ndarray,
    qv,
    qf,
    search_k_dyn,
    interpret: bool | None = None,
):
    """Drop-in for the unfiltered `search._traverse_batch` (same outputs)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    t = int(roots.shape[0])
    q_cap = t + pmax
    init = np.zeros((1, q_cap), np.int32)
    init[0, :t] = np.asarray(roots, np.int32)
    margins = metric.margin_matrix(normals, aux, qv, qf)  # [B, S]
    logs, n_cand, pops = _traverse_pallas_logs(
        int(search_k),
        int(pmax),
        int(w),
        t,
        bool(interpret),
        node_table,
        margins.astype(jnp.float32),
        jnp.asarray(init),
        search_k_dyn,
    )
    cand = _expand_logs(
        int(search_k), int(pmax), int(w), logs, leaf_off, leaf_cnt, leaf_items
    )
    return cand, pops, n_cand
