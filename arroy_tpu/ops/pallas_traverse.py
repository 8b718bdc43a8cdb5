"""Monolithic Pallas traversal kernel: the whole pop loop in VMEM.

The XLA traversal (`search._traverse_impl`) runs the best-first pop loop
as a vmapped `lax.while_loop`; its loop-carried priority-queue arrays
round-trip HBM every iteration and each body is a chain of small
latency-bound ops.  This kernel runs the identical computation with all
state resident in VMEM:

- grid over query blocks of ``_QBLK`` (a block exits its while loop as
  soon as its own queries are done — no batch-wide lockstep),
- the node table lives in VMEM transposed to ``[8, Np]`` (fields x
  nodes) so per-pop rows are selected by a one-hot masked reduce over
  the lane axis — no scalar extraction, no dynamic-slice starts, every
  op stays a plain vector op Mosaic is guaranteed to lower,
- margins are selected the same way from the precomputed margin block,
- the kernel emits each query's leaf log (CSR rows of the leaves it
  popped); the candidate expansion is the shared XLA helper outside.

Pop order, tie-breaking, the leaf log protocol and the pop budget are
bit-identical to the XLA path (asserted by tests/test_pallas.py), so
`search_k` semantics match the reference best-first queue the same way
(reference: src/reader.rs:317-401).

On a CPU backend the kernel runs under ``interpret=True`` (tests); any
non-CPU backend compiles it.  On-chip use is gated by `fits`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.forest import KIND_FREE, KIND_LEAF, KIND_SPLIT_NONE

_QBLK = 8  # queries per grid step (one VPU sublane tile)

#: VMEM budget for the resident inputs (transposed node table is
#: 32 B/node; leave headroom for the pq state and margin block)
_VMEM_BUDGET = 10 * (1 << 20)


def fits(n_nodes: int, s_rows: int, q_cap: int, l_cap: int) -> bool:
    node_bytes = -(-n_nodes // 128) * 128 * 8 * 4  # [8, Np] lane-padded
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
    nodeT_ref,
    marg_ref,
    init_ref,
    log_ref,
    ncand_ref,
    pops_ref,
):
    inf = float("inf")  # python floats fold into the ops (jnp scalars
    # would be captured constants, which pallas_call rejects)
    sk = skdyn_ref[0, 0]
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (_QBLK, q_cap), 1)
    l_iota = jax.lax.broadcasted_iota(jnp.int32, (_QBLK, l_cap), 1)
    s_iota = jax.lax.broadcasted_iota(jnp.int32, (_QBLK, s_rows), 1)
    n_iota = jax.lax.broadcasted_iota(jnp.int32, (_QBLK, n_nodes), 1)
    marg = marg_ref[:]  # [Q, S]
    nodeT = nodeT_ref[:]  # [8, Np]: kind,left,right,ptr,off,cnt,0,0 rows

    # Mosaic layout discipline: every while-loop carry is derived from a
    # VMEM load (constants/broadcasts get sublane-REPLICATED vector
    # layouts, the body's outputs don't, and Mosaic cannot relayout
    # non-replicated -> replicated at the loop back-edge), and the
    # per-query scalar counters (n_pushed / n_cand / pops) live in lanes
    # 0/1/2 of one [Q, 128] register tile instead of [Q, 1] carries
    # (1-lane i32 vectors hit the same invalid-relayout class).
    pq_node0 = init_ref[:]  # [Q, q_cap], roots then zeros
    zrow = pq_node0 * 0
    pq_dist0 = jnp.where((c_iota + zrow) < t, inf, -inf)
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (_QBLK, 128), 1)
    regs0 = zrow[:, :128] + jnp.where(r_iota == 0, t, 0)

    def _reg(regs, j):
        return jnp.max(jnp.where(r_iota == j, regs, 0), axis=1, keepdims=True)

    def cond(st):
        _, _, _, regs = st
        n_cand = _reg(regs, 1)
        pops = _reg(regs, 2)
        return jnp.any((n_cand < sk) & (pops < pmax))

    def body(st):
        pq_dist, pq_node, leaf_log, regs = st
        n_pushed = _reg(regs, 0)
        n_cand = _reg(regs, 1)
        pops = _reg(regs, 2)
        active = (n_cand < sk) & (pops < pmax)  # [Q, 1]
        m = jnp.max(pq_dist, axis=1, keepdims=True)
        alive = (m > -inf) & active
        # max-heap pop: max dist, ties broken by larger node id, then by
        # first queue slot (identical to the XLA path's argmax)
        mask = pq_dist == m
        nid = jnp.max(jnp.where(mask, pq_node, -1), axis=1, keepdims=True)
        sel = mask & (pq_node == nid)
        # first selected queue slot (cumsum doesn't lower in Pallas TPU:
        # a min-reduce over the slot iota is the same "first set lane")
        first = jnp.min(jnp.where(sel, c_iota, q_cap), axis=1, keepdims=True)
        at_i = c_iota == first

        # popped node fields by one-hot reduce over the node axis
        sel_n = n_iota == jnp.clip(nid, 0, n_nodes - 1)

        def pick(j):
            return jnp.sum(
                jnp.where(sel_n, nodeT[j : j + 1, :], 0), axis=1, keepdims=True
            )

        knd, left, right, p, cnt_raw = (pick(j) for j in (0, 1, 2, 3, 5))
        is_leaf = alive & (knd == KIND_LEAF)
        is_split = alive & ~is_leaf & (knd != KIND_FREE)

        # --- leaf lane: log the CSR row, bump the running count ---
        cnt = jnp.where(is_leaf, cnt_raw, 0)
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

        new_regs = jnp.where(r_iota == 0, new_pushed, regs)
        new_regs = jnp.where(r_iota == 1, new_ncand, new_regs)
        new_regs = jnp.where(r_iota == 2, new_pops, new_regs)

        # finished queries freeze (the vmapped while_loop's per-lane gate)
        return (
            jnp.where(active, new_dist, pq_dist),
            jnp.where(active, new_node, pq_node),
            jnp.where(active, new_log, leaf_log),
            jnp.where(active, new_regs, regs),
        )

    st = (pq_dist0, pq_node0, zrow[:, :l_cap], regs0)
    _, _, leaf_log, regs = jax.lax.while_loop(cond, body, st)
    log_ref[:, :] = leaf_log
    ncand_ref[:, :] = _reg(regs, 1)
    pops_ref[:, :] = _reg(regs, 2)


@functools.partial(
    jax.jit,
    static_argnames=("metric", "search_k", "pmax", "w", "t", "interpret"),
)
def _traverse_pallas_jit(
    metric,
    search_k,
    pmax,
    w,
    t,
    interpret,
    node_table,
    normals,
    aux,
    leaf_off,
    leaf_cnt,
    leaf_items,
    init_node,
    qv,
    qf,
    search_k_dyn,
):
    """One fused device program: margins -> pop-loop kernel -> expansion."""
    from ..search import _expand_one_log

    b = qv.shape[0]
    n_nodes = node_table.shape[0]
    # lane-align the queue and log widths (Mosaic relayouts on unaligned
    # i32 vectors are fragile; capacity padding never changes results)
    q_cap = pl.cdiv(t + pmax, 128) * 128
    l_cap = pl.cdiv(min(search_k, pmax) + 1, 128) * 128
    cap = search_k + w

    margins = metric.margin_matrix(normals, aux, qv, qf).astype(jnp.float32)
    s_rows = margins.shape[1]
    bp = pl.cdiv(b, _QBLK) * _QBLK
    if bp > b:
        margins = jnp.concatenate(
            [margins, jnp.zeros((bp - b, s_rows), margins.dtype)], axis=0
        )
    nodeT = node_table.T  # [8, Np] fields x nodes
    # tile the init queue row to a full [Q, q_cap] block: the kernel derives
    # every loop carry from this load (see _kernel layout note)
    init_full = jnp.zeros((_QBLK, q_cap), jnp.int32).at[:, : init_node.shape[1]].set(
        jnp.broadcast_to(init_node, (_QBLK, init_node.shape[1]))
    )

    kern = functools.partial(_kernel, t, pmax, q_cap, l_cap, n_nodes, s_rows)
    logs, ncand, pops = pl.pallas_call(
        kern,
        grid=(bp // _QBLK,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((8, n_nodes), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_QBLK, s_rows), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_QBLK, q_cap), lambda i: (0, 0), memory_space=pltpu.VMEM),
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
        interpret=interpret,
    )(
        jnp.asarray(search_k_dyn, jnp.int32).reshape(1, 1),
        nodeT,
        margins,
        init_full,
    )
    cand = jax.vmap(
        lambda log1: _expand_one_log(log1, leaf_off, leaf_cnt, leaf_items, cap)
    )(logs[:b])
    return cand, pops[:b, 0], ncand[:b, 0]


def make_init_node(roots: np.ndarray, pmax: int) -> np.ndarray:
    """The initial queue-node row (roots then zeros), built once at
    searcher-bind time — never per call (the tunnel costs ~30 ms per
    host->device transfer)."""
    t = int(roots.shape[0])
    init = np.zeros((1, t + pmax), np.int32)
    init[0, :t] = np.asarray(roots, np.int32)
    return init


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
    init_node,
    qv,
    qf,
    search_k_dyn,
    interpret: bool | None = None,
):
    """Drop-in for the unfiltered `search._traverse_batch` (same outputs).

    ``init_node`` is the device array from `make_init_node` (bound once);
    everything here runs inside one jit — no per-call host work.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    t = int(init_node.shape[1]) - int(pmax)
    return _traverse_pallas_jit(
        metric,
        int(search_k),
        int(pmax),
        int(w),
        t,
        bool(interpret),
        node_table,
        normals,
        aux,
        leaf_off,
        leaf_cnt,
        leaf_items,
        init_node,
        qv,
        qf,
        search_k_dyn,
    )
