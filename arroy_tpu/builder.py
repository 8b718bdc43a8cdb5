"""Level-synchronous batched forest builder.

The reference builds each tree by a per-node recursion on a rayon
work-stealing pool: `make_tree_in_file` runs two-means, assigns a side to
every item of the node one dot product at a time, and recurses
(reference: src/writer.rs:1167-1261, src/distance/mod.rs:126-171).

On TPU the same computation is re-organized *level-synchronously*: one
jitted step grows **every active node of every tree at once**:

1. two-means for all frontier nodes in parallel (a vmapped, statically
   10-step refinement over 12 threefry-sampled leaves per node);
2. side assignment of every item against its node's hyperplane as one
   chunked gather-rowdot sweep over the whole permutation array — the
   reference's hottest per-item loop becomes a single fused device op;
3. the imbalance-retry rule (accept < 0.95, 3 retries, random fallback
   past 0.99 — reference src/writer.rs:1209-1233) runs as masked lanes
   inside a `lax.while_loop`;
4. partition is one stable sort of (segment, side) keys over the
   permutation array.

Items are addressed by *slot* (row in the device item matrix); the host
orchestrator keeps segment bookkeeping in numpy and allocates node ids.
"""

from __future__ import annotations

import functools
import os
import time
from dataclasses import dataclass, field
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .metrics import Metric
from .models.forest import Forest, NodeIdAllocator

_MARGIN_CHUNK = 8192
#: byte budget for one margin-pass step's temporaries (the [chunk, sd]
#: row gather plus the [A, chunk, sd] per-attempt normal rows).  The
#: chunk COUNT is what matters on chip: margin passes run as a serial
#: `lax.map`, and a fixed 8k-lane chunk meant ~3,600 latency-bound
#: steps per level at 1.18M x 25 trees (~10s/level — the dominant
#: bucket of the whole build).  Chunk values are per-lane dots, so any
#: chunk size is byte-identical (golden build tests pin this).
_MARGIN_CHUNK_BYTES = int(os.environ.get("ARROY_MARGIN_CHUNK_BYTES", 512 << 20))

#: target wall-time per fused grow group when a REAL cancel callback is
#: registered: one fused group is a single uninterruptible device
#: dispatch (measured 4.97-22.3s per group at 1.18M x 25 with k=8), so
#: the fuse depth adapts to keep predicted group time under this bound —
#: the reference polls its cancel token per recursion step
#: (reference: src/writer.rs:117-124).
_CANCEL_BOUND_S = float(os.environ.get("ARROY_CANCEL_BOUND_S", "1.0"))

#: clock used by the cancel-bound rate model; module-level so tests can
#: monkeypatch a fake clock and pin the adaptive behaviour
_clock = time.perf_counter

#: grow-group dispatch counter (test observability for the cancel bound)
_dispatch_count = 0


#: lane-frame floor below which active-lane compaction stops bothering:
#: a compaction costs ~one extra level-dispatch at the old frame size
#: plus one compile per new rung, so it only pays while frames are large
_COMPACT_MIN_LANES = int(os.environ.get("ARROY_COMPACT_MIN_LANES", 1 << 18))


def _margin_chunk(p_cap: int, sd: int, attempts: int = 1) -> int:
    """Largest pow2 chunk (≥ _MARGIN_CHUNK, ≤ p_cap) within the budget."""
    budget = _MARGIN_CHUNK_BYTES // max((attempts + 1) * sd * 4, 1)
    c = _MARGIN_CHUNK
    while c * 2 <= min(budget, p_cap):
        c *= 2
    return min(c, p_cap)
#: safety valve: no real forest is deeper than this (random-split fallback
#: halves a node in expectation); past it the remaining segments are
#: flushed to oversized descendants instead of looping forever.
_MAX_LEVELS = 200


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


#: below this, compaction frame sizes round up to powers of FOUR: tail
#: rungs are cheap to overshoot but each distinct shape is a fresh XLA
#: compile through the remote relay, and exact pow2 rungs of the (seed-
#: dependent) active count rarely repeat across rebuilds
_POW4_BELOW = 1 << 21


def _next_rung(n: int) -> int:
    """pow2 rung, coarsened to pow4 below _POW4_BELOW (shape reuse)."""
    p = _next_pow2(n)
    if p < _POW4_BELOW and (p.bit_length() - 1) % 2:
        p *= 2
    return p


def _sign_positive(x: jax.Array) -> jax.Array:
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    return (bits >> 31) == 0


# ---------------------------------------------------------------------------
# device kernels
# ---------------------------------------------------------------------------


#: two-means segment-chunk budget: the [chunk, 12, sd] sample gather is
#: the level step's biggest temporary once many trees grow in one group
_TWO_MEANS_CHUNK_BYTES = 256 << 20


def _two_means(metric, dims, rows, extras, hnorms, perm, seg_start, seg_len, keys):
    """Vmapped two-means over all segments x A retry attempts
    (reference: src/distance/mod.rs:126-223).

    ``keys`` is [G, A] (attempt-MINOR); returns (normals [G, A, sd],
    aux [G, A]) in storage space.  Chunked along the segment axis
    (lax.map) so the [C, A, 12, sd] sample gather stays bounded, and the
    attempt axis is batched INSIDE each chunk so the stacked result is
    already attempt-minor — a global [A, G, sd] -> [G, A, sd] transpose
    measured a 3.08G HLO copy at 1M x 768, and any [*, A(=4)]-minor
    array costs 32x lane padding on TPU.
    """
    p_cap = perm.shape[0]
    g_cap = seg_start.shape[0]
    sd = rows.shape[1]
    A = keys.shape[1]

    def sample_one(start, ln, key):
        kc, ks = jax.random.split(key)
        ln_safe = jnp.maximum(ln, 2)
        i = jax.random.randint(kc, (), 0, ln_safe)
        j = jax.random.randint(jax.random.fold_in(kc, 1), (), 0, ln_safe - 1)
        j = jnp.where(j >= i, j + 1, j)
        samp = jax.random.randint(ks, (10,), 0, ln_safe)
        idx = jnp.concatenate([jnp.stack([i, j]), samp])
        pos = start + jnp.minimum(idx, jnp.maximum(ln - 1, 0))
        return perm[jnp.minimum(pos, p_cap - 1)]

    def chunk_fn(args):
        ss_c, sl_c, keys_c = args  # [C], [C], [C, A]
        slots = jax.vmap(
            jax.vmap(sample_one, in_axes=(None, None, 0))
        )(ss_c, sl_c, keys_c)  # [C, A, 12]
        srows = rows[slots]  # [C, A, 12, sd]
        sex = extras[slots]  # [C, A, 12]
        shn = hnorms[slots]  # [C, A, 12]
        return jax.vmap(
            lambda sr, se, sh: _two_means_core(metric, dims, sr, se, sh),
            in_axes=1,
            out_axes=1,
        )(srows, sex, shn)  # [C, A, sd], [C, A]

    raw = max(_TWO_MEANS_CHUNK_BYTES // (A * 12 * sd * 4), 256)
    # largest pow2 <= raw: g_cap is always a pow2, so the chunk divides
    # it exactly and the stacked map output IS the result — a
    # non-divisible chunk forced a [:g_cap] slice COPY of the whole
    # attempts table (1.5G at g_cap=131072 x 768, measured)
    chunk = 1
    while chunk * 2 <= raw:
        chunk *= 2
    if g_cap <= chunk:
        return chunk_fn((seg_start, seg_len, keys))
    n_chunks = -(-g_cap // chunk)
    pad = n_chunks * chunk - g_cap
    ss_p = jnp.concatenate([seg_start, jnp.zeros(pad, seg_start.dtype)])
    sl_p = jnp.concatenate([seg_len, jnp.zeros(pad, seg_len.dtype)])
    keys_p = jnp.concatenate([keys, keys[:pad]]) if pad else keys
    normals, aux = jax.lax.map(
        chunk_fn,
        (
            ss_p.reshape(n_chunks, chunk),
            sl_p.reshape(n_chunks, chunk),
            keys_p.reshape(n_chunks, chunk, A),
        ),
    )
    return (
        normals.reshape(n_chunks * chunk, A, -1)[:g_cap],
        aux.reshape(n_chunks * chunk, A)[:g_cap],
    )


def _two_means_core(metric, dims, srows, sex, shn):
    """Two-means refinement given pre-gathered samples [G, 12, ...].

    Sample row 0/1 are the centroid seeds, rows 2..11 the refinement
    draws (reference: src/distance/mod.rs:126-223).  Shared by the
    single-chip builder (contiguous-segment sampling) and the sharded
    builder (hash-based segmented-argmax sampling, parallel/build.py).
    """
    tv = metric.tm_decode(srows, dims)  # [G, 12, dt] float32 training space

    p, q = tv[:, 0], tv[:, 1]
    pe, qe = sex[:, 0], sex[:, 1]
    if metric.tm_cosine:
        p, pe = metric.tm_normalize(p, pe)
        q, qe = metric.tm_normalize(q, qe)
    ph = metric.tm_init(p, pe)
    qh = metric.tm_init(q, qe)
    ic = jnp.ones(p.shape[0], jnp.float32)
    jc = jnp.ones(p.shape[0], jnp.float32)

    def body(t, st):
        p, pe, ph, q, qe, qh, ic, jc = st
        k = jnp.take(tv, 2 + t, axis=1)
        ke = jnp.take(sex, 2 + t, axis=1)
        kh = jnp.take(shn, 2 + t, axis=1)
        di = ic * metric.tm_nonbuilt(p, pe, ph, k, ke, kh)
        dj = jc * metric.tm_nonbuilt(q, qe, qh, k, ke, kh)
        if metric.tm_cosine:
            norm = metric.tm_norm(k, ke)
        else:
            norm = jnp.ones_like(di)
        ok = ~(jnp.isnan(norm) | (norm <= 0.0))
        nrm = jnp.where(ok, norm, 1.0)[:, None]
        # reference: src/distance/mod.rs:158-166 — `if di < dj {p} else if
        # dj < di {q}`: on an EXACT tie NEITHER centroid updates.  Ties are
        # common for BQ metrics whose training distances are small integers,
        # so the strict comparisons matter distributionally there.
        updp = ok & (di < dj)
        updq = ok & (dj < di)
        newp = (p * ic[:, None] + k / nrm) / (ic[:, None] + 1.0)
        newq = (q * jc[:, None] + k / nrm) / (jc[:, None] + 1.0)
        php = metric.tm_init(newp, pe)
        qhq = metric.tm_init(newq, qe)
        p = jnp.where(updp[:, None], newp, p)
        ph = jnp.where(updp, php, ph)
        ic = ic + updp.astype(jnp.float32)
        q = jnp.where(updq[:, None], newq, q)
        qh = jnp.where(updq, qhq, qh)
        jc = jc + updq.astype(jnp.float32)
        return (p, pe, ph, q, qe, qh, ic, jc)

    p, pe, ph, q, qe, qh, ic, jc = jax.lax.fori_loop(
        0, 10, body, (p, pe, ph, q, qe, qh, ic, jc)
    )
    return metric.finalize_split(p, pe, q, qe)


def _margins_chunked(metric, rows, extras, perm, item_seg, normals, aux):
    """margin of every item of `perm` against its segment's hyperplane."""
    p_cap = perm.shape[0]
    chunk = _margin_chunk(p_cap, int(rows.shape[1]))
    idx = jnp.arange(p_cap, dtype=jnp.int32).reshape(-1, chunk)

    def chunk_fn(c):
        sl = perm[c]
        sg = item_seg[c]
        v = rows[sl]
        n = normals[sg]
        base = metric.base_dot(n, v)
        qf = extras[sl] if metric.has_extra else 1.0
        return base + aux[sg] * qf

    return jax.lax.map(chunk_fn, idx).reshape(p_cap)


def _margins_all_attempts(
    metric, rows, extras, perm, item_cseg_mono, normals_t, aux_t, seg_min_len=1
):
    """[A, p_cap] margins for A retry attempts in ONE pass over the rows.

    The row gather ([p_cap, d] — GBs at 1M+) dominates a margin pass and
    is identical for every attempt; the per-attempt work is only the
    [A]-wide normal gather + dot.  This is what lets the imbalance-retry
    rule run all attempts at once instead of re-reading the corpus per
    retry (measured 3.15 average full-frontier attempts per level).

    ``item_cseg_mono`` must be MONOTONE non-decreasing along lanes
    (compact split-segment ids spread by cummax — _level_core): each
    chunk then touches only a RANGE of ≤ chunk/seg_min_len + 2 compact
    segments, so the per-chunk normals come from one small
    dynamic-slice window (VMEM-resident) instead of a per-lane [A·sd]
    HBM gather.  The windowing cut the measured margin pass ~4x at
    33.5M lanes x 100-d (the per-lane normal gather was 1600 B/lane —
    128x redundant at ~128-lane segments — and ran at HBM random-gather
    speed).  Lane values are bit-identical either way.

    The attempt tables arrive TRANSPOSED — normals_t [f_cap, A, sd],
    aux_t [f_cap, A] — so the window fetch is a leading-axis slice,
    and the chunk result is returned flattened [chunk*A]: any array
    whose MINOR dim is A(=4) costs 32x lane padding (a stacked
    [n_chunks, A, chunk] map output: 8.00G for a 268MB array; a
    [p_cap, A] reassembly temp: same) — each a measured compile-time
    HBM OOM at 1M x 768 x 12 trees.  So each chunk's RESULT is
    transposed to attempt-MAJOR while small, and every global array
    keeps a large minor dim."""
    p_cap = perm.shape[0]
    f_cap, A, sd = normals_t.shape
    chunk = _margin_chunk(p_cap, int(rows.shape[1]), A)
    # compact-segment window per chunk: split segments hold more than
    # seg_min_len-1 items, so a chunk of lanes spans at most
    # chunk/seg_min_len + 2 compact ids (monotone ids; +2 for the
    # straddling first/last segments)
    w = min(chunk // max(int(seg_min_len), 1) + 2, f_cap)
    n_chunks = p_cap // chunk
    offs = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    normals_f = normals_t.reshape(f_cap, A * sd)

    # sub-tile the per-lane [A·sd] window reads: at full chunk width the
    # gathered [chunk, A, sd] normals table is a ~420MB HBM temp (read+
    # written once per chunk — measured ~1.7s/level at 33.5M x 100); at
    # 32k lanes it is ~52MB, VMEM-class, and fuses
    sub = min(32768, chunk)
    nsub = chunk // sub

    def chunk_fn(off):
        # scalar-offset dynamic slices, NOT index-array gathers: a
        # perm[c]-style fetch of contiguous lanes compiled to a per-row
        # gather (~10-38 ns/row on chip — ~0.7s/level of pure overhead
        # at 33.5M lanes); true slices stream
        sl = jax.lax.dynamic_slice(perm, (off,), (chunk,))
        sg = jax.lax.dynamic_slice(item_cseg_mono, (off,), (chunk,))
        v = rows[sl]  # [chunk, sd] — once for all attempts
        qf = extras[sl] if metric.has_extra else jnp.ones(chunk, jnp.float32)
        c0 = jnp.minimum(sg[0], f_cap - w)
        n_win = jax.lax.dynamic_slice(normals_f, (c0, 0), (w, A * sd))
        a_win = jax.lax.dynamic_slice(aux_t, (c0, 0), (w, A))
        lid = sg - c0  # [chunk] local window ids, < w by construction

        def sub_fn(args):
            vs, ls, qs = args  # [sub, sd], [sub], [sub]
            n = n_win[ls].reshape(sub, A, sd)
            base = jax.vmap(metric.base_dot, in_axes=(1, None))(n, vs)
            return base + a_win[ls].T * qs  # [A, sub]

        out = jax.lax.map(
            sub_fn,
            (
                v.reshape(nsub, sub, sd),
                lid.reshape(nsub, sub),
                qf.reshape(nsub, sub),
            ),
        )  # [nsub, A, sub]
        return out.transpose(1, 0, 2).reshape(A * chunk)  # attempt-major

    out = jax.lax.map(chunk_fn, offs)  # [n_chunks, A*chunk]
    return (
        out.reshape(n_chunks, A, chunk)
        .transpose(1, 0, 2)
        .reshape(A, p_cap)
    )


def _level_core(
    metric,
    dims,
    rows,
    extras,
    hnorms,
    perm,
    seg_start,
    seg_len,
    seg_split,
    key,
    f_cap=None,
    seg_min_len=1,
):
    """One build level over the whole frontier.  See module docstring.

    ``f_cap`` (static) bounds the number of SPLIT segments this level:
    the frontier list holds every node created so far (finished
    segments stay for monotone sort keys), so g_cap reaches the final
    node-count bound (2M at 1.18M x 100 x 25) while the segments that
    actually split per level are orders of magnitude fewer.  two-means
    sampling — [*, A, 12, sd] gathers, THE per-level traffic hog — and
    the per-attempt selection tables therefore run over a compacted
    [f_cap] prefix of the split segments (host picks a pow4 rung ≥ the
    exact per-level split count it already tracks); counts are
    scattered back to the [g_cap] frame.  Values are pointwise
    identical to the full-frame formulation (same per-(segment,
    attempt) threefry keys; golden build tests pin byte equality).
    """
    p_cap = perm.shape[0]
    g_cap = seg_start.shape[0]
    if f_cap is None:
        f_cap = g_cap
    # lane -> segment id without the 16.7M-lane binary search: one mark
    # per segment start, then a cumsum (identical to
    # searchsorted(seg_start, pos, 'right') - 1 for sorted starts,
    # including ties from empty/padding segments)
    mark = jnp.zeros(p_cap + 1, jnp.int32).at[
        jnp.minimum(seg_start, p_cap)
    ].add(1, mode="drop")
    item_seg = jnp.clip(jnp.cumsum(mark[:p_cap]) - 1, 0, g_cap - 1).astype(
        jnp.int32
    )

    # compact split-segment frame: sidx[c] = global id of the c-th split
    # segment (ascending), inv[global] = compact id (split segments only)
    (sidx,) = jnp.nonzero(seg_split, size=f_cap, fill_value=0)
    sidx = sidx.astype(jnp.int32)
    n_split = jnp.sum(seg_split.astype(jnp.int32))
    c_iota = jnp.arange(f_cap, dtype=jnp.int32)
    valid_c = c_iota < n_split
    inv = (
        jnp.zeros(g_cap, jnp.int32)
        .at[jnp.where(valid_c, sidx, g_cap)]
        .set(c_iota, mode="drop")
    )
    item_cseg = inv[item_seg]  # [p_cap] compact id (junk for non-split)
    ss_c = seg_start[sidx]
    sl_c = seg_len[sidx]

    def imbalance_c(left_cnt):
        n = sl_c.astype(jnp.float32)
        f = jnp.where(n > 0, left_cnt.astype(jnp.float32) / jnp.where(n > 0, n, 1.0), 0.5)
        return jnp.maximum(f, 1.0 - f)

    # all 4 imbalance-retry attempts in one frontier pass: two_means is
    # sample-cheap per attempt and the margin pass shares its row
    # gather (_margins_all_attempts); per segment the FIRST attempt
    # under 0.95 wins — pointwise identical to the sequential retry
    # loop this replaces (same per-(segment, attempt) threefry keys),
    # which re-read the whole corpus ~3.15x per level on chip.
    A = 4

    # per-(segment, attempt) keys: fold_in(fold_in(key, global_seg_id),
    # attempt) — the GLOBAL id keeps the stream identical to the
    # full-frame formulation.  The attempt axis stays MINOR end to end
    # ([f_cap, A, ...]) — see _two_means and _margins_all_attempts for
    # the measured layout hazards
    keys_a = jax.vmap(
        lambda i: jax.vmap(
            lambda a: jax.random.fold_in(jax.random.fold_in(key, i), a)
        )(jnp.arange(A, dtype=jnp.int32))
    )(sidx)  # [f_cap, A]
    normals_t, aux_t = _two_means(
        metric, dims, rows, extras, hnorms, perm, ss_c, sl_c, keys_a
    )
    # monotone compact ids for the margin pass's windowed normal fetch:
    # non-split lanes inherit the previous split id (their margins are
    # junk either way — every consumer gates on seg_split)
    item_cseg_mono = jax.lax.cummax(
        jnp.where(seg_split[item_seg], item_cseg, 0)
    )
    margins_k = _margins_all_attempts(
        metric, rows, extras, perm, item_cseg_mono, normals_t, aux_t,
        seg_min_len=seg_min_len,
    )
    # per-attempt left counts over CONTIGUOUS segment spans: one global
    # cumsum per attempt + two boundary gathers at the f_cap frame.
    # scatter-free by design — every batched-scatter formulation of
    # these counts eventually materialized a 32x-padded s32[p_cap, A]
    # updates copy on TPU (8.0G at p_pad=16.7M x 768; 16.0G at
    # p_pad=33.5M x 100 when XLA merged the four scatters into one)
    c_starts = jnp.clip(ss_c, 0, p_cap - 1)
    c_ends = jnp.clip(ss_c + sl_c - 1, 0, p_cap - 1)

    def count_one(m):
        x = (~_sign_positive(m)).astype(jnp.int32)
        s = jnp.cumsum(x)
        cnt = s[c_ends] - s[c_starts] + x[c_starts]
        return jnp.where(sl_c > 0, cnt, 0)

    left_cnt_k = jax.vmap(count_one)(margins_k)  # [A, f_cap]
    imb_k = jax.vmap(imbalance_c)(left_cnt_k)
    settled_k = imb_k < 0.95
    sel = jnp.where(
        jnp.any(settled_k, axis=0),
        jnp.argmax(settled_k, axis=0),
        A - 1,
    ).astype(jnp.int32)  # [f_cap]
    normals = jnp.take_along_axis(normals_t, sel[:, None, None], axis=1)[:, 0]
    aux_c = jnp.take_along_axis(aux_t, sel[:, None], axis=1)[:, 0]
    left_cnt_c = jnp.take_along_axis(left_cnt_k, sel[None, :], axis=0)[0]
    # chosen side via an explicit 4-way margin select: materializing the
    # [A, p_cap] pred table cost a 2G padded copy; these selects fuse
    sel_item = sel[item_cseg]  # [p_cap]
    margin_sel = margins_k[A - 1]
    for att in range(A - 2, -1, -1):
        margin_sel = jnp.where(sel_item == att, margins_k[att], margin_sel)
    side = _sign_positive(margin_sel)
    att_n = jnp.max(jnp.where(valid_c, sel, 0)) + 1

    # random-split fallback past 0.99 imbalance (reference
    # src/writer.rs:1218-1233), computed ENTIRELY in the compact frame:
    # the host consumes compact per-level arrays (a [f_cap]-sized fetch
    # instead of [g_cap] — g_cap reaches 2M at 1.18M x 25 while f_cap is
    # the actual split count's rung), and only the i32 counts are
    # scattered back for the device frontier-layout update.
    none_c = valid_c & (imbalance_c(left_cnt_c) > 0.99)
    rnd = jax.random.bernoulli(jax.random.fold_in(key, 0x5EED), 0.5, (p_cap,))
    none_lane = seg_split[item_seg] & none_c[item_cseg]
    side = jnp.where(none_lane, rnd, side)
    # recount left sides for fallback segments over their contiguous
    # spans (same cumsum trick as count_one; scatter-free)
    x_rnd = (~side).astype(jnp.int32)
    s_rnd = jnp.cumsum(x_rnd)
    cnt_rnd = s_rnd[c_ends] - s_rnd[c_starts] + x_rnd[c_starts]
    left_cnt_c = jnp.where(none_c, jnp.where(sl_c > 0, cnt_rnd, 0), left_cnt_c)

    scat = jnp.where(valid_c, sidx, g_cap)
    left_cnt = (
        jnp.zeros(g_cap, left_cnt_c.dtype).at[scat].set(left_cnt_c, mode="drop")
    )

    # stable within-segment partition WITHOUT a 16.7M-lane sort: the
    # stable argsort of (segment, side) equals seg_start[seg] + rank,
    # where rank counts same-side lanes earlier in the segment (left
    # lanes first).  Two global cumsums + two gathers + one scatter —
    # byte-identical layout to the argsort (tests pin golden builds).
    side_eff = jnp.where(seg_split[item_seg], side, False)
    left_lane = (~side_eff).astype(jnp.int32)
    right_lane = side_eff.astype(jnp.int32)
    ex_left = jnp.cumsum(left_lane) - left_lane  # lefts strictly before
    ex_right = jnp.cumsum(right_lane) - right_lane
    seg_pos = jnp.minimum(seg_start[item_seg], p_cap - 1)
    rank = jnp.where(
        side_eff,
        left_cnt[item_seg] + (ex_right - ex_right[seg_pos]),
        ex_left - ex_left[seg_pos],
    )
    new_pos = seg_start[item_seg] + rank
    new_perm = (
        jnp.zeros_like(perm)
        .at[new_pos]
        .set(perm, mode="drop", unique_indices=True)
    )
    return new_perm, left_cnt, left_cnt_c, none_c, normals, aux_c, att_n, n_split


_level_step = functools.partial(
    jax.jit, static_argnames=("metric", "dims", "f_cap", "seg_min_len")
)(_level_core)


def _level_body(
    metric,
    dims,
    split_after,
    rows,
    extras,
    hnorms,
    perm,
    seg_start,
    seg_len,
    seg_split,
    g_live,
    data_end,
    key,
    f_cap=None,
):
    """Level step + device-side frontier layout update.

    The host-driven loop re-uploaded the [g_cap] segment arrays every
    level (~tens of MB per level through the dev tunnel at 1M+ scale);
    here the partition layout for the next level is derived ON DEVICE —
    split segments are replaced in place by their two children, finished
    segments carry over — so the frontier state never leaves the chip.
    The host replays the identical update in numpy from the (downloaded)
    compact per-level arrays to do its bookkeeping (node-id allocation,
    split records, pending leaves); `tests/test_build.py` pins the two
    layouts against each other byte-for-byte.
    """
    g_cap = seg_start.shape[0]
    (
        new_perm, left_cnt, left_cnt_c, none_c, normals, aux_c, att_n, n_split,
    ) = _level_core(
        metric, dims, rows, extras, hnorms, perm, seg_start, seg_len,
        seg_split, key, f_cap=f_cap, seg_min_len=split_after + 1,
    )

    g_iota = jnp.arange(g_cap, dtype=jnp.int32)
    live = g_iota < g_live
    split_mask = seg_split & live
    ns_pre = jnp.cumsum(split_mask.astype(jnp.int32)) - split_mask
    pos = g_iota + ns_pre  # output position of segment i (strictly increasing)
    new_g = g_live + jnp.sum(split_mask.astype(jnp.int32))
    src = jnp.searchsorted(pos, g_iota, side="right").astype(jnp.int32) - 1
    src_c = jnp.clip(src, 0, g_cap - 1)
    is_right = (g_iota - pos[src_c] == 1) & split_mask[src_c]
    lc = left_cnt[src_c]
    st = seg_start[src_c]
    ln = seg_len[src_c]
    out_start = jnp.where(is_right, st + lc, st)
    out_len = jnp.where(split_mask[src_c], jnp.where(is_right, ln - lc, lc), ln)
    out_split = split_mask[src_c] & (out_len > split_after)
    valid = g_iota < new_g
    ss2 = jnp.where(valid, out_start, data_end).astype(seg_start.dtype)
    sl2 = jnp.where(valid, out_len, 0).astype(seg_len.dtype)
    sp2 = jnp.where(valid, out_split, False)
    return (
        new_perm, ss2, sl2, sp2, new_g,
        left_cnt_c, none_c, normals, aux_c, att_n, n_split,
    )


_level_step_dev = functools.partial(
    jax.jit, static_argnames=("metric", "dims", "split_after", "f_cap")
)(_level_body)


@functools.partial(
    jax.jit, static_argnames=("metric", "dims", "split_after", "f_cap", "k")
)
def _grow_group(
    metric,
    dims,
    split_after,
    rows,
    extras,
    hnorms,
    perm,
    seg_start,
    seg_len,
    seg_split,
    g_live,
    data_end,
    key,
    level0,
    f_cap,
    k,
):
    """`k` fused build levels under one `lax.scan` — ONE dispatch and ONE
    compact fetch per group instead of per level.

    Through the dev tunnel every host<->device round trip costs ~30ms
    nominally and SECONDS in degraded windows; a 1.18M x 25 build runs
    ~27 levels, so the per-level fetch + staging upload made the tunnel,
    not the device, the build's critical path (measured: 177s of `sync`
    across 12 levels in a degraded window vs 0.3s warm for the same
    work).  The scan body is `_level_body` verbatim (the per-level keys
    fold the GLOBAL level index exactly like the unfused loop, so builds
    are byte-identical — the golden tests pin this); `f_cap` is a single
    rung that upper-bounds every level in the group: ns can at most
    double per level and never exceeds split_lanes/(split_after+1), both
    of which the host enforces when sizing the group, so the compact
    nonzero frame can never truncate.

    Levels past the last real split are no-ops by construction (no
    segment splits, the permutation scatter is the identity), so a group
    may safely overshoot the forest's final depth.
    """

    def body(carry, lvl):
        perm, ss, sl, sp, g = carry
        level_key = jax.random.fold_in(key, lvl)
        (
            new_perm, ss2, sl2, sp2, new_g,
            left_cnt_c, none_c, normals, aux_c, att_n, n_split,
        ) = _level_body(
            metric, dims, split_after, rows, extras, hnorms,
            perm, ss, sl, sp, g, data_end, level_key, f_cap=f_cap,
        )
        return (new_perm, ss2, sl2, sp2, new_g), (
            left_cnt_c, none_c, normals, aux_c, att_n, n_split,
        )

    levels = level0 + jnp.arange(k, dtype=jnp.int32)
    carry, outs = jax.lax.scan(
        body, (perm, seg_start, seg_len, seg_split, g_live), levels
    )
    return carry, outs


def _writeback_leaves(ctx, slot_to_id, vals_np, spans) -> None:
    """Bulk leaf write-back: `spans` is a list of (node_id, start, end)
    whose lanes, concatenated in ascending-start order, are exactly
    `vals_np` (row indices).  One lexsort over all lanes replaces the
    per-leaf Python loop."""
    if not spans:
        return
    nids = np.fromiter((p[0] for p in spans), np.int64, len(spans))
    starts = np.fromiter((p[1] for p in spans), np.int64, len(spans))
    ends = np.fromiter((p[2] for p in spans), np.int64, len(spans))
    order = np.argsort(starts, kind="stable")
    nids = nids[order]
    lens = (ends - starts)[order]
    assert int(lens.sum()) == len(vals_np), "leaf spans must tile the flushed lanes"
    ids_all = slot_to_id[vals_np].astype(np.uint32)
    span_of = np.repeat(np.arange(len(nids), dtype=np.int64), lens)
    sorted_ids = ids_all[np.lexsort((ids_all, span_of))]
    pieces = np.split(sorted_ids, np.cumsum(lens)[:-1])
    ctx.forest.put_leaves(nids, pieces)


@functools.partial(jax.jit, static_argnames=("p_pad2", "settled_pad"))
def _compact_lanes(perm, ss_c, sl_c, off_c, old_end, p_pad2, settled_pad):
    """Compact the ACTIVE (still-splitting) lanes of `perm` to the front
    of a fresh, smaller lane frame, and gather the settled lanes (in
    ascending old-frame order) for the host leaf flush.

    Late build levels are dominated by dead weight: every per-level op
    (margin pass, cumsum counts, partition scatter) runs over the FULL
    [p_pad] frame, but once a segment stops splitting its lanes never
    move again.  Shrinking the frame as lanes settle makes per-level
    cost track the ACTIVE lane count instead of the total (the
    reference's recursion gets this for free — each recursive call only
    sees its own subset, src/writer.rs:1167-1261).

    `ss_c`/`sl_c`/`off_c` are the active segments' old starts, lengths
    and new (exclusive-cumsum) starts, ascending, padded to a small
    rung with start=old_end/len=0 so padding lanes resolve harmlessly.
    Returns (new_perm [p_pad2], settled_vals [settled_pad]) — settled
    lanes beyond their true count are junk and sliced off by the host.
    """
    p_old = perm.shape[0]
    r_c = ss_c.shape[0]
    # new-frame lane -> compact segment (same mark/cumsum trick as
    # _level_core's item_seg: off_c is sorted; padding segments carry
    # off = p_pad2 so they never mark)
    mark = jnp.zeros(p_pad2 + 1, jnp.int32).at[
        jnp.minimum(off_c, p_pad2)
    ].add(1, mode="drop")
    lane_seg = jnp.clip(
        jnp.cumsum(mark[:p_pad2]) - 1, 0, r_c - 1
    ).astype(jnp.int32)
    iota2 = jnp.arange(p_pad2, dtype=jnp.int32)
    gidx = ss_c[lane_seg] + (iota2 - off_c[lane_seg])
    new_perm = perm[jnp.clip(gidx, 0, p_old - 1)]

    # settled lanes ascending: interval-mark the active spans, invert
    am = (
        jnp.zeros(p_old + 1, jnp.int32)
        .at[jnp.minimum(ss_c, p_old)]
        .add(jnp.where(sl_c > 0, 1, 0), mode="drop")
        .at[jnp.minimum(ss_c + sl_c, p_old)]
        .add(jnp.where(sl_c > 0, -1, 0), mode="drop")
    )
    iota = jnp.arange(p_old, dtype=jnp.int32)
    settled = (jnp.cumsum(am[:p_old]) == 0) & (iota < old_end)
    exs = jnp.cumsum(settled.astype(jnp.int32)) - settled
    sidx = (
        jnp.zeros(settled_pad, jnp.int32)
        .at[jnp.where(settled, exs, settled_pad)]
        .set(iota, mode="drop")
    )
    settled_vals = perm[sidx]
    return new_perm, settled_vals


# ---------------------------------------------------------------------------
# host orchestration
# ---------------------------------------------------------------------------


@dataclass
class BuildContext:
    """Everything the build engine needs for one index build."""

    metric: type[Metric]
    dims: int
    split_after: int
    #: device item matrix [cap, sd] — None in streaming mode, where the
    #: matrix lives on the HOST and per-batch slot subsets are uploaded
    #: on demand (the HBM analog of the reference's fit_in_memory,
    #: src/writer.rs:1536-1584)
    rows_dev: jax.Array | None
    extras_dev: jax.Array | None
    hnorms_dev: jax.Array | None
    slot_to_id: np.ndarray  # [cap] int64, -1 for free slots
    forest: Forest
    alloc: NodeIdAllocator
    cancel: Callable[[], bool] = lambda: False
    #: True iff the caller registered a REAL cancel callback (not the
    #: never-cancel default): bounds each fused grow group's predicted
    #: wall time to ~_CANCEL_BOUND_S so cancellation stays responsive
    cancel_active: bool = False
    #: memory budget expressed as max items per tree-building batch
    budget_items: int | None = None
    #: host master copies, present only in streaming mode
    rows_np: np.ndarray | None = None
    extras_np: np.ndarray | None = None
    hnorms_np: np.ndarray | None = None
    #: staged split-plane chunks: matrices [n_i, sd] (numpy for committed
    #: rows, DEVICE arrays for freshly built levels — they are only pulled
    #: to the host once, at finalize, because every device->host transfer
    #: through the dev tunnel costs ~30ms + ~10MB/s)
    staging_normals: list = field(default_factory=list)
    staging_aux: list = field(default_factory=list)
    staging_rows: int = 0
    on_items_indexed: Callable[[int], None] = lambda n: None
    #: device staging cache: chunks already concatenated on device
    _staging_dev: object = field(default=None, repr=False)
    _staging_dev_chunks: int = field(default=0, repr=False)
    #: sorted (ids, slots) lookup, built lazily once per build
    _slot_lut: object = field(default=None, repr=False)

    def check_cancel(self) -> None:
        if self.cancel():
            from .errors import BuildCancelled

            raise BuildCancelled()

    @property
    def streaming(self) -> bool:
        return self.rows_dev is None

    @property
    def _sd(self) -> int:
        return self.metric.storage_dim(self.dims)

    def device_view(self, slots: np.ndarray):
        """(rows, extras, hnorms, remap) for a global-slot subset.

        Resident mode returns the full device arrays and an identity
        remap; streaming mode uploads exactly the unique rows referenced
        by `slots` and returns a global->local remapper.
        """
        if not self.streaming:
            return (
                self.rows_dev,
                self.extras_dev,
                self.hnorms_dev,
                lambda g: np.asarray(g, np.int32),
                self.slot_to_id,
            )
        uniq = np.unique(np.asarray(slots, np.int64))
        from .models.items import _staged_rows_put

        rows = _staged_rows_put(self.rows_np[uniq])
        extras = jnp.asarray(self.extras_np[uniq])
        hnorms = jnp.asarray(self.hnorms_np[uniq])

        def remap(g):
            return np.searchsorted(uniq, np.asarray(g, np.int64)).astype(np.int32)

        return rows, extras, hnorms, remap, self.slot_to_id[uniq]

    def stage_chunk(self, matrix, aux: np.ndarray, n_valid: int | None = None) -> int:
        """Append a chunk of normal rows; returns the base row index.

        ``n_valid`` marks the logical row count when `matrix` carries
        pow2 shape padding (the fused grow loop pads its per-group
        staging gather so successive builds reuse compiled shapes —
        data-dependent gather lengths compiled a fresh XLA program per
        build, ~5s each through the relay).  Padding rows are junk and
        sliced away by every consumer."""
        n = int(matrix.shape[0]) if n_valid is None else int(n_valid)
        base = self.staging_rows
        if hasattr(matrix, "copy_to_host_async"):
            # start the device->host copy now so the end-of-build
            # repack_normals pull (staging_matrix_np) overlaps with the
            # remaining grow dispatches instead of serializing after
            # them (~178MB at 1.18M x 100 through the tunnel)
            try:
                matrix.copy_to_host_async()
            except Exception:
                pass
        self.staging_normals.append((matrix, n))
        self.staging_aux.append(np.asarray(aux, np.float32))
        self.staging_rows += n
        return base

    @staticmethod
    def _chunk_mat_n(c):
        return c if isinstance(c, tuple) else (c, int(c.shape[0]))

    def staging_matrix_np(self) -> np.ndarray:
        sd = self._sd
        np_dtype = np.uint32 if self.metric.binary else np.float32
        if not self.staging_normals:
            return np.zeros((0, sd), np_dtype)
        parts = []
        for c in self.staging_normals:
            m, n = self._chunk_mat_n(c)
            a = np.asarray(m)
            parts.append(a[:n] if n != a.shape[0] else a)
        return np.concatenate(parts)

    def staging_aux_np(self) -> np.ndarray:
        if not self.staging_aux:
            return np.zeros(0, np.float32)
        return np.concatenate([np.asarray(c) for c in self.staging_aux])

    def staging_matrix_dev(self):
        """Device staging matrix, cached incrementally: only chunks staged
        since the last call are uploaded/concatenated (budgeted builds call
        this once per stack iteration — rebuilding the full matrix each
        time would be quadratic host->device traffic through the tunnel)."""
        sd = self._sd
        np_dtype = np.uint32 if self.metric.binary else np.float32
        if not self.staging_normals:
            return jnp.zeros((1, sd), np_dtype)
        n = len(self.staging_normals)

        def _dev(c):
            m, nv = self._chunk_mat_n(c)
            a = jnp.asarray(m)
            return a[:nv] if nv != a.shape[0] else a

        if self._staging_dev is None:
            new = [_dev(c) for c in self.staging_normals]
            self._staging_dev = new[0] if n == 1 else jnp.concatenate(new)
        elif self._staging_dev_chunks < n:
            new = [_dev(c) for c in self.staging_normals[self._staging_dev_chunks :]]
            self._staging_dev = jnp.concatenate([self._staging_dev, *new])
        self._staging_dev_chunks = n
        return self._staging_dev

    def ids_to_slots(self, ids: np.ndarray) -> np.ndarray:
        """Map item ids -> store slots via a lazily built sorted lookup.
        Raises on ids absent from the store instead of silently clamping
        to a wrong slot (that would mask index corruption)."""
        if self._slot_lut is None:
            live = np.nonzero(self.slot_to_id >= 0)[0]
            order = np.argsort(self.slot_to_id[live])
            self._slot_lut = (
                self.slot_to_id[live][order],
                live[order].astype(np.int32),
            )
        sorted_ids, sorted_slots = self._slot_lut
        ids64 = np.asarray(ids, np.int64)
        pos = np.searchsorted(sorted_ids, ids64)
        pos_c = np.minimum(pos, max(len(sorted_ids) - 1, 0))
        if len(sorted_ids) == 0 or not np.array_equal(sorted_ids[pos_c], ids64):
            raise KeyError("leaf references item ids absent from the store")
        return sorted_slots[pos_c]


def grow_trees(ctx: BuildContext, seeds: list[tuple[int, np.ndarray]], key) -> None:
    """Grow subtrees for every (node_id, item_slots) seed, all at once.

    Each seed becomes the root of a recursive split structure written
    into ctx.forest.  Seeds that already fit in a descendant must be
    handled by the caller.
    """
    global _dispatch_count
    seeds = [(nid, np.asarray(slots, dtype=np.int64)) for nid, slots in seeds]
    if not seeds:
        return
    import time as _time

    _timing_env = os.environ.get("ARROY_BUILD_TIMING", "")
    _timing = _timing_env in ("1", "2")
    _timing_levels = _timing_env == "2"
    _tt = {"dispatch": 0.0, "sync": 0.0, "stage": 0.0, "host": 0.0}
    _memdbg = os.environ.get("ARROY_MEM_DEBUG") == "1"

    def _mem_report(tag):
        # axon exposes no device.memory_stats(); enumerate JAX-held
        # buffers instead (excludes XLA program temps, which the
        # compile-time check already bounds)
        live = [a for a in jax.live_arrays() if a.nbytes >= 1 << 20]
        live.sort(key=lambda a: -a.nbytes)
        tot = sum(a.nbytes for a in jax.live_arrays())
        top = "  ".join(f"{a.shape}/{a.dtype}={a.nbytes >> 20}M" for a in live[:8])
        print(f"[memdbg {tag}] live={tot / (1 << 30):.2f}G  {top}", flush=True)
    _t_start = _time.perf_counter()
    total = int(sum(len(s) for _, s in seeds))
    chunk = _MARGIN_CHUNK
    # pow2 bucket: successive builds with similar sizes reuse compiled shapes
    p_pad = max(chunk, _next_pow2(total))

    # resident mode: identity view; streaming mode: upload just this
    # batch's unique rows and work in local indices
    all_slots = np.concatenate([sl for _, sl in seeds]) if seeds else np.empty(0)
    rows_dev, extras_dev, hnorms_dev, remap, slot_to_id = ctx.device_view(all_slots)

    perm_np = np.zeros(p_pad, dtype=np.int32)
    starts, lens, node_ids = [], [], []
    off = 0
    for nid, slots in seeds:
        perm_np[off : off + len(slots)] = remap(slots)
        starts.append(off)
        lens.append(len(slots))
        node_ids.append(nid)
        off += len(slots)

    perm = jnp.asarray(perm_np)
    seg_start = np.asarray(starts, dtype=np.int32)
    seg_len = np.asarray(lens, dtype=np.int32)
    seg_node = np.asarray(node_ids, dtype=np.int64)
    # split iff the segment holds more items than fit in a descendant
    seg_split = seg_len > ctx.split_after

    pending_leaves: list[tuple[int, int, int]] = []  # (node_id, start, end)
    #: (device settled-lane gather, spans, true count) from lane
    #: compactions, drained after the NEXT group's dispatch so the
    #: device->host copy rides under device compute
    deferred_flush: list = []
    for g in range(len(seg_len)):
        if not seg_split[g]:
            pending_leaves.append((int(seg_node[g]), int(seg_start[g]), int(seg_start[g] + seg_len[g])))

    # Pre-size the segment axis for the whole build: the frontier list at any
    # level holds every node created so far (finished segments stay in the
    # list to keep sort keys monotone), which is bounded by the final node
    # count ~ 4 * items/split_after.  One size -> one XLA compile for every
    # level of every tree.  Sized AT the bound, not above it: the
    # [g_cap, A, d] attempt tables scale with g_cap (3.2G per pow2 step
    # at 2M x 768), and a rare over-bound level just re-pads and
    # re-uploads the host frontier (the overflow branch below).
    g_cap_hint = _next_pow2(4 * total // max(ctx.split_after, 1) + len(seeds) + 64)

    data_end = int(seg_start[-1] + seg_len[-1]) if len(seg_len) else 0
    data_end_d = jnp.int32(max(data_end, 0))

    def _upload_state(g_cap: int):
        """Pad + upload the host frontier (level 0 and overflow re-bucket
        only — the per-level state lives on device, see _level_step_dev)."""
        g = len(seg_len)
        ss = np.full(g_cap, max(data_end, 0), dtype=np.int32)
        sl = np.zeros(g_cap, dtype=np.int32)
        sp = np.zeros(g_cap, dtype=bool)
        ss[:g] = seg_start
        sl[:g] = seg_len
        sp[:g] = seg_split
        return jnp.asarray(ss), jnp.asarray(sl), jnp.asarray(sp), jnp.int32(g)

    g_cap = max(256, g_cap_hint, _next_pow2(len(seg_len) + 1))
    ss_d = sl_d = sp_d = g_d = None
    level = 0
    #: EMA of seconds per (split-lane x level), learned from dispatched
    #: groups — drives the cancel-bound fuse depth below
    _cancel_rate: float | None = None
    #: levels fused per device dispatch (ARROY_GROW_FUSE=1 restores the
    #: per-level round-trip behaviour for debugging)
    _fuse_max = max(int(os.environ.get("ARROY_GROW_FUSE", "8")), 1)
    #: byte budget for one group's [f_cap]-frame attempt tables — k
    #: shrinks before the shared rung exceeds it
    _fuse_table_bytes = int(
        os.environ.get("ARROY_FUSE_TABLE_BYTES", 1 << 30)
    )
    sd_bytes = ctx._sd * 4
    while seg_split.any():
        ctx.check_cancel()
        if level >= _MAX_LEVELS:
            # flush whatever is left as oversized descendants (safety valve;
            # the reference would keep recursing on random splits instead)
            for g in np.nonzero(seg_split)[0]:
                pending_leaves.append(
                    (int(seg_node[g]), int(seg_start[g]), int(seg_start[g] + seg_len[g]))
                )
            break

        g = len(seg_len)
        ns_next = int(np.count_nonzero(seg_split))
        if ss_d is None or g + ns_next > g_cap:
            # first level, or the fixed bucket would overflow: re-pad and
            # re-upload the (authoritative) host frontier
            g_cap = max(g_cap, 256, _next_pow2(g + ns_next + 1))
            ss_d, sl_d, sp_d, g_d = _upload_state(g_cap)

        # fused-group sizing.  f_cap is ONE pow4 rung that upper-bounds the
        # split count of EVERY level in the group (ns at most doubles per
        # level and never exceeds split_lanes/(split_after+1) — both hard
        # bounds, so the compact nonzero frame cannot truncate); the fuse
        # depth k shrinks until the worst-case frontier growth fits g_cap
        # and the [f_cap]-frame attempt tables fit the byte budget.
        lanes_split = int(seg_len[seg_split[: len(seg_len)]].sum())
        ns_hard = max(lanes_split // (ctx.split_after + 1), 1)

        def _rung4(n: int) -> int:
            r = 256
            while r < n:
                r *= 4
            return min(r, g_cap)

        k = min(_fuse_max, max(_MAX_LEVELS - level, 1))
        while True:
            ns_bound = min(ns_next << (k - 1), ns_hard) if k > 1 else ns_next
            new_bound = (
                min((ns_next << k) - ns_next, k * ns_hard) if k > 1 else ns_next
            )
            r_k = _rung4(max(ns_bound, ns_next))
            tbl_bytes = r_k * 4 * sd_bytes + k * r_k * (sd_bytes + 16)
            if k == 1 or (
                g + new_bound <= g_cap and tbl_bytes <= _fuse_table_bytes
            ):
                break
            k -= 1

        # cancel-latency bound (VERDICT r4 weak #7): when the caller
        # registered a real cancel callback, bound each group's
        # PREDICTED wall time to ~_CANCEL_BOUND_S.  The first group runs
        # one level to learn the per-(split-lane x level) rate; later
        # groups fuse only as deep as the measured rate allows, floored
        # to a pow2 so the (k, f_cap)-keyed compile cache stays small.
        if ctx.cancel_active and k > 1:
            if _cancel_rate is None:
                k = 1
            else:
                fit = int(_CANCEL_BOUND_S / max(_cancel_rate * lanes_split, 1e-12))
                k = min(k, max(fit, 1))
                k = 1 << (k.bit_length() - 1)

        _dispatch_count += 1
        _tg0 = _clock()
        _t0 = _time.perf_counter() if _timing else 0.0
        (
            (perm, ss_d, sl_d, sp_d, g_d),
            (lc_k, none_k, normals_k, aux_k, att_k, nsplit_k),
        ) = _grow_group(
            ctx.metric,
            ctx.dims,
            ctx.split_after,
            rows_dev,
            extras_dev,
            hnorms_dev,
            perm,
            ss_d,
            sl_d,
            sp_d,
            g_d,
            data_end_d,
            key,
            jnp.int32(level),
            f_cap=r_k,
            k=k,
        )
        if _timing:
            # block first so "dispatch" = dispatch+device compute and
            # "sync" isolates the device->host transfer latency
            jax.block_until_ready(lc_k)
            _t1 = _time.perf_counter()
            _tt["dispatch"] += _t1 - _t0
        if _memdbg:
            _mem_report(f"level={level} g={g} g_cap={g_cap} k={k} R={r_k}")
        # ONE bundled compact fetch for the whole group (counts, fallback
        # flags, biases at the [k, f_cap] frame); the d-wide normals stay
        # on device and are staged as one device chunk per group
        lc_h, none_h, aux_h, att_h, nsplit_h = jax.device_get(
            (lc_k, none_k, aux_k, att_k, nsplit_k)
        )
        if ctx.cancel_active:
            # device_get blocked on the whole group: measure its wall
            # time and refresh the rate model (EMA; compile-laden early
            # samples decay within ~2 groups)
            _dt = _clock() - _tg0
            _new = _dt / max(k * max(lanes_split, 1), 1)
            _cancel_rate = (
                _new if _cancel_rate is None else 0.5 * (_cancel_rate + _new)
            )
        if _timing:
            _t2 = _time.perf_counter()
            _tt["sync"] += _t2 - _t1

        # drain compaction leaf flushes now that this group's outputs
        # landed: the async settled-lane copy has long since finished
        if deferred_flush:
            _tf0 = _time.perf_counter() if _timing else 0.0
            while deferred_flush:
                vals_dev, spans, tot = deferred_flush.pop(0)
                _writeback_leaves(ctx, slot_to_id, np.asarray(vals_dev)[:tot], spans)
            if _timing:
                _t2 = _time.perf_counter()
                _tt["flush"] = _tt.get("flush", 0.0) + _t2 - _tf0

        # host replay: bookkeeping for each fused level from its compact
        # row (ascending global split ids == compact order).  Ordering,
        # allocation sequence, pending-leaf content, and staged-row order
        # are byte-identical with the unfused formulation (the
        # golden-build tests pin this).
        group_base = ctx.staging_rows
        flat_pos: list[np.ndarray] = []
        aux_used: list[np.ndarray] = []
        staged_off = 0
        for i in range(k):
            if not seg_split.any():
                break  # surplus no-op levels past the last real split
            g = len(seg_len)
            split_mask = seg_split[:g]
            split_idx = np.nonzero(split_mask)[0]
            ns = len(split_idx)
            if ns != int(nsplit_h[i]):
                raise AssertionError(
                    f"device/host frontier desync at level {level}: "
                    f"host ns={ns} device ns={int(nsplit_h[i])}"
                )
            lc_arr = lc_h[i][:ns].astype(np.int64)
            none_split = none_h[i][:ns]
            use = ~none_split
            used_pos = np.nonzero(use)[0]
            row_of_split = np.full(ns, -1, np.int64)
            row_of_split[used_pos] = (
                group_base + staged_off + np.arange(len(used_pos))
            )
            staged_off += len(used_pos)
            flat_pos.append(i * r_k + used_pos)
            aux_used.append(aux_h[i][:ns][use])
            if _timing:
                _tt["attempts"] = _tt.get("attempts", 0.0) + float(att_h[i])
            if _timing_levels:
                import sys as _sys

                print(
                    f"  level {level}: g={g} ns={ns} R={r_k} k={k}"
                    + (f"  group dispatch {_t1 - _t0:.2f}s" if i == 0 else ""),
                    file=_sys.stderr,
                    flush=True,
                )

            ids = ctx.alloc.next_many(2 * ns)  # [l0, r0, l1, r1, ...]
            l_ids, r_ids = ids[0::2], ids[1::2]
            s_arr = seg_start[split_idx].astype(np.int64)
            ln_arr = seg_len[split_idx].astype(np.int64)
            ctx.forest.put_splits(seg_node[split_idx], l_ids, r_ids, row_of_split)

            ch_start = np.empty(2 * ns, np.int64)
            ch_start[0::2] = s_arr
            ch_start[1::2] = s_arr + lc_arr
            ch_len = np.empty(2 * ns, np.int64)
            ch_len[0::2] = lc_arr
            ch_len[1::2] = ln_arr - lc_arr
            ch_split = ch_len > ctx.split_after

            counts = np.where(split_mask, 2, 1)
            pos = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
            total_out = int(counts.sum())
            new_start = np.empty(total_out, np.int64)
            new_len = np.empty(total_out, np.int64)
            new_node = np.empty(total_out, np.int64)
            new_split = np.zeros(total_out, bool)
            keep = ~split_mask
            new_start[pos[keep]] = seg_start[:g][keep]
            new_len[pos[keep]] = seg_len[:g][keep]
            new_node[pos[keep]] = seg_node[:g][keep]
            ppos = pos[split_idx]
            new_start[ppos] = ch_start[0::2]
            new_start[ppos + 1] = ch_start[1::2]
            new_len[ppos] = ch_len[0::2]
            new_len[ppos + 1] = ch_len[1::2]
            new_node[ppos] = l_ids
            new_node[ppos + 1] = r_ids
            new_split[ppos] = ch_split[0::2]
            new_split[ppos + 1] = ch_split[1::2]

            leaf_children = np.nonzero(~ch_split)[0]
            ch_node = ids
            for j in leaf_children.tolist():
                pending_leaves.append(
                    (int(ch_node[j]), int(ch_start[j]), int(ch_start[j] + ch_len[j]))
                )
            indexed_now = int(ch_len[leaf_children].sum())

            seg_start = new_start.astype(np.int32)
            seg_len = new_len.astype(np.int32)
            seg_node = new_node
            seg_split = new_split
            level += 1
            if indexed_now:
                ctx.on_items_indexed(indexed_now)
        if _timing:
            _t3 = _time.perf_counter()
            _tt["host"] += _t3 - _t2

        # one lazy staging gather per group: used rows (non-fallback
        # splits) of every fused level, in (level, split-id) order — the
        # same staged-row order as the unfused per-level takes
        if staged_off:
            fp = np.concatenate(flat_pos)
            # pow2-pad the gather so successive builds reuse compiled
            # shapes (padding rows index 0 and are sliced off logically)
            p_len = max(_next_pow2(len(fp)), 256)
            fp_pad = np.zeros(p_len, np.int32)
            fp_pad[: len(fp)] = fp
            mat = jnp.take(
                normals_k.reshape((k * r_k,) + normals_k.shape[2:]),
                jnp.asarray(fp_pad),
                axis=0,
            )
            base = ctx.stage_chunk(
                mat, np.concatenate(aux_used), n_valid=staged_off
            )
            assert base == group_base
        if _timing:
            _tt["stage"] += _time.perf_counter() - _t3

        # --- active-lane compaction (see _compact_lanes) ----------------
        # Per-level cost scales with the lane/segment frame sizes, but
        # settled segments are dead weight: once the ACTIVE lanes fit a
        # frame half the size (and frames are big enough for the extra
        # dispatch+compile to pay), rebase onto a compacted frame and
        # flush the settled leaves early (async pull overlapped with the
        # next group's dispatch).  NOTE: the frame layout feeds the
        # per-level threefry lanes (fallback bernoulli) and the compact
        # segment ids, so compacted builds are a DIFFERENT (equally
        # valid) deterministic stream than uncompacted ones — goldens
        # pin the default; tests force tiny thresholds explicitly.
        act_total = int(seg_len[seg_split].sum()) if seg_split.any() else 0
        if (
            act_total
            and p_pad >= 2 * _COMPACT_MIN_LANES
            and max(_next_rung(act_total), chunk) <= p_pad // 2
        ):
            _tc0 = _time.perf_counter() if _timing else 0.0
            act = np.nonzero(seg_split)[0]
            ss_act = seg_start[act].astype(np.int64)
            sl_act = seg_len[act].astype(np.int64)
            n_act = len(act)
            off_act = np.concatenate([[0], np.cumsum(sl_act)[:-1]])
            new_end = int(sl_act.sum())
            p_pad2 = max(chunk, _next_rung(new_end))
            settled_total = data_end - new_end
            flush_spans = pending_leaves
            pending_leaves = []
            assert (
                sum(e - s for _, s, e in flush_spans) == settled_total
            ), "settled lanes must be exactly the pending leaf spans"
            r_c = max(_next_rung(n_act), 256)
            ss_pad = np.full(r_c, data_end, np.int32)
            sl_pad = np.zeros(r_c, np.int32)
            off_pad = np.full(r_c, p_pad2, np.int32)
            ss_pad[:n_act] = ss_act
            sl_pad[:n_act] = sl_act
            off_pad[:n_act] = off_act
            settled_pad = max(_next_rung(max(settled_total, 1)), 256)
            perm, settled_vals = _compact_lanes(
                perm,
                jnp.asarray(ss_pad),
                jnp.asarray(sl_pad),
                jnp.asarray(off_pad),
                jnp.int32(data_end),
                p_pad2=p_pad2,
                settled_pad=settled_pad,
            )
            if flush_spans:  # zero-LENGTH spans still need their leaf rows
                settled_vals.copy_to_host_async()
                deferred_flush.append((settled_vals, flush_spans, settled_total))
            # host frontier moves to the compacted frame
            seg_start = off_act.astype(np.int32)
            seg_len = sl_act.astype(np.int32)
            seg_node = seg_node[act]
            seg_split = np.ones(n_act, bool)
            data_end = new_end
            data_end_d = jnp.int32(new_end)
            p_pad = p_pad2
            g_cap = max(
                256,
                _next_rung(4 * new_end // max(ctx.split_after, 1) + n_act + 64),
            )
            ss_d = None  # re-upload the frontier at the new (smaller) g_cap
            if _timing:
                _tt["compact"] = (
                    _tt.get("compact", 0.0) + _time.perf_counter() - _tc0
                )

    # drain any leaf flush still in flight from a lane compaction
    if deferred_flush:
        _tf0 = _time.perf_counter() if _timing else 0.0
        while deferred_flush:
            vals_dev, spans, total = deferred_flush.pop(0)
            _writeback_leaves(ctx, slot_to_id, np.asarray(vals_dev)[:total], spans)
        if _timing:
            _tt["flush"] = _tt.get("flush", 0.0) + _time.perf_counter() - _tf0

    # bulk leaf write-back: the remaining pending spans tile
    # [0, data_end) of the CURRENT frame exactly (every live lane
    # settles in one leaf), so one gather + one lexsort replaces the
    # per-leaf Python loop (~590k iterations at 1.18M x 25)
    if pending_leaves:
        _tw0 = _time.perf_counter() if _timing else 0.0
        ends_max = max(e for _, _, e in pending_leaves)
        perm_final = np.asarray(perm)
        if _timing:
            _tw1 = _time.perf_counter()
            _tt["wb_pull"] = _tw1 - _tw0
        starts_chk = np.sort(
            np.fromiter((p[1] for p in pending_leaves), np.int64, len(pending_leaves))
        )
        ends_chk = np.sort(
            np.fromiter((p[2] for p in pending_leaves), np.int64, len(pending_leaves))
        )
        assert starts_chk[0] == 0 and np.all(
            starts_chk[1:] == ends_chk[:-1]
        ), "pending leaf spans must tile the permutation"
        _writeback_leaves(
            ctx, slot_to_id, perm_final[: int(ends_max)], pending_leaves
        )
        if _timing:
            _tt["wb_flush"] = _time.perf_counter() - _tw1

    if _timing:
        import sys as _sys

        _att = _tt.pop("attempts", 0.0)
        _tot = _time.perf_counter() - _t_start
        _wb = {k: _tt.pop(k) for k in list(_tt) if k.startswith("wb_")}
        print(
            f"grow[{len(seeds)} seeds, {total} lanes, {level} levels, "
            f"p_pad={p_pad}]: dispatch {_tt['dispatch']:.1f}s  "
            f"sync {_tt['sync']:.1f}s  stage {_tt['stage']:.1f}s  "
            f"host {_tt['host']:.1f}s  "
            f"compact {_tt.get('compact', 0.0):.1f}s  "
            f"flush {_tt.get('flush', 0.0):.1f}s  "
            f"leafwb {_tot - sum(_tt.values()) - sum(_wb.values()):.1f}s"
            + "".join(f"  {k} {v:.1f}s" for k, v in sorted(_wb.items()))
            + f"  attempts {_att:.0f}/{max(level, 1)} levels",
            file=_sys.stderr,
            flush=True,
        )


# ---------------------------------------------------------------------------
# routing (items down a frozen tree) — used by incremental inserts and by
# the memory-budgeted build (reference: src/writer.rs:1398-1531)
# ---------------------------------------------------------------------------


#: lanes per device routing call: [chunk, sd] gathers stay ~0.4 GB at 768-d
_ROUTE_CHUNK = 1 << 17


@functools.partial(jax.jit, static_argnames=("metric",))
def _route_leaves(
    metric, rows, extras, slots, start, kind, left, right, ptr, aux, normals, key
):
    """Walk every (item-slot, start-node) lane to its destination leaf
    entirely on device: per step gather each lane's split normal, compute
    its margin, and step left/right; random side at normal-less splits
    (reference: src/writer.rs:1409-1416).  One while_loop and ONE final
    device->host transfer — the per-level host sync this replaces cost
    seconds per level through the dev tunnel.
    """
    from .models.forest import KIND_SPLIT, KIND_SPLIT_NONE

    qf = extras[slots] if metric.has_extra else jnp.float32(1.0)

    def moving(node):
        k = kind[node]
        return (k == KIND_SPLIT) | (k == KIND_SPLIT_NONE)

    def cond(c):
        node, lvl = c
        return jnp.any(moving(node)) & (lvl < 512)

    def body(c):
        node, lvl = c
        k = kind[node]
        nr = jnp.maximum(ptr[node], 0)
        margin = metric.base_dot(normals[nr], rows[slots]) + aux[nr] * qf
        rnd = jax.random.bernoulli(jax.random.fold_in(key, lvl), shape=node.shape)
        go_right = jnp.where(k == KIND_SPLIT, ~jnp.signbit(margin), rnd)
        nxt = jnp.where(go_right, right[node], left[node])
        return jnp.where(moving(node), nxt, node), lvl + 1

    node, _ = jax.lax.while_loop(cond, body, (start, jnp.int32(0)))
    return node


def route_items(
    ctx: BuildContext,
    normals_matrix_dev: jax.Array,
    aux_lookup: np.ndarray,
    entries: list[tuple[int, np.ndarray]],
    key,
) -> dict[int, list[np.ndarray]]:
    """Route item slots from `entries` (node_id, slots) down to descendants.

    Uses the forest in ctx.forest; split hyperplanes are read from
    `normals_matrix_dev` via ctx.forest.ptr.  Returns node_id → list of
    routed slot arrays (reference: insert_items_in_descendants_*,
    src/writer.rs:1398-1531).  The walk itself runs on device
    (`_route_leaves`); the host only groups the final leaf assignment.
    Random-side choices at normal-less splits use per-(lane, level)
    threefry bits — same distribution as the reference's per-item
    `rng.gen::<bool>()`, different stream (PARITY.md deviation 2).
    """
    import os as _os
    import sys as _sys
    import time as _time

    _dbg = _os.environ.get("ARROY_ROUTE_TIMING") == "1"
    _t0 = _time.perf_counter()

    f = ctx.forest
    entries = [
        (int(nid), np.asarray(s, dtype=np.int64)) for nid, s in entries if len(s)
    ]
    if not entries:
        return {}
    all_slots = np.concatenate([s for _, s in entries])
    starts = np.concatenate(
        [np.full(len(s), nid, np.int32) for nid, s in entries]
    )
    rows_dev, extras_dev, _, remap, _ = ctx.device_view(all_slots)
    slots_local = remap(all_slots)
    kind_d = jnp.asarray(f.kind.astype(np.int32))
    left_d = jnp.asarray(f.left)
    right_d = jnp.asarray(f.right)
    ptr_d = jnp.asarray(f.ptr)
    aux_d = jnp.asarray(np.asarray(aux_lookup, np.float32))

    # dispatch every chunk, then ONE device->host transfer at the end
    # (each sync costs ~30ms-to-seconds through the dev tunnel)
    parts = []
    reals = []
    for ci, off in enumerate(range(0, len(all_slots), _ROUTE_CHUNK)):
        ctx.check_cancel()
        sl = slots_local[off : off + _ROUTE_CHUNK]
        st = starts[off : off + _ROUTE_CHUNK]
        n_real = len(sl)
        # pad to a pow2 bucket so chunks/batches share compiled shapes
        n_pad = max(256, _next_pow2(n_real))
        sl_p = np.zeros(n_pad, np.int32)
        sl_p[:n_real] = sl
        st_p = np.full(n_pad, entries[0][0], np.int32)
        st_p[:n_real] = st
        parts.append(
            _route_leaves(
                ctx.metric,
                rows_dev,
                extras_dev,
                jnp.asarray(sl_p),
                jnp.asarray(st_p),
                kind_d,
                left_d,
                right_d,
                ptr_d,
                aux_d,
                normals_matrix_dev,
                jax.random.fold_in(key, ci),
            )
        )
        reals.append(n_real)
    if _dbg:
        _t1 = _time.perf_counter()
        jax.block_until_ready(parts)
        _t2 = _time.perf_counter()
        print(
            f"route: setup+dispatch {_t1 - _t0:.2f}s  device {_t2 - _t1:.2f}s"
            f"  ({len(parts)} chunks, {len(all_slots)} lanes)",
            file=_sys.stderr,
            flush=True,
        )
    whole = np.asarray(parts[0] if len(parts) == 1 else jnp.concatenate(parts))
    if _dbg:
        print(
            f"route: transfer done at {_time.perf_counter() - _t0:.2f}s",
            file=_sys.stderr,
            flush=True,
        )
    bases = np.cumsum([0] + [len(p) for p in parts[:-1]])
    dest = np.concatenate(
        [whole[b : b + r] for b, r in zip(bases, reals)]
    ).astype(np.int64)

    order = np.argsort(dest, kind="stable")
    sdest, sslots = dest[order], all_slots[order]
    cuts = np.nonzero(np.diff(sdest))[0] + 1
    groups = np.split(sslots, cuts)
    heads = sdest[np.concatenate([[0], cuts]).astype(np.int64)]
    collected: dict[int, list[np.ndarray]] = {}
    for nid, g in zip(heads, groups):
        collected.setdefault(int(nid), []).append(g)
    if _dbg:
        print(
            f"route: total {_time.perf_counter() - _t0:.2f}s"
            f" ({len(collected)} leaves)",
            file=_sys.stderr,
            flush=True,
        )
    return collected
