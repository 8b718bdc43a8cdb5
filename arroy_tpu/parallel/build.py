"""Multi-chip build: ONE forest grown over a mesh-sharded corpus.

The single-chip engine (builder.grow_trees) keeps a global permutation
array and partitions it with a device-wide sort each level.  Across
chips that sort would be an all-to-all of the whole corpus per level, so
the sharded engine is organized label-synchronously instead: **items
never move**.  Item rows are sharded contiguously over the mesh's
`shard` axis and stay put; each (seed, item) entry carries a dense
segment label that is rewritten locally each level:

1. **sample** — two-means training samples are drawn per segment by a
   hash-based segmented argmax (12 draws; the centroid pair is forced
   distinct), merged across shards with `pmax`, and the winners' rows
   are fetched with a masked-gather + `psum` (the only cross-shard data
   motion: 12·G·d values per level over the ICI);
2. **two-means** — replicated [G, 12] refinement (builder._two_means_core),
   identical on every shard;
3. **margins/side** — embarrassingly parallel over local items; per-
   segment left counts merge with a `psum`; the imbalance-retry rule
   (accept < 0.95, 4 attempts, random fallback past 0.99 — reference:
   src/writer.rs:1209-1233) runs as masked lanes exactly like the
   single-chip step;
4. **relabel** — `new_seg = side ? right_tab[seg] : left_tab[seg]`, a
   purely local gather; the dense renumbering tables are computed on the
   host from the previous level's counts.

Every cross-shard reduction is integer or a sum of one value with
zeros, so the built forest is **bit-identical for any mesh size** —
tested 1-device vs 8-device.  The reference's build parallelism is a
rayon work-stealing scope (reference: src/writer.rs:568-591,793-829);
this is its mesh-scale counterpart.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..builder import BuildContext, _MAX_LEVELS, _sign_positive, _two_means_core
from .mesh import AXIS


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _mix(x: jax.Array) -> jax.Array:
    """32-bit integer finalizer (murmur3-style avalanche)."""
    x = x.astype(jnp.uint32)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


def _mix_host(x: int) -> int:
    x &= 0xFFFFFFFF
    x ^= x >> 16
    x = (x * 0x7FEB352D) & 0xFFFFFFFF
    x ^= x >> 15
    x = (x * 0x846CA68B) & 0xFFFFFFFF
    x ^= x >> 16
    return x


@functools.partial(
    jax.jit, static_argnames=("mesh", "metric", "dims", "n_seeds", "g_cap")
)
def _sharded_level_step(
    mesh,
    metric,
    dims,
    n_seeds,
    g_cap,
    rows,
    extras,
    hnorms,
    seg,
    lens,
    split_mask,
    ltab,
    rtab,
    ktab,
    salt,
):
    """One sharded build level.  See module docstring."""

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(AXIS, None),  # rows
            P(AXIS),  # extras
            P(AXIS),  # hnorms
            P(None, AXIS),  # seg [S, m_l]
            P(None),  # lens
            P(None),  # split_mask
            P(None),  # ltab
            P(None),  # rtab
            P(None),  # ktab
            P(),  # salt
        ),
        out_specs=(P(None, None), P(None), P(None), P(None), P(None, AXIS)),
        check_vma=False,  # normals/aux/counts are replicated after psum/pmax
    )
    def step(rows_l, extras_l, hnorms_l, seg_l, lens_r, split_r, ltab_r, rtab_r, ktab_r, salt_r):
        m_l = rows_l.shape[0]
        off_i = jax.lax.axis_index(AXIS).astype(jnp.int32) * jnp.int32(m_l)
        ig = off_i + jnp.arange(m_l, dtype=jnp.int32)  # global slot index
        ig_u = ig.astype(jnp.uint32)
        s_salt = (
            jnp.arange(n_seeds, dtype=jnp.uint32)[:, None] * jnp.uint32(0x9E3779B9)
        )
        gid = s_salt + ig_u[None, :]  # per-entry hash base [S, m_l]
        member = seg_l > 0
        segf = seg_l.reshape(-1)
        ig_b = jnp.broadcast_to(ig[None, :], (n_seeds, m_l))

        def imbalance(lc):
            nl = lens_r.astype(jnp.float32)
            f = jnp.where(nl > 0, lc.astype(jnp.float32) / jnp.where(nl > 0, nl, 1.0), 0.5)
            return jnp.maximum(f, 1.0 - f)

        def attempt(att):
            att_u = att.astype(jnp.uint32)
            elig = member & split_r[seg_l]

            def field(j):
                h = _mix(
                    salt_r
                    ^ _mix(
                        gid
                        + jnp.uint32(j) * jnp.uint32(0x85EBCA6B)
                        + att_u * jnp.uint32(0xC2B2AE35)
                    )
                )
                v = ((h >> 1).astype(jnp.int32)) | 1  # positive, nonzero
                return jnp.where(elig, v, 0)

            def argmax_of(v):
                vf = v.reshape(-1)
                mx = jax.ops.segment_max(vf, segf, num_segments=g_cap)
                mx = jax.lax.pmax(mx, AXIS)
                cand = jnp.where(
                    (vf == mx[segf]) & (vf > 0), ig_b.reshape(-1), jnp.int32(-1)
                )
                w = jax.ops.segment_max(cand, segf, num_segments=g_cap)
                return jax.lax.pmax(w, AXIS)  # [g_cap] global slot, <0 if none

            # centroid pair forced distinct (reference choose_two,
            # src/parallel.rs:342-367); refinement draws are independent
            c1 = argmax_of(field(0))
            v1 = field(1)
            v1 = jnp.where(ig_b == c1[seg_l], 0, v1)
            c2 = argmax_of(v1)
            winners = [c1, c2] + [argmax_of(field(j)) for j in range(2, 12)]
            w = jnp.stack(winners)  # [12, g_cap]

            # fetch winners' rows: masked local gather + psum over shards
            loc = w - off_i
            ok = (loc >= 0) & (loc < m_l) & (w >= 0)
            lw = jnp.clip(loc, 0, m_l - 1)
            srows = jnp.where(ok[..., None], rows_l[lw], 0)
            srows = jax.lax.psum(srows, AXIS)  # [12, g_cap, sd]
            sex = jax.lax.psum(jnp.where(ok, extras_l[lw], 0.0), AXIS)
            shn = jax.lax.psum(jnp.where(ok, hnorms_l[lw], 0.0), AXIS)
            normals, aux = _two_means_core(
                metric, dims, srows.transpose(1, 0, 2), sex.T, shn.T
            )

            def per_seed(seg_row):
                n = normals[seg_row]  # [m_l, sd]
                a = aux[seg_row]
                base = metric.base_dot(n, rows_l)
                qf = extras_l if metric.has_extra else 1.0
                return base + a * qf

            margins = jax.lax.map(per_seed, seg_l)  # [S, m_l]
            side = _sign_positive(margins)
            lc = jax.ops.segment_sum(
                ((~side) & elig).reshape(-1).astype(jnp.int32),
                segf,
                num_segments=g_cap,
            )
            return normals, aux, side, jax.lax.psum(lc, AXIS)

        n0, a0, s0, c0 = attempt(jnp.int32(0))
        settled = imbalance(c0) < 0.95

        def cond(st):
            att, settled_, *_ = st
            return (att < 4) & jnp.any(split_r & ~settled_)

        def body(st):
            att, settled_, normals, aux, side, lc = st
            n2, a2, s2, c2 = attempt(att)
            keep = settled_
            normals = jnp.where(keep[:, None], normals, n2)
            aux = jnp.where(keep, aux, a2)
            side = jnp.where(keep[seg_l], side, s2)
            lc = jnp.where(keep, lc, c2)
            settled_ = settled_ | (imbalance(lc) < 0.95)
            return (att + 1, settled_, normals, aux, side, lc)

        _, settled, normals, aux, side, lc = jax.lax.while_loop(
            cond, body, (jnp.int32(1), settled, n0, a0, s0, c0)
        )

        # random-split fallback past 0.99 (reference src/writer.rs:1218-1233)
        none_mask = split_r & (imbalance(lc) > 0.99)
        rnd = (_mix(salt_r ^ jnp.uint32(0x5EED5EED) ^ _mix(gid)) & 1) == 1
        side = jnp.where(none_mask[seg_l], rnd, side)
        elig = member & split_r[seg_l]
        lc2 = jax.ops.segment_sum(
            ((~side) & elig).reshape(-1).astype(jnp.int32), segf, num_segments=g_cap
        )
        lc = jnp.where(none_mask, jax.lax.psum(lc2, AXIS), lc)

        new_seg = jnp.where(
            split_r[seg_l],
            jnp.where(side, rtab_r[seg_l], ltab_r[seg_l]),
            ktab_r[seg_l],
        )
        return normals, aux, lc, none_mask, new_seg

    return step(
        rows, extras, hnorms, seg, lens, split_mask, ltab, rtab, ktab, salt
    )


def grow_trees_sharded(ctx: BuildContext, seeds, key, mesh: Mesh) -> None:
    """Sharded twin of builder.grow_trees: grow every oversized seed's
    subtree into ctx.forest, with the per-level compute spread over the
    mesh.  Requires host item mirrors on ctx (rows_np et al)."""
    seeds = [(int(nid), np.asarray(slots, np.int64)) for nid, slots in seeds]
    if not seeds:
        return
    assert ctx.rows_np is not None, "sharded build needs host item mirrors"

    n = mesh.devices.size
    s_count = len(seeds)
    cap = int(ctx.rows_np.shape[0])
    m_l = -(-max(cap, 1) // n)
    m_pad = m_l * n

    def pad_rows(a, fill=0):
        if a.shape[0] == m_pad:
            return a
        pad = np.full((m_pad - a.shape[0],) + a.shape[1:], fill, a.dtype)
        return np.concatenate([a, pad])

    sh2 = NamedSharding(mesh, P(AXIS, None))
    sh1 = NamedSharding(mesh, P(AXIS))
    rows = jax.device_put(pad_rows(ctx.rows_np), sh2)
    extras = jax.device_put(pad_rows(ctx.extras_np), sh1)
    hnorms = jax.device_put(pad_rows(ctx.hnorms_np), sh1)

    # dense segment labels: 0 = dead, 1+s = seed s's root segment
    seg_np = np.zeros((s_count, m_pad), np.int32)
    lens = [0]
    node_of: dict[int, int] = {}
    for s, (nid, slots) in enumerate(seeds):
        seg_np[s, slots] = 1 + s
        node_of[1 + s] = nid
        lens.append(len(slots))
    lens = np.asarray(lens, np.int64)
    total = int(lens.sum())
    g_cap = _next_pow2(max(256, 8 * total // max(ctx.split_after, 1) + s_count + 64))
    seg = jax.device_put(seg_np, NamedSharding(mesh, P(None, AXIS)))

    kd = np.asarray(jax.random.key_data(key)).ravel()
    seed_base = int(kd[-1]) & 0xFFFFFFFF

    level = 0
    flushed = False
    while True:
        g = len(lens)
        active = lens > ctx.split_after
        if not active.any():
            break
        if level >= _MAX_LEVELS:
            flushed = True  # leftover oversized segments become fat leaves
            break
        ctx.check_cancel()

        # dense renumbering for the next level (host-computed tables)
        ltab = np.zeros(g_cap, np.int32)
        rtab = np.zeros(g_cap, np.int32)
        ktab = np.zeros(g_cap, np.int32)
        c = 1
        kept: list[tuple[int, int]] = []  # (new_g, old_g)
        split_children: list[tuple[int, int, int]] = []  # (old_g, lg, rg)
        for gg in range(1, g):
            if active[gg]:
                ltab[gg], rtab[gg] = c, c + 1
                split_children.append((gg, c, c + 1))
                c += 2
            else:
                ktab[gg] = c
                kept.append((c, gg))
                c += 1
        if c > g_cap:
            g_cap = _next_pow2(c)
            ltab = np.concatenate([ltab, np.zeros(g_cap - len(ltab), np.int32)])
            rtab = np.concatenate([rtab, np.zeros(g_cap - len(rtab), np.int32)])
            ktab = np.concatenate([ktab, np.zeros(g_cap - len(ktab), np.int32)])

        lens_pad = np.zeros(g_cap, np.int32)
        lens_pad[:g] = np.minimum(lens, np.iinfo(np.int32).max)
        split_pad = np.zeros(g_cap, bool)
        split_pad[:g] = active

        salt = np.uint32(_mix_host(seed_base ^ _mix_host(0xA11CE + level)))
        normals_d, aux_d, lc_d, none_d, seg = _sharded_level_step(
            mesh,
            ctx.metric,
            ctx.dims,
            s_count,
            g_cap,
            rows,
            extras,
            hnorms,
            seg,
            jnp.asarray(lens_pad),
            jnp.asarray(split_pad),
            jnp.asarray(ltab),
            jnp.asarray(rtab),
            jnp.asarray(ktab),
            jnp.uint32(salt),
        )
        left_cnt, none_mask, aux = jax.device_get((lc_d, none_d, aux_d))

        # stage the real hyperplanes (device-selected rows, host aux)
        staged = [gg for gg, _, _ in split_children if not none_mask[gg]]
        row_of: dict[int, int] = {}
        if staged:
            base = ctx.stage_chunk(
                jnp.take(normals_d, jnp.asarray(staged, jnp.int32), axis=0),
                aux[staged],
            )
            for i, gg in enumerate(staged):
                row_of[gg] = base + i

        node_next: dict[int, int] = {}
        lens_next = np.zeros(c, np.int64)
        indexed_now = 0
        for new_g, old_g in kept:
            node_next[new_g] = node_of[old_g]
            lens_next[new_g] = lens[old_g]
        for old_g, lg, rg in split_children:
            l_id = ctx.alloc.next()
            r_id = ctx.alloc.next()
            ctx.forest.put_split(
                node_of[old_g], l_id, r_id, row_of.get(old_g)
            )
            node_next[lg] = l_id
            node_next[rg] = r_id
            lens_next[lg] = int(left_cnt[old_g])
            lens_next[rg] = lens[old_g] - int(left_cnt[old_g])
            for child_g in (lg, rg):
                if lens_next[child_g] <= ctx.split_after:
                    indexed_now += int(lens_next[child_g])
        node_of = node_next
        lens = lens_next
        level += 1
        if indexed_now:
            ctx.on_items_indexed(indexed_now)

    # materialize leaves: one download of the final label array
    seg_final = np.asarray(seg)  # [S, m_pad]
    flat = seg_final.ravel()
    slot_of_entry = np.tile(np.arange(m_pad, dtype=np.int64), s_count)
    order = np.argsort(flat, kind="stable")
    sorted_seg = flat[order]
    starts = np.searchsorted(sorted_seg, np.arange(len(lens) + 1))
    for gg, nid in node_of.items():
        lo, hi = starts[gg], starts[gg + 1]
        slots = slot_of_entry[order[lo:hi]]
        ids = np.sort(ctx.slot_to_id[slots].astype(np.int64)).astype(np.uint32)
        ctx.forest.put_leaf(nid, ids)
        if flushed and lens[gg] > ctx.split_after:
            ctx.on_items_indexed(len(ids))
