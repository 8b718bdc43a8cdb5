"""On-chip stage timing of the builder level step at glove-scale shapes.

The warm 1.18M x 100 x 25 build spends ~8.5s/level in the dispatched
level step — ~8x a bandwidth estimate of its gather traffic.  This
times the pieces separately (two_means, the all-attempts margin pass,
the counts+partition remainder, and the full step) at a synthetic
late-level frontier so the hog is identified by measurement.

    python scripts/levelstep_profile.py [d] [p_pad] [f_cap]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from arroy_tpu import builder  # noqa: E402
from arroy_tpu.metrics import metric_by_name  # noqa: E402

D = int(sys.argv[1]) if len(sys.argv) > 1 else 100
P = int(sys.argv[2]) if len(sys.argv) > 2 else 33_554_432
F = int(sys.argv[3]) if len(sys.argv) > 3 else 262_144
G = 2_097_152
N = 1_500_000
SEG_LEN = 128  # late-level segment width (> split_after=100 -> splits)
NSEG = min(26_000_000 // SEG_LEN, F)

metric = metric_by_name("euclidean")
rng = np.random.default_rng(0)

rows = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
extras = jnp.zeros(N, jnp.float32)
hnorms = jnp.asarray(
    np.linalg.norm(np.asarray(rows), axis=1).astype(np.float32)
)
perm = jnp.asarray(rng.integers(0, N, size=P).astype(np.int32))

ss = np.full(G, NSEG * SEG_LEN, np.int32)
sl = np.zeros(G, np.int32)
sp = np.zeros(G, bool)
ss[:NSEG] = np.arange(NSEG, dtype=np.int32) * SEG_LEN
sl[:NSEG] = SEG_LEN
sp[:NSEG] = True
seg_start, seg_len, seg_split = jnp.asarray(ss), jnp.asarray(sl), jnp.asarray(sp)
key = jax.random.key(7)

A = 4


@jax.jit
def stage_keys():
    (sidx,) = jnp.nonzero(seg_split, size=F, fill_value=0)
    sidx = sidx.astype(jnp.int32)
    keys_a = jax.vmap(
        lambda i: jax.vmap(
            lambda a: jax.random.fold_in(jax.random.fold_in(key, i), a)
        )(jnp.arange(A, dtype=jnp.int32))
    )(sidx)
    return sidx, keys_a


@jax.jit
def stage_two_means(rows, extras, hnorms, perm, ss_c, sl_c, keys_a):
    return builder._two_means(
        metric, D, rows, extras, hnorms, perm, ss_c, sl_c, keys_a,
    )


@jax.jit
def stage_item_seg():
    mark = jnp.zeros(P + 1, jnp.int32).at[
        jnp.minimum(seg_start, P)
    ].add(1, mode="drop")
    return jnp.clip(jnp.cumsum(mark[:P]) - 1, 0, G - 1).astype(jnp.int32)


@jax.jit
def stage_margins(rows, extras, perm, item_cseg, normals_t, aux_t):
    return builder._margins_all_attempts(
        metric, rows, extras, perm, item_cseg, normals_t, aux_t,
        seg_min_len=101,
    )


@jax.jit
def stage_counts(margins_k, ss_c, sl_c):
    c_starts = jnp.clip(ss_c, 0, P - 1)
    c_ends = jnp.clip(ss_c + sl_c - 1, 0, P - 1)

    def count_one(m):
        x = (~builder._sign_positive(m)).astype(jnp.int32)
        s = jnp.cumsum(x)
        cnt = s[c_ends] - s[c_starts] + x[c_starts]
        return jnp.where(sl_c > 0, cnt, 0)

    return jax.vmap(count_one)(margins_k)


def timeit(label, fn, *args):
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    compile_s = time.perf_counter() - t0
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:18s} {dt * 1e3:9.1f} ms   (compile {compile_s:.1f}s)", flush=True)
    return out


print(f"shapes: d={D} p_pad={P} f_cap={F} nseg={NSEG}", flush=True)
sidx, keys_a = timeit("keys", stage_keys)
ss_c = jax.block_until_ready(seg_start[sidx])
sl_c = jax.block_until_ready(seg_len[sidx])
normals_t, aux_t = timeit(
    "two_means", stage_two_means, rows, extras, hnorms, perm, ss_c, sl_c, keys_a
)
item_seg = timeit("item_seg", stage_item_seg)
inv = jnp.zeros(G, jnp.int32).at[sidx].set(
    jnp.arange(F, dtype=jnp.int32), mode="drop"
)
item_cseg = inv[item_seg]
item_cseg = jax.block_until_ready(
    jax.jit(lambda sp_l, cs: jax.lax.cummax(jnp.where(sp_l, cs, 0)))(
        seg_split[item_seg], item_cseg
    )
)
CHUNK = builder._margin_chunk(P, D, 4)


@jax.jit
def stage_rowgather(rows, perm):
    idxs = jnp.arange(P, dtype=jnp.int32).reshape(-1, CHUNK)

    def cf(c):
        return rows[perm[c]].sum(axis=1)

    return jax.lax.map(cf, idxs)


@jax.jit
def stage_rowstream(rows):
    idxs = jnp.arange(P, dtype=jnp.int32).reshape(-1, CHUNK)

    def cf(c):
        return rows[c % N].sum(axis=1)

    return jax.lax.map(cf, idxs)


timeit("rowgather_only", stage_rowgather, rows, perm)
timeit("rowstream_only", stage_rowstream, rows)
margins_k = timeit(
    "margins_all", stage_margins, rows, extras, perm, item_cseg, normals_t, aux_t
)
timeit("counts", stage_counts, margins_k, ss_c, sl_c)


@jax.jit
def stage_partition(perm, seg_start, seg_len, seg_split, item_seg, side, left_cnt_g):
    P_ = perm.shape[0]
    side_eff = jnp.where(seg_split[item_seg], side, False)
    left_lane = (~side_eff).astype(jnp.int32)
    right_lane = side_eff.astype(jnp.int32)
    ex_left = jnp.cumsum(left_lane) - left_lane
    ex_right = jnp.cumsum(right_lane) - right_lane
    seg_pos = jnp.minimum(seg_start[item_seg], P_ - 1)
    rank = jnp.where(
        side_eff,
        left_cnt_g[item_seg] + (ex_right - ex_right[seg_pos]),
        ex_left - ex_left[seg_pos],
    )
    new_pos = seg_start[item_seg] + rank
    return (
        jnp.zeros_like(perm).at[new_pos].set(perm, mode="drop", unique_indices=True)
    )


side_fake = jax.block_until_ready(
    jax.jit(lambda m: builder._sign_positive(m[0]))(margins_k)
)
lcg = jnp.zeros(G, jnp.int32)
timeit(
    "partition", stage_partition,
    perm, seg_start, seg_len, seg_split, item_seg, side_fake, lcg,
)


full_step = jax.jit(
    lambda rows, extras, hnorms, perm, ss, sl, sp: builder._level_core(
        metric, D, rows, extras, hnorms, perm, ss, sl, sp, key, f_cap=F, seg_min_len=101
    )[1]
)
timeit(
    "full_level_core", full_step,
    rows, extras, hnorms, perm, seg_start, seg_len, seg_split,
)
