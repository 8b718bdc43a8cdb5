"""On-chip stage profile of the leaf-probe engine (round 3).

Times the probe pipeline's stages separately at the 1.18M GloVe-class
index so optimization targets measurement, not guesswork:

  1. centroid rank: [B, T*nb] matmul + per-tree top-L
  2. block fetch+score: gather [B, C, P, d] + einsum + approx top-k2
  3. exact re-score + dedup + final top-k

    python scripts/probe_profile.py [db] [dims] [sk] [B]
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
from arroy_tpu import probe as P  # noqa: E402

DB = sys.argv[1] if len(sys.argv) > 1 else "/tmp/glove_1m"
DIMS = int(sys.argv[2]) if len(sys.argv) > 2 else 100
SK = int(sys.argv[3]) if len(sys.argv) > 3 else 16000
B = int(sys.argv[4]) if len(sys.argv) > 4 else 256
METRIC = "cosine" if DIMS == 100 else "euclidean"

db = Database(DB)
r = Reader.open(db.read(), 0, db, metric=METRIC)
idx = r._device()
state = r._state

t0 = time.perf_counter()
tabs = P.get_tables(idx, state, P.auto_trees(idx, "bf16"), 64, "bf16")
print(
    f"tables: T={tabs.n_trees} P={tabs.block} nb_max={tabs.nb_max} "
    f"fill={tabs.fill:.3f} bytes={tabs.nbytes() / 2**30:.2f} GiB "
    f"({time.perf_counter() - t0:.1f}s host build+upload)",
    flush=True,
)

T, Pb, nb_max = tabs.n_trees, tabs.block, tabs.nb_max
eff = max(int(T * Pb * tabs.fill), 1)
L = max(1, min(-(-SK // eff), nb_max))
k2 = 512
print(f"sk={SK} -> L={L} C={T * L} slots={T * L * Pb}", flush=True)

rng = np.random.default_rng(7)
# corpus-distributed queries: sample stored rows
sl = rng.integers(idx.n_items, size=B)
qv = jnp.asarray(np.asarray(state.store.rows()[sl], np.float32))
qn = jnp.linalg.norm(qv, axis=1)
qe = jnp.zeros((B,), jnp.float32)


def timeit(fn, *args, n=10, label=""):
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"  {label:<42s} {dt * 1e3:9.2f} ms/batch  (compile {tc:.1f}s)", flush=True)
    return out


@jax.jit
def _rank_topk(qv, cent, valid):
    dots = jax.lax.dot_general(
        qv, cent, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    score = jnp.where(valid[None, :], dots, -jnp.inf)
    _, topL = jax.lax.top_k(score.reshape(B, T, nb_max), L)
    base = (jnp.arange(T, dtype=jnp.int32) * nb_max)[None, :, None]
    return (topL + base).reshape(B, T * L)


@jax.jit
def _rank_approx(qv, cent, valid):
    dots = jax.lax.dot_general(
        qv, cent, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    score = jnp.where(valid[None, :], dots, -jnp.inf)
    _, topL = jax.lax.approx_max_k(
        score.reshape(B, T, nb_max), L, recall_target=0.95
    )
    base = (jnp.arange(T, dtype=jnp.int32) * nb_max)[None, :, None]
    return (topL + base).reshape(B, T * L)


def rank_topk(qv):
    return _rank_topk(qv, tabs.cent, tabs.valid)


def rank_approx(qv):
    return _rank_approx(qv, tabs.cent, tabs.valid)


@jax.jit
def _fetch_score(qv, bid, blk_rows, blk_aux, blk_slots):
    blocks = blk_rows[bid]
    baux = blk_aux[bid]
    bslot = blk_slots[bid]
    d2 = jnp.einsum(
        "bcpd,bd->bcp", blocks, qv.astype(tabs.blk_rows.dtype),
        preferred_element_type=jnp.float32,
    )
    s2 = d2 / jnp.maximum(baux, 1e-30) if METRIC == "cosine" else 2.0 * d2 - baux
    s2 = jnp.where(bslot >= 0, s2, -jnp.inf)
    C = bid.shape[1] * Pb
    sel_s, sel_i = jax.lax.approx_max_k(s2.reshape(B, C), k2, recall_target=0.99)
    cand = jnp.take_along_axis(bslot.reshape(B, C), sel_i, axis=1)
    return sel_s, cand


def fetch_score(qv, bid):
    return _fetch_score(qv, bid, tabs.blk_rows, tabs.blk_aux, tabs.blk_slots)


@jax.jit
def _rescore(qv, qn, qe, sel_s, cand, rows, norms, extras):
    cs = jnp.maximum(cand, 0)
    x = rows[cs].astype(jnp.float32)
    xn = norms[cs]
    xe = extras[cs]
    d = idx.metric.built_distance(qv[:, None, :], qn[:, None], qe[:, None], x, xn, xe)
    d = jnp.where((cand >= 0) & (sel_s > -jnp.inf), d, jnp.inf)
    order = jnp.argsort(cand, axis=1)
    ss = jnp.take_along_axis(cand, order, axis=1)
    sd_ = jnp.take_along_axis(d, order, axis=1)
    dup = jnp.concatenate([jnp.zeros((B, 1), bool), ss[:, 1:] == ss[:, :-1]], axis=1)
    sd_ = jnp.where(dup, jnp.inf, sd_)
    neg, top_i = jax.lax.top_k(-sd_, 10)
    return jnp.take_along_axis(ss, top_i, axis=1), -neg


def rescore(qv, qn, qe, sel_s, cand):
    return _rescore(qv, qn, qe, sel_s, cand, idx.rows, idx.norms, idx.extras)


bid = timeit(rank_topk, qv, label="1. centroid rank (full top_k)")
bid2 = timeit(rank_approx, qv, label="1'. centroid rank (approx_max_k)")
agree = float(jnp.mean(
    jnp.asarray([
        jnp.isin(bid2[i], bid[i]).mean() for i in range(0, B, 16)
    ])
))
print(f"     approx/full block agreement: {agree:.3f}", flush=True)
ss_cand = timeit(fetch_score, qv, bid, label="2. block fetch + score + approx top-k2")
timeit(rescore, qv, qn, qe, *ss_cand, label="3. exact re-score + dedup + top-k")

# end-to-end serving fn for reference
from arroy_tpu.probe import make_probe_fn  # noqa: E402

fn = make_probe_fn(idx, state, 10, SK)
timeit(lambda q_, n_, e_: fn(q_, n_, e_, None), qv, qn, qe,
       label="full make_probe_fn pipeline")
