"""Stage-level profile of the leaf-probe serving pipeline (round 5).

r3 profiled only stage 1 (centroid block ranking) and fixed it with
approx_max_k.  Stages 2 (block gather + in-block score + cut) and 3
(exact re-score) were never timed on chip; at the bench config the
whole pipeline runs ~41 ms / 256-query batch while the raw HBM traffic
of the block gather is ~3 ms — this script finds where the rest goes.

Measurement: the dispatch loop under-reports on this backend (the axon
client acks executions asynchronously: a trivial add "blocks" in 50 us
where the tunnel round-trip alone is ~30 ms), so every figure here uses
the chained-scan protocol from bench.py — n iterations of the stage
inside ONE jitted lax.scan, serialized by a data dependence; two chain
lengths difference away the dispatch+fetch constant.

Variants raced for stage 2:
  cur    the production einsum path (gather -> einsum bcpd,bd)
  flat   gather -> ONE batched dot_general over [B, C*P, d]
  take   2-d row take on a pre-flattened [NBT, P*d] table + dot_general

Usage (TPU):  python scripts/probe_profile_r05.py
Reuses the persisted bench DB (BENCH_DB or the bench default path).
Appends to results/probe_profile_r05.log.
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

M = int(os.environ.get("BENCH_M", 100_000))
D = int(os.environ.get("BENCH_D", 768))
N_TREES = int(os.environ.get("BENCH_TREES", 10))
SK = int(os.environ.get("BENCH_SEARCH_K", 4000))
B = int(os.environ.get("BENCH_BATCH", 256))
K = 10
N_SHORT = 4
N_LONG = 16

LOG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "results",
    "probe_profile_r05.log",
)
_log_f = open(LOG, "a")


def log(msg):
    print(msg, file=sys.stderr, flush=True)
    print(msg, file=_log_f, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from arroy_tpu import Database, Reader
    from arroy_tpu import probe as P

    db_path = os.environ.get(
        "BENCH_DB", f"/tmp/arroy_bench_{M}x{D}_t{N_TREES}_clustered"
    )
    db = Database(db_path)
    r = Reader.open(db.read(), 0, db)
    idx = r._device()
    state = r._state

    rng = np.random.default_rng(7)
    from bench import make_corpus

    qs = make_corpus(rng, B, D)

    dtype = P.auto_dtype(idx)
    T = min(P.auto_trees(idx, dtype), len(idx.roots))
    blk = P.DEFAULT_BLOCK
    tabs = P.get_tables(idx, state, T, blk, dtype)
    nb_max, fill = tabs.nb_max, tabs.fill
    eff = max(int(T * blk * fill), 1)
    L = max(1, min(-(-SK // eff), nb_max))
    C = T * L
    k2 = 512
    NBT = T * nb_max
    log(
        f"config: M={M} D={D} sk={SK} B={B} dtype={dtype} T={T} P={blk} "
        f"nb_max={nb_max} fill={fill:.3f} L={L} C={C} k2={k2} "
        f"tables={tabs.nbytes()/2**30:.2f} GiB"
    )

    metric = idx.metric
    scale = 2  # euclidean

    qv0 = jnp.asarray(qs)
    qn0 = jnp.sqrt(jnp.maximum(jnp.einsum("bd,bd->b", qv0, qv0), 0.0))
    jax.block_until_ready((qv0, qn0))

    def chain_time(name, make_step, args):
        """make_step(n) -> jitted fn(args..., seed) running the stage n
        times inside one lax.scan, serialized by a data dependence, and
        returning a small array.  Times n=N_SHORT and n=N_LONG."""
        wall = {}
        for n in (N_SHORT, N_LONG):
            fn = make_step(n)
            out = fn(*args, jnp.float32(0.5))
            jax.block_until_ready(out)  # compile + one run
            t0 = time.perf_counter()
            out = fn(*args, jnp.float32(1.5))
            jax.block_until_ready(out)
            # fetch forces a real round-trip: readiness is async here
            np.asarray(out)
            wall[n] = time.perf_counter() - t0
        per = (wall[N_LONG] - wall[N_SHORT]) / (N_LONG - N_SHORT)
        log(
            f"  {name:26s} {per*1e3:8.2f} ms/batch   "
            f"(chain {N_SHORT}: {wall[N_SHORT]*1e3:.0f} ms, "
            f"{N_LONG}: {wall[N_LONG]*1e3:.0f} ms)"
        )
        return per

    # ---- stage 1: centroid rank -> top-L block ids ----------------------
    def rank(cent, caux, valid, qv):
        dots = jax.lax.dot_general(
            qv, cent, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        score = jnp.float32(scale) * dots - caux[None, :]
        score = jnp.where(valid[None, :], score, -jnp.inf)
        score3 = score.reshape(qv.shape[0], T, nb_max)
        if L < nb_max:
            _, topL = jax.lax.approx_max_k(score3, L, recall_target=0.95)
        else:
            _, topL = jax.lax.top_k(score3, L)
        base = (jnp.arange(T, dtype=jnp.int32) * nb_max)[None, :, None]
        return (topL + base).reshape(qv.shape[0], T * L)

    def make_s1(n):
        @jax.jit
        def run(cent, caux, valid, qv, seed):
            def body(q, _):
                bid = rank(cent, caux, valid, q)
                q2 = q * (1.0 + seed * 1e-7 * bid[:, :1].astype(jnp.float32))
                return q2, ()
            q, _ = jax.lax.scan(body, qv, None, length=n)
            return q[:, 0]
        return run

    dt1 = chain_time("s1 centroid rank", make_s1, (tabs.cent, tabs.caux, tabs.valid, qv0))

    bid0 = jax.jit(rank)(tabs.cent, tabs.caux, tabs.valid, qv0)
    jax.block_until_ready(bid0)

    # ---- stage 2 variants: gather + score + cut -> (sel_s, cand) --------
    def cut(s2f, slotf):
        if k2 < s2f.shape[1]:
            sel_s, sel_i = jax.lax.approx_max_k(s2f, k2, recall_target=0.99)
            cand = jnp.take_along_axis(slotf, sel_i, axis=1)
        else:
            sel_s, cand = s2f, slotf
        return sel_s, cand

    def s2_cur(blk_rows, blk_aux, blk_slots, bid, qv):
        b = qv.shape[0]
        safe = jnp.maximum(bid, 0)
        blocks = blk_rows[safe]
        baux = blk_aux[safe]
        bslot = jnp.where((bid >= 0)[..., None], blk_slots[safe], -1)
        qbf = qv.astype(blocks.dtype)
        d2 = jnp.einsum(
            "bcpd,bd->bcp", blocks, qbf, preferred_element_type=jnp.float32
        )
        s2 = 2.0 * d2 - baux
        keep = bslot >= 0
        s2 = jnp.where(keep, s2, -jnp.inf)
        return cut(s2.reshape(b, -1), jnp.where(keep, bslot, -1).reshape(b, -1))

    def s2_flat(blk_rows, blk_aux, blk_slots, bid, qv):
        b = qv.shape[0]
        safe = jnp.maximum(bid, 0)
        blocks = blk_rows[safe].reshape(b, -1, blk_rows.shape[-1])
        baux = blk_aux[safe].reshape(b, -1)
        bslot = jnp.where((bid >= 0)[..., None], blk_slots[safe], -1).reshape(b, -1)
        qbf = qv.astype(blocks.dtype)
        d2 = jax.lax.dot_general(
            blocks, qbf, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        s2 = 2.0 * d2 - baux
        keep = bslot >= 0
        return cut(jnp.where(keep, s2, -jnp.inf), jnp.where(keep, bslot, -1))

    def s2_take(flat_rows, blk_aux, blk_slots, bid, qv):
        b = qv.shape[0]
        safe = jnp.maximum(bid, 0)
        d = qv.shape[1]
        blocks = jnp.take(flat_rows, safe.reshape(-1), axis=0).reshape(b, -1, d)
        baux = blk_aux[safe].reshape(b, -1)
        bslot = jnp.where((bid >= 0)[..., None], blk_slots[safe], -1).reshape(b, -1)
        qbf = qv.astype(blocks.dtype)
        d2 = jax.lax.dot_general(
            blocks, qbf, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        s2 = 2.0 * d2 - baux
        keep = bslot >= 0
        return cut(jnp.where(keep, s2, -jnp.inf), jnp.where(keep, bslot, -1))

    from arroy_tpu.ops.pallas_probe import gather_score

    def s2_pallas(blk_rows, blk_aux, blk_slots, bid, qv):
        b = qv.shape[0]
        safe = jnp.maximum(bid, 0)
        d2 = gather_score(blk_rows, safe.astype(jnp.int32), qv)  # [B, C, P]
        baux = blk_aux[safe]
        bslot = jnp.where((bid >= 0)[..., None], blk_slots[safe], -1)
        s2 = 2.0 * d2 - baux
        keep = bslot >= 0
        s2 = jnp.where(keep, s2, -jnp.inf)
        return cut(s2.reshape(b, -1), jnp.where(keep, bslot, -1).reshape(b, -1))

    def make_s2(score_fn, *tables):
        def mk(n):
            @jax.jit
            def run(*args):
                *tabs_a, bid, qv, seed = args
                def body(bc, _):
                    bidc = bc
                    sel_s, cand = score_fn(*tabs_a, bidc, qv)
                    # data dependence: rotate the probed blocks by a
                    # result-derived offset (stays in [0, NBT))
                    off = (cand[:, :1] + seed.astype(jnp.int32)) % NBT
                    bid2 = (bidc + off.astype(bidc.dtype) + 1) % NBT
                    return bid2, ()
                bidf, _ = jax.lax.scan(body, bid, None, length=n)
                return bidf[:, 0]
            return functools.partial(run, *tables)
        return mk

    variants = os.environ.get("PP_VARIANTS", "pallas,cur").split(",")
    named = {
        "cur": ("s2 cur einsum", s2_cur, tabs.blk_rows),
        "flat": ("s2 flat dot_general", s2_flat, tabs.blk_rows),
        "pallas": ("s2 pallas gather-score", s2_pallas, tabs.blk_rows),
    }
    dts2 = {}
    for v in variants:
        if v == "take":
            flat_rows = jax.jit(lambda x: x.reshape(x.shape[0], -1))(tabs.blk_rows)
            jax.block_until_ready(flat_rows)
            spec = ("s2 take2d dot_general", s2_take, flat_rows)
        else:
            spec = named[v]
        try:
            dts2[v] = chain_time(
                spec[0],
                make_s2(spec[1], spec[2], tabs.blk_aux, tabs.blk_slots),
                (bid0, qv0),
            )
        except Exception as e:
            log(f"  {spec[0]}: FAILED ({type(e).__name__}: {e})")
    dt2c = min(dts2.values()) if dts2 else float("nan")

    sel0, cand0 = jax.jit(s2_cur)(
        tabs.blk_rows, tabs.blk_aux, tabs.blk_slots, bid0, qv0
    )
    jax.block_until_ready((sel0, cand0))

    # ---- stage 3: dedup + exact re-score + top-k -------------------------
    def s3(rows, norms, extras, slot_to_id, sel_s, cand, qv, qn):
        b = qv.shape[0]
        order = jnp.argsort(cand, axis=1)
        ss = jnp.take_along_axis(cand, order, axis=1)
        sv = jnp.take_along_axis(sel_s, order, axis=1)
        dup = jnp.concatenate(
            [jnp.zeros((b, 1), bool), ss[:, 1:] == ss[:, :-1]], axis=1
        )
        live = (ss >= 0) & (sv > -jnp.inf) & ~dup
        cs = jnp.maximum(ss, 0)
        x = rows[cs].astype(jnp.float32)
        xn = norms[cs]
        xe = extras[cs]
        qe = jnp.zeros((b,), jnp.float32)
        d = metric.built_distance(qv[:, None, :], qn[:, None], qe[:, None], x, xn, xe)
        d = jnp.where(live, d, jnp.inf)
        neg, top_i = jax.lax.top_k(-d, K)
        sel_slots = jnp.take_along_axis(ss, top_i, axis=1)
        return slot_to_id[jnp.maximum(sel_slots, 0)], -neg

    def make_s3(n):
        @jax.jit
        def run(rows, norms, extras, slot_to_id, sel_s, cand, qv, qn, seed):
            def body(c, _):
                ids, dd = s3(rows, norms, extras, slot_to_id, sel_s, c, qv, qn)
                c2 = (c + ids[:, :1].astype(c.dtype) + seed.astype(c.dtype)) % M
                return c2, ()
            cf, _ = jax.lax.scan(body, cand, None, length=n)
            return cf[:, 0]
        return run

    dt3 = chain_time(
        "s3 dedup+rescore+topk",
        make_s3,
        (idx.rows, idx.norms, idx.extras, idx.slot_to_id, sel0, cand0, qv0, qn0),
    )

    log(
        f"chained stages: s1 {dt1*1e3:.2f}  s2(best) {dt2c*1e3:.2f}  "
        f"s3 {dt3*1e3:.2f}  ms/batch; "
        f"sum {(dt1+dt2c+dt3)*1e3:.2f} ms -> "
        f"{B/(dt1+dt2c+dt3):.0f} qps upper bound"
    )


if __name__ == "__main__":
    main()
