"""Exact-vs-forest serving crossover sweep (VERDICT r2 item 1b).

Measures, on the real chip, the qps/recall of (a) the DEFAULT
`Reader.searcher()` path (engine="auto"), (b) the forced exact engine,
and (c) the forest engine tuned to the recall target (search_k doubling,
multipop auto), at several corpus sizes — to locate the scale, if any,
where the forest beats the streamed exact engine at equal recall.

    python scripts/crossover_sweep.py --m 262144,524288,1048576,2097152 \
        --d 768 --trees 12 --batch 256

Indexes persist to /tmp/cross_<m>x<d>_t<trees> so re-runs skip builds.
Appends one JSON line per (m, engine) to results/crossover_r03.jsonl.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from arroy_tpu import Database, Reader, Writer  # noqa: E402

CHUNK = 131_072


def clustered(rng, n, d, parents):
    pa, pb = rng.integers(64, size=n), rng.integers(64, size=n)
    mask = rng.random((n, d)) < 0.5
    x = np.where(mask, parents[pa], parents[pb]).astype(np.float32)
    x += 0.05 * rng.standard_normal((n, d)).astype(np.float32)
    return x


def build_or_reuse(m, d, trees, seed=42):
    rng = np.random.default_rng(seed)
    parents = rng.standard_normal((64, d)).astype(np.float32)
    db = Database(f"/tmp/cross_{m}x{d}_t{trees}")
    w = Writer(db, 0, d)
    st = db.read().state(0)
    # metadata only exists after a build — reuse ITEMS from the store
    # itself so a committed ingest outlives a failed build
    have_items = st is not None and st.dims == d and len(st.store) == m
    have_forest = (
        have_items
        and st.metadata is not None
        and len(st.metadata.roots) == trees
        and not st.updated
    )
    build_s = 0.0
    if have_items:
        for lo in range(0, m, CHUNK):  # keep the rng stream aligned
            n = min(CHUNK, m - lo)
            rng.integers(64, size=n), rng.integers(64, size=n)
            rng.random((n, d)), rng.standard_normal((n, d))
        print(f"[{m}] reusing persisted items", flush=True)
    else:
        # ingest in its OWN txn so a failed/killed build never costs the
        # multi-minute host data-gen + store write again on retry
        t0 = time.perf_counter()
        with db.write() as t:
            t.drop_index(0)
            for lo in range(0, m, CHUNK):
                n = min(CHUNK, m - lo)
                w.add_items(
                    t,
                    np.arange(lo, lo + n, dtype=np.uint32),
                    clustered(rng, n, d, parents),
                )
        print(f"[{m}] ingest {time.perf_counter() - t0:.1f}s", flush=True)
    if not have_forest:
        t1 = time.perf_counter()
        with db.write() as t:
            w.builder(seed=seed).n_trees(trees).build(t)
        build_s = time.perf_counter() - t1
        print(f"[{m}] build {build_s:.1f}s", flush=True)
    r = Reader.open(db.read(), 0, db)
    return r, rng, parents, build_s


def measure(searcher, q, iters=8):
    dq = searcher.prepare_queries(q)
    t0 = time.perf_counter()
    jax.block_until_ready(searcher.device_fn(*dq))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [searcher.device_fn(*dq) for _ in range(iters)]
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    return len(q) * iters / dt, compile_s, outs[-1]


def recall_of(out, exact_sets, nq, k):
    ids = np.asarray(out[0])[:nq, :k]
    return sum(
        len(set(map(int, ri)) & es) for ri, es in zip(ids, exact_sets)
    ) / (nq * k)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", default="262144,524288,1048576")
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--trees", type=int, default=12)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--target", type=float, default=0.95)
    ap.add_argument("--sk0", type=int, default=2000)
    ap.add_argument("--out", default="results/crossover_r03.jsonl")
    args = ap.parse_args()
    k, b = args.k, args.batch

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    done = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            for line in f:
                try:
                    row = json.loads(line)
                    done[(row["m"], row["arm"], row["search_k"])] = row.get(
                        "recall"
                    )
                except Exception:
                    pass

    def emit(m, build_s, name, eng, sk_v, qps, rec, comp):
        print(
            f"[{m}x{args.d}] {name:14s} sk={sk_v:<6d} "
            f"{qps:9.0f} qps  recall@{k}={rec:.4f}  (compile {comp:.1f}s)",
            flush=True,
        )
        with open(args.out, "a") as f:
            f.write(
                json.dumps(
                    dict(
                        m=m, d=args.d, trees=args.trees, batch=b,
                        arm=name, engine=eng, search_k=sk_v,
                        qps=round(qps, 1), recall=round(rec, 4),
                        compile_s=round(comp, 2), build_s=round(build_s, 2),
                    )
                )
                + "\n"
            )

    for m in [int(v) for v in args.m.split(",")]:
        r, rng, parents, build_s = build_or_reuse(m, args.d, args.trees)
        q = clustered(rng, b, args.d, parents)
        nq = min(b, 64)
        exact = r.exact_by_vectors(q[:nq], k, fast=True)
        exact_sets = [set(i for i, _ in e) for e in exact]

        def arm(name, sk_v, **kw):
            """One measured arm; a per-arm failure (e.g. an HBM-bound
            config) records an error row instead of killing the sweep."""
            if (m, name, sk_v) in done:
                print(f"[{m}] skip {name} sk={sk_v} (recorded)", flush=True)
                rec = done[(m, name, sk_v)]
                return (rec, None, None) if rec is not None else None
            try:
                s = r.searcher(k, **kw)
                qps, comp, out = measure(s, q)
                rec = recall_of(out, exact_sets, nq, k)
                emit(m, build_s, name, s.engine, sk_v, qps, rec, comp)
                return rec, out, s
            except Exception as e:  # noqa: BLE001
                msg = str(e).splitlines()[0][:160]
                print(f"[{m}] {name} sk={sk_v} FAILED: {msg}", flush=True)
                with open(args.out, "a") as f:
                    f.write(
                        json.dumps(
                            dict(m=m, d=args.d, arm=name, search_k=sk_v,
                                 error=msg)
                        )
                        + "\n"
                    )
                return None

        arm("auto(default)", 0)  # THE default serving path

        sk, last_sk = args.sk0, None
        for _ in range(6):
            res = arm("forest", sk, search_k=sk, engine="forest")
            if res is not None:
                last_sk = sk
                if res[0] >= args.target:
                    break
            sk *= 2

        # single-pop reference arm at the tuned search_k (multipop delta)
        if last_sk is not None:
            arm("forest_sp", last_sk, search_k=last_sk,
                engine="forest", multipop=1)

        # filtered arm at 10% selectivity through the DEFAULT path: the
        # masked exact matmul serves filters at any corpus size
        # (reference's roaring-∩ role, src/reader.rs:354-360); results
        # are exact over the candidate set by construction, so the check
        # here is containment + qps.
        cand = np.arange(0, m, 10, dtype=np.uint32)
        if (m, "filtered10%", 0) not in done:
            try:
                s = r.searcher(k, candidates=cand)
                qps, comp, out = measure(s, q)
                ids = np.asarray(out[0])[:nq]
                ok = bool(np.isin(ids, cand).all())
                emit(m, build_s, "filtered10%", f"{s.engine} contained={ok}",
                     0, qps, 1.0, comp)
            except Exception as e:  # noqa: BLE001
                print(f"[{m}] filtered10% FAILED: {e}", flush=True)


if __name__ == "__main__":
    main()
