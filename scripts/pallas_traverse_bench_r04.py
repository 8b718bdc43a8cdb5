"""On-chip decision bench for the Pallas traversal kernel (VERDICT r3 #6).

Builds (or reloads) a 100k x 768 clustered index and measures the
best-first forest traversal with ARROY_TRAVERSAL=pallas vs xla at two
search_k points, plus the probe engine for context.

Run ON TPU:  python scripts/pallas_traverse_bench_r04.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

M = int(os.environ.get("PM", 100_000))
D = int(os.environ.get("PD", 768))
T = int(os.environ.get("PT", 10))
B = int(os.environ.get("PB", 256))
ITERS = 6

from arroy_tpu import Database, Reader, Writer


def make_corpus(rng, m, d):
    parents = rng.standard_normal((64, d)).astype(np.float32)
    pa = rng.integers(64, size=m)
    pb = rng.integers(64, size=m)
    mask = rng.random((m, d)) < 0.5
    x = np.where(mask, parents[pa], parents[pb]).astype(np.float32)
    x += 0.05 * rng.standard_normal((m, d)).astype(np.float32)
    return x


def main():
    print(f"devices: {jax.devices()}  M={M} D={D} T={T} B={B}", flush=True)
    rng = np.random.default_rng(42)
    x = make_corpus(rng, M, D)
    path = f"/tmp/arroy_bench_{M}x{D}_t{T}_clustered"
    db = Database(path)
    try:
        r = Reader.open(db.read(), 0, db)
        print(f"reloaded {path}", flush=True)
    except Exception:
        w = Writer(db, 0, D, metric="euclidean")
        with db.write() as t:
            w.add_items(t, np.arange(M, dtype=np.uint32), x)
            w.builder(seed=42).n_trees(T).build(t)
        r = Reader.open(db.read(), 0, db)

    qs = [
        make_corpus(np.random.default_rng(1000 + i), B, D) for i in range(ITERS)
    ]
    oracle = {i: r.exact_by_vectors(qs[0][:64], 10) for i in (0,)}[0]

    def timed(s, label):
        """Device-resident timing (distinct batches per iteration — the
        relay caches bit-identical executions; see bench.py::_measure)."""
        import jax as _jax

        dqs = [s.prepare_queries(q) for q in qs]
        _jax.block_until_ready(s.device_fn(*dqs[0]))  # compile + warm
        t0 = time.perf_counter()
        outs = [s.device_fn(*dqs[i]) for i in range(ITERS)]
        _jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / ITERS
        got = s(qs[0][:64])
        hits = sum(
            len({i for i, _ in g} & {i for i, _ in o})
            for g, o in zip(got, oracle)
        )
        rec = hits / (64 * 10)
        print(
            f"{label:<28} {dt * 1e3:8.1f} ms/batch {B / dt:9.0f} qps"
            f"  recall@10={rec:.4f}",
            flush=True,
        )

    for sk in (2000, 8000):
        for trav in ("xla", "pallas"):
            os.environ["ARROY_TRAVERSAL"] = trav
            try:
                s = r.searcher(
                    10, engine="forest", search_k=sk, traversal="best-first"
                )
                timed(s, f"traversal={trav} sk={sk}")
            except Exception as e:
                print(f"traversal={trav} sk={sk} FAILED: {type(e).__name__}: {e}",
                      flush=True)
        os.environ.pop("ARROY_TRAVERSAL", None)

    for sk in (8000,):
        s = r.searcher(10, engine="forest", search_k=sk, traversal="probe")
        timed(s, f"traversal=probe sk={sk}")


if __name__ == "__main__":
    main()
