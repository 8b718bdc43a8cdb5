"""Fused Pallas select vs unfused two-stage exact serving, measured
under the SAME steady-state chain protocol the driver bench records
(VERDICT r4 weak #2 / next #3): r4 shipped the fused kernel as the
default while its own artifact measured it 0.87x the unfused bf16 path
end-to-end, and never measured the unfused int8 arm at all.  This
script measures all four (precision x fused) arms — dispatch loop AND
chained scan — on the persisted driver-bench index so the serving
default can be the measured-fastest per precision.

Run ON TPU:  python scripts/fused_vs_unfused_r05.py
Appends JSON lines to results/fused_vs_unfused_r05.jsonl.

reference role: "benchmark what you serve" (examples/search_movies.rs).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench
from arroy_tpu import Database, Reader

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "results",
    "fused_vs_unfused_r05.jsonl",
)


def emit(rec):
    rec["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    print(f"devices: {jax.devices()}", flush=True)

    M, D, BATCH, ITERS, COUNT = bench.M, bench.D, bench.BATCH, bench.ITERS, bench.COUNT
    rng = np.random.default_rng(42)
    x = bench.make_corpus(rng, M + BATCH * ITERS, D)
    x, queries = x[:M], x[M:]
    db_path = f"/tmp/arroy_bench_{M}x{D}_t{bench.N_TREES}_{bench.DATA}"
    db = Database(db_path)
    r = Reader.open(db.read(), 0, db)
    assert r.n_items() == M, "run bench.py once first to persist the index"

    nq = min(BATCH, 128)
    exact = r.exact_by_vectors(queries[:nq], COUNT)
    exact_sets = [set(i for i, _ in e) for e in exact]

    for fused in ("1", "0"):
        os.environ["ARROY_EXACT_FUSED"] = fused
        for mode in ("bf16", "int8"):
            bench._measure_chain._dead = False  # per-arm, not sticky here
            s = r.searcher(COUNT, engine="exact", precision=mode)
            dqs = [
                s.prepare_queries(queries[i * BATCH : (i + 1) * BATCH])
                for i in range(ITERS)
            ]
            qps_d, compile_s, out = bench._measure(s, dqs, ITERS, BATCH)
            qps_c = bench._measure_chain(s, dqs, ITERS, BATCH)
            rec = bench._recall(out, exact_sets, nq, COUNT)
            tflops, mfu = bench._mfu(max(qps_d, qps_c or 0.0))
            emit(
                {
                    "arm": f"{mode}_fused{fused}",
                    "qps_dispatch": round(qps_d, 1),
                    "qps_chain": round(qps_c, 1) if qps_c else None,
                    "recall": round(rec, 4),
                    "mfu_best": round(mfu, 4),
                    "compile_s": round(compile_s, 2),
                    "batch": BATCH,
                    "m": M,
                    "d": D,
                }
            )


if __name__ == "__main__":
    main()
