"""Measure the two-stage exact engines' cut-score dtype on chip.

The unfused two-stage pipeline (matmul -> [B, M] cut-score ->
approx_max_k(c) -> exact f32 re-score) is bound by the cut-score
matrix's HBM round trip (~1.6 GB at [2048, 100k] f32).  This experiment
races the f32 cut against a bf16 cut (ARROY_CUT_DTYPE) at both serving
precisions under the same steady-state chain protocol bench.py records,
on the same persisted bench index, and reports qps + measured recall so
the default can follow the measurement (serving-policy rule: serve the
measured-fastest at equal recall).

reference role: examples/search_movies.rs:38-64 (steady-state serving
loop is the measured contract).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # reuse the bench corpus + measurement protocol verbatim
from bench import (
    BATCH,
    COUNT,
    D,
    ITERS,
    M,
    N_TREES,
    _measure,
    _measure_chain,
    _mfu,
    _recall,
    make_corpus,
)


def main():
    import jax

    from arroy_tpu import Database, Reader, Writer

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    rng = np.random.default_rng(42)
    x = make_corpus(rng, M + BATCH * ITERS, D)
    x, queries = x[:M], x[M:]

    db_path = os.environ.get(
        "BENCH_DB", f"/tmp/arroy_bench_{M}x{D}_t{N_TREES}_clustered"
    )
    db = Database(db_path)
    st = db.read().state(0)
    have = (
        st is not None
        and st.metadata is not None
        and st.metadata.dimensions == D
        and len(st.metadata.items) == M
    )
    if not have:
        w = Writer(db, 0, D, metric="euclidean")
        with db.write() as wtxn:
            w.add_items(wtxn, np.arange(M, dtype=np.uint32), x)
            w.builder(seed=42).n_trees(N_TREES).build(wtxn)
    r = Reader.open(db.read(), 0, db)

    nq = min(BATCH, 128)
    exact = r.exact_by_vectors(queries[:nq], COUNT)
    exact_sets = [set(i for i, _ in e) for e in exact]

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "results",
        "cut_dtype_r05.jsonl",
    )
    # (precision, cut dtype, ARROY_EXACT_C override or None=default 32)
    arms = [
        ("int8", "f32", None),
        ("int8", "bf16", None),
        ("bf16", "f32", None),
        ("bf16", "bf16", None),
        ("int8", "bf16", 64),
    ]
    with open(out_path, "a") as f:
        for prec, cd, c in arms:
            os.environ["ARROY_CUT_DTYPE"] = cd
            if c is not None:
                os.environ["ARROY_EXACT_C"] = str(c)
            else:
                os.environ.pop("ARROY_EXACT_C", None)
            _measure_chain._dead = False  # each arm gets its own attempt
            t0 = time.perf_counter()
            s = r.searcher(COUNT, engine="exact", precision=prec)
            dqs = [
                s.prepare_queries(queries[i * BATCH : (i + 1) * BATCH])
                for i in range(ITERS)
            ]
            qps_d, compile_s, out = _measure(s, dqs, ITERS, BATCH)
            qps_c = _measure_chain(s, dqs, ITERS, BATCH)
            rec = _recall(out, exact_sets, nq, COUNT)
            qps = max(qps_d, qps_c or 0.0)
            tflops, mfu = _mfu(qps)
            row = {
                "precision": prec,
                "cut_dtype": cd,
                "c": c or 32,
                "qps_chain": round(qps_c, 1) if qps_c else None,
                "qps_dispatch": round(qps_d, 1),
                "recall": round(rec, 4),
                "mfu_bf16_peak": round(mfu, 4),
                "wall_s": round(time.perf_counter() - t0, 1),
            }
            line = json.dumps(row)
            print(line, flush=True)
            f.write(line + "\n")
            f.flush()


if __name__ == "__main__":
    main()
