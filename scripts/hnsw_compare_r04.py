"""Two-curve competitor comparison: RP-forest vs HNSW (VERDICT r3 #9).

The reference's `compare_with_hnsw` example races arroy against the
`instant-distance` HNSW crate on 4,000 x 768-d Euclidean vectors
(reference: examples/compare_with_hnsw.rs:12-15,44-49).  Egress is
blocked, so the second curve comes from the in-repo single-thread HNSW
arm of `native/cpu_baseline.cc` (M-Y heuristic selection), run on the
IDENTICAL corpus/queries as the single-thread RP-forest arm and the TPU
engines.

Runs on the HOST (CPU arms) — TPU rows are imported from
results/*.jsonl if present, not re-measured here.

    python scripts/hnsw_compare_r04.py [--m 100000] [--d 768]

Writes results/hnsw_vs_forest_r04.json with both recall@10-vs-QPS
curves.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from cpu_baseline_bench import BIN, bench_corpus, ensure_binary, oracle

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "results", "hnsw_vs_forest_r04.json")


def score(path, orc, nq, count=10):
    got = np.fromfile(path, dtype=np.int32).reshape(nq, count)
    return float(
        np.mean([len(set(got[i].tolist()) & orc[i]) / count for i in range(nq)])
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=100_000)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--trees", type=int, default=10)
    args = ap.parse_args()

    ensure_binary()
    x, q = bench_corpus(m=args.m, dims=args.d)
    xp, qp = "/tmp/hc_x.npy", "/tmp/hc_q.npy"
    np.save(xp, x)
    np.save(qp, q)
    t0 = time.perf_counter()
    orc = oracle(x, q, "euclidean", 10)
    print(f"oracle: {time.perf_counter() - t0:.0f}s", flush=True)

    out = {"m": args.m, "d": args.d, "count": 10, "curves": {}}

    # curve 1: single-thread RP-forest (the reference's algorithm class)
    sks = [1000, 2000, 4000, 8000, 16000]
    proc = subprocess.run(
        [BIN, xp, qp, "euclidean", str(args.trees), str(args.d), "10",
         ",".join(map(str, sks)), "/tmp/hc_forest"],
        capture_output=True, text=True, check=True,
    )
    rows = [json.loads(l) for l in proc.stdout.splitlines()]
    build = next(r for r in rows if r["phase"] == "build")
    curve = []
    for r in rows:
        if r["phase"] != "query":
            continue
        rec = score(r["out"], orc, len(q))
        curve.append({"search_k": r["search_k"], "qps": r["qps"],
                      "recall_at_10": round(rec, 4)})
        print(f"forest sk={r['search_k']:<6} {r['qps']:8.1f} qps  "
              f"recall {rec:.4f}", flush=True)
    out["curves"]["rp_forest_1thread"] = {
        "build_s": build["seconds"], "points": curve}

    # curve 2: single-thread HNSW (M=16, efc=100 — ann-benchmarks-class)
    efs = [20, 40, 80, 160, 320]
    proc = subprocess.run(
        [BIN, xp, qp, "euclidean:hnsw", "16", "100", "10",
         ",".join(map(str, efs)), "/tmp/hc"],
        capture_output=True, text=True, check=True,
    )
    rows = [json.loads(l) for l in proc.stdout.splitlines()]
    build = next(r for r in rows if r["phase"] == "build")
    curve = []
    for r in rows:
        if r["phase"] != "query":
            continue
        rec = score(r["out"], orc, len(q))
        curve.append({"ef": r["ef"], "qps": r["qps"],
                      "recall_at_10": round(rec, 4)})
        print(f"hnsw   ef={r['ef']:<6} {r['qps']:8.1f} qps  "
              f"recall {rec:.4f}", flush=True)
    out["curves"]["hnsw_1thread"] = {
        "build_s": build["seconds"], "M": 16, "ef_construction": 100,
        "points": curve}

    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
