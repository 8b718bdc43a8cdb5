"""Measured CPU denominator (round 3): race the C++ RP-forest baseline.

Builds `arroy_tpu/native/cpu_baseline.cc` (an independent, honest
single-thread implementation of the reference's algorithm class — see
that file's header) and runs it on the exact corpora the TPU benches
use, then scores recall against a numpy brute-force oracle.  Replaces
BASELINE_CPU.json's *estimated* single-thread figures with numbers
measured on the recorded host hardware.

    python scripts/cpu_baseline_bench.py [glove|bench|both]

Writes results/cpu_baseline_r03.json and one human log line per point.
Single-threaded on purpose: this host exposes one core, and the public
ann-benchmarks yardstick is also single-thread; the multi-core
extrapolation stays a documented multiplier in BASELINE_CPU.json.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BIN = "/tmp/cpu_baseline"
SRC = os.path.join(REPO, "arroy_tpu/native/cpu_baseline.cc")


def ensure_binary():
    if not os.path.exists(BIN) or os.path.getmtime(BIN) < os.path.getmtime(SRC):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-funroll-loops", "-o", BIN, SRC],
            check=True,
        )


def glove_corpus(m=1_183_514, dims=100, queries=256, seed=42):
    """Same generator as cli/recall_sweep.py --data glove (seed-exact)."""
    rng = np.random.default_rng(seed)
    n = m + queries
    n_clusters = 1024
    sizes = rng.zipf(1.3, size=n_clusters).astype(np.float64)
    probs = sizes / sizes.sum()
    rank = max(dims // 4, 4)
    basis = rng.standard_normal((rank, dims)).astype(np.float32)
    centers = rng.standard_normal((n_clusters, rank)).astype(np.float32) @ basis
    scales = np.exp(rng.normal(-0.7, 0.5, n_clusters)).astype(np.float32)
    cl = rng.choice(n_clusters, size=n, p=probs)
    allx = centers[cl] + scales[cl][:, None] * (
        rng.standard_normal((n, rank)).astype(np.float32) @ basis
        + 0.1 * rng.standard_normal((n, dims)).astype(np.float32)
    )
    allx *= np.exp(rng.normal(0.0, 0.4, n)).astype(np.float32)[:, None]
    return allx[:m], allx[m:]


def bench_corpus(m=100_000, dims=768, queries=256, seed=42):
    """Same clustered crossover corpus as bench.py (seed-exact: bench
    generates m + BATCH(=1024) rows and queries are the tail)."""
    rng = np.random.default_rng(seed)
    n = m + 1024
    parents = rng.standard_normal((64, dims)).astype(np.float32)
    pa, pb = rng.integers(64, size=n), rng.integers(64, size=n)
    mask = rng.random((n, dims)) < 0.5
    x = np.where(mask, parents[pa], parents[pb]).astype(np.float32)
    x += 0.05 * rng.standard_normal((n, dims)).astype(np.float32)
    return x[:m], x[m : m + queries]


def oracle(x, q, metric, k=10, chunk=65_536):
    """Brute-force top-k id sets (numpy, chunked over the corpus)."""
    if metric == "cosine":
        xs = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-30)
        qs = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
    best_d = np.full((len(q), k), np.inf, np.float32)
    best_i = np.full((len(q), k), -1, np.int64)
    for off in range(0, len(x), chunk):
        if metric == "cosine":
            d = 1.0 - qs @ xs[off : off + chunk].T
        else:
            xc = x[off : off + chunk]
            d = (
                (q**2).sum(1, keepdims=True)
                - 2.0 * (q @ xc.T)
                + (xc**2).sum(1)[None, :]
            )
        alld = np.concatenate([best_d, d], axis=1)
        alli = np.concatenate(
            [best_i, np.tile(np.arange(off, off + d.shape[1]), (len(q), 1))],
            axis=1,
        )
        sel = np.argpartition(alld, k, axis=1)[:, :k]
        best_d = np.take_along_axis(alld, sel, axis=1)
        best_i = np.take_along_axis(alli, sel, axis=1)
    return [set(row.tolist()) for row in best_i]


def run_config(name, x, q, metric, n_trees, split_after, sks, count=10):
    xp, qp = f"/tmp/cb_{name}_x.npy", f"/tmp/cb_{name}_q.npy"
    np.save(xp, x)
    np.save(qp, q)
    t0 = time.perf_counter()
    orc = oracle(x, q, metric, count)
    print(f"[{name}] oracle: {time.perf_counter() - t0:.0f}s", flush=True)
    proc = subprocess.run(
        [
            BIN, xp, qp, metric, str(n_trees), str(split_after), str(count),
            ",".join(map(str, sks)), f"/tmp/cb_{name}",
        ],
        capture_output=True, text=True, check=True,
    )
    rows = []
    for line in proc.stdout.splitlines():
        rec = json.loads(line)
        if rec["phase"] == "build":
            print(f"[{name}] build {n_trees} trees: {rec['seconds']:.0f}s "
                  f"({rec['fallbacks']}/{rec['splits']} fallback splits)",
                  flush=True)
            rows.append({"config": name, **rec})
        else:
            got = np.fromfile(rec["out"], dtype=np.int32).reshape(len(q), count)
            rc = float(np.mean(
                [len(set(g.tolist()) & o) / count for g, o in zip(got, orc)]
            ))
            rec["recall"] = round(rc, 4)
            print(f"[{name}] sk={rec['search_k']:>6} "
                  f"recall@{count}={rc:.4f} qps={rec['qps']:.0f}", flush=True)
            rows.append({"config": name, **rec})
    return rows


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    ensure_binary()
    out = {"host": open("/proc/cpuinfo").read().split("model name\t: ")[1]
           .split("\n")[0], "cores": os.cpu_count(), "rows": []}
    if which in ("bench", "both"):
        x, q = bench_corpus()
        out["rows"] += run_config(
            "bench100k", x, q, "euclidean", 10, 768,
            [2000, 8000, 20000, 50000],
        )
        del x, q
    if which in ("glove", "both"):
        x, q = glove_corpus()
        out["rows"] += run_config(
            "glove1m18", x, q, "cosine", 25, 100,
            [1000, 5000, 10000, 20000, 50000],
        )
    path = os.path.join(REPO, "results/cpu_baseline_r03.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
