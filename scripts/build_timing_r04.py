"""Timed build at the bench config with per-level dispatch breakdown.

Run ON TPU:  ARROY_BUILD_TIMING=2 python scripts/build_timing_r04.py
Env: TIM_M / TIM_D / TIM_T to change the config.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("ARROY_BUILD_TIMING", "2")

M = int(os.environ.get("TIM_M", 100_000))
D = int(os.environ.get("TIM_D", 768))
T = int(os.environ.get("TIM_T", 10))

import jax

cache_dir = os.environ.get("JAX_CACHE_DIR", "/root/repo/.jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from arroy_tpu import Database, Writer


def make_corpus(rng, m, d):
    parents = rng.standard_normal((64, d)).astype(np.float32)
    pa = rng.integers(64, size=m)
    pb = rng.integers(64, size=m)
    mask = rng.random((m, d)) < 0.5
    x = np.where(mask, parents[pa], parents[pb]).astype(np.float32)
    x += 0.05 * rng.standard_normal((m, d)).astype(np.float32)
    return x


def main():
    print(f"devices: {jax.devices()}  M={M} D={D} T={T}", flush=True)
    rng = np.random.default_rng(42)
    x = make_corpus(rng, M, D)
    path = os.environ.get("TIM_DB", "/tmp/arroy_r04_timing")
    reuse = os.environ.get("TIM_REUSE", "0") == "1"
    have = False
    if reuse:
        try:
            db = Database(path)
            st = db.read().state(0)
            have = (
                st is not None
                and st.metadata is not None
                and st.metadata.dimensions == D
                and len(st.metadata.items) == M
            )
        except Exception:
            have = False
    if not have:
        shutil.rmtree(path, ignore_errors=True)
        db = Database(path)
    w = Writer(db, 0, D, metric="euclidean")
    if have:
        print(f"reusing persisted index at {path} (cold build skipped)",
              flush=True)
    else:
        with db.write() as wtxn:
            t0 = time.perf_counter()
            w.add_items(wtxn, np.arange(M, dtype=np.uint32), x)
            t1 = time.perf_counter()
            w.builder(seed=42).n_trees(T).build(wtxn)
            t2 = time.perf_counter()
        print(f"add_items: {t1 - t0:.2f}s  build: {t2 - t1:.2f}s", flush=True)
    n_runs = int(os.environ.get("TIM_RUNS", 2))
    # TIM_CLEAR=1: measure clear+add+build (a pure fresh rebuild — the
    # figure comparable to the CPU baseline's from-scratch build, and to
    # r03's glove_build warm numbers).  Default: re-add over the live
    # index, which ALSO pays the delete-collapse + re-insert routing.
    clear = os.environ.get("TIM_CLEAR", "0") == "1"
    for i in range(1, n_runs):
        with db.write() as wtxn:
            if clear:
                w.clear(wtxn)
                w.add_items(wtxn, np.arange(M, dtype=np.uint32), x)
                t0 = time.perf_counter()
            else:
                w.add_items(wtxn, np.arange(M, dtype=np.uint32), x)
                t0 = time.perf_counter()
            w.builder(seed=42 + i).n_trees(T).build(wtxn)
            print(
                f"warm build {i}{' (clear)' if clear else ''}: "
                f"{time.perf_counter() - t0:.2f}s",
                flush=True,
            )


if __name__ == "__main__":
    main()
