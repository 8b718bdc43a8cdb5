"""Pipelined throughput of the exact serving engine on a persisted index.

    python scripts/exact_bench.py [db_path] [B ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from arroy_tpu import Database, Reader  # noqa: E402

DB = sys.argv[1] if len(sys.argv) > 1 else "/tmp/arroy_bench_100000x768_t10_clustered"
BS = [int(a) for a in sys.argv[2:]] or [256, 1024]
ITERS = 20


def main():
    db = Database(DB)
    r = Reader.open(db.read(), 0, db)
    d = r.dimensions()
    rng = np.random.default_rng(7)
    q = rng.standard_normal((max(BS), d)).astype(np.float32)

    oracle = r.exact_by_vectors(q[:64], 10)
    o_sets = [{i for i, _ in row} for row in oracle]

    for prec in ("f32", "bf16"):
        s = r.searcher(10, engine="exact", precision=prec)
        for B in BS:
            dq = s.prepare_queries(q[:B])
            t0 = time.perf_counter()
            jax.block_until_ready(s.device_fn(*dq))
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            outs = [s.device_fn(*dq) for _ in range(ITERS)]
            jax.block_until_ready(outs)
            dt = (time.perf_counter() - t0) / ITERS
            ids = np.asarray(outs[-1][0])[:64, :10]
            hits = sum(len(set(map(int, ri)) & es) for ri, es in zip(ids, o_sets))
            recall = hits / (64 * 10)
            print(
                f"exact[{prec}] B={B:5d}: {dt*1e3:7.2f} ms/batch -> "
                f"{B/dt:9.0f} qps  recall@10={recall:.4f}  (compile {compile_s:.1f}s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
