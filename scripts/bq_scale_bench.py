"""1M-item binary-quantized exact serving on one chip.

Exercises the streaming popcount scan (`_exact_bq_scan`) past the 1 GB
distance-matrix budget and the in-matrix path below it; recall oracle is
the same popcount metric, so the interesting axes are qps and agreement
between the two paths (reference BQ semantics:
src/distance/binary_quantized_cosine.rs, spaces/simple.rs:119-131).

    python scripts/bq_scale_bench.py [m] [batch]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from arroy_tpu import Database, Reader, Writer  # noqa: E402

M = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
B = int(sys.argv[2]) if len(sys.argv) > 2 else 512
D = 768
DBP = f"/tmp/bq_bench_{M}x{D}"


def main():
    rng = np.random.default_rng(11)
    parents = rng.standard_normal((64, D)).astype(np.float32)
    pa, pb = rng.integers(64, size=M + B), rng.integers(64, size=M + B)
    mask = rng.random((M + B, D)) < 0.5
    x = np.where(mask, parents[pa], parents[pb]).astype(np.float32)
    x += 0.05 * rng.standard_normal((M + B, D)).astype(np.float32)
    x, q = x[:M], x[M:]

    db = Database(DBP)
    st = db.read().state(0)
    have = (
        st is not None and st.metadata is not None
        and len(st.metadata.items) == M and not st.updated
    )
    w = Writer(db, 0, D, metric="binary quantized cosine")
    if not have:
        t0 = time.perf_counter()
        with db.write() as t:
            w.add_items(t, np.arange(M, dtype=np.uint32), x)
            w.builder(seed=3).n_trees(2).build(t)
        print(f"build: {time.perf_counter() - t0:.1f}s", flush=True)
    r = Reader.open(db.read(), 0, db, metric="binary quantized cosine")

    s = r.searcher(10, engine="exact")
    dq = s.prepare_queries(q[:B])
    t0 = time.perf_counter()
    out = s.device_fn(*dq)
    jax.block_until_ready(out)
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)
    iters = 8
    t0 = time.perf_counter()
    outs = [s.device_fn(*dq) for _ in range(iters)]
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    mode = "scan" if B * M * 4 > 1 << 30 else "matrix"
    print(f"bq exact[{mode}] B={B}: {iters * B / dt:.0f} qps", flush=True)

    # agreement check: small batch takes the in-matrix path
    bs = 64
    s2 = r.searcher(10, engine="exact")
    small = s2.prepare_queries(q[:bs])
    o2 = s2.device_fn(*small)
    ids_small = np.asarray(o2[0])[:, :10]
    ids_big = np.asarray(outs[-1][0])[:bs, :10]
    agree = float(np.mean(ids_small == ids_big))
    print(f"scan-vs-matrix id agreement: {agree:.4f}", flush=True)


if __name__ == "__main__":
    main()
