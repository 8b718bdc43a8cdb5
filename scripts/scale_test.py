"""1M x 768-d on-chip scale check (STATUS.md next-round priority 3).

Run on the real TPU (one process at a time):
    python scripts/scale_test.py [M] [trees]

Prints build time, device HBM footprint, query QPS at a few operating
points, and sampled recall@10 vs the MXU exact oracle.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from arroy_tpu import Database, Reader, Writer  # noqa: E402
from arroy_tpu.device import DeviceIndex  # noqa: E402
from arroy_tpu.metrics import resolve_metric  # noqa: E402

M = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
TREES = int(sys.argv[2]) if len(sys.argv) > 2 else 12
D = 768
CHUNK = 100_000

est = DeviceIndex.estimate_nbytes(resolve_metric("euclidean"), D, M, TREES)
print(f"pre-build HBM estimate: {est / (1 << 30):.2f} GiB", flush=True)

db = Database(f"/tmp/db{M // 1000}k")
w = Writer(db, 0, D)
rng = np.random.default_rng(42)
# clustered corpus (same generator as bench.py)
parents = rng.standard_normal((64, D)).astype(np.float32)

st = db.read().state(0)
have = (
    st is not None
    and st.metadata is not None
    and st.metadata.dimensions == D
    and len(st.metadata.items) == M
    and len(st.metadata.roots) == TREES
    and not st.updated
)
if have:
    # keep the rng stream identical to the build path so the query
    # draws below stay reproducible
    for lo in range(0, M, CHUNK):
        n = min(CHUNK, M - lo)
        rng.integers(64, size=n), rng.integers(64, size=n)
        rng.random((n, D))
        rng.standard_normal((n, D))
    print("reusing persisted index", flush=True)
else:
    t0 = time.perf_counter()
    with db.write() as t:
        for lo in range(0, M, CHUNK):
            n = min(CHUNK, M - lo)
            pa, pb = rng.integers(64, size=n), rng.integers(64, size=n)
            mask = rng.random((n, D)) < 0.5
            x = np.where(mask, parents[pa], parents[pb]).astype(np.float32)
            x += 0.05 * rng.standard_normal((n, D)).astype(np.float32)
            w.add_items(t, np.arange(lo, lo + n, dtype=np.uint32), x)
        print(f"ingest: {time.perf_counter() - t0:.1f}s", flush=True)
        t1 = time.perf_counter()
        w.builder(seed=42).n_trees(TREES).build(t)
        print(f"build: {time.perf_counter() - t1:.1f}s", flush=True)

r = Reader.open(db.read(), 0, db)
dev = r._device()
print(f"actual device footprint: {dev.nbytes() / (1 << 30):.2f} GiB", flush=True)

# queries from the same crossover family as the corpus (random
# isotropic queries against a clustered corpus have no locality and
# make recall meaningless for ANY index)
nq = 256
pa, pb = rng.integers(64, size=nq), rng.integers(64, size=nq)
qmask = rng.random((nq, D)) < 0.5
q = np.where(qmask, parents[pa], parents[pb]).astype(np.float32)
q += 0.05 * rng.standard_normal((nq, D)).astype(np.float32)
exact = r.exact_by_vectors(q[:64], 10, fast=True)

# exact engine at scale (one [B,d]x[d,M] matmul per batch)
for prec in ("f32x1", "bf16"):
    s = r.searcher(10, engine="exact", precision=prec)
    dq = s.prepare_queries(q)
    jax.block_until_ready(s.device_fn(*dq))
    t0 = time.perf_counter()
    outs = [s.device_fn(*dq) for _ in range(10)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / 10
    ids = np.asarray(outs[-1][0])[:64, :10]
    hits = sum(
        len(set(map(int, ri)) & {i for i, _ in e}) for ri, e in zip(ids, exact)
    )
    rec = hits / (64 * 10)
    print(
        f"exact[{prec}]: {dt * 1e3:7.2f} ms/256 -> {256 / dt:8.0f} qps  "
        f"recall@10={rec:.3f}",
        flush=True,
    )

# the DEFAULT serving path (engine="auto" — VERDICT r2 item 1 done
# criterion: this must hit exact-engine qps at 1M)
s = r.searcher(10)
dq = s.prepare_queries(q)
jax.block_until_ready(s.device_fn(*dq))
t0 = time.perf_counter()
outs = [s.device_fn(*dq) for _ in range(10)]
jax.block_until_ready(outs)
dt = (time.perf_counter() - t0) / 10
ids = np.asarray(outs[-1][0])[:64, :10]
hits = sum(len(set(map(int, ri)) & {i for i, _ in e}) for ri, e in zip(ids, exact))
print(
    f"searcher() default [{s.engine}]: {dt * 1e3:7.2f} ms/256 -> {256 / dt:8.0f} qps"
    f"  recall@10={hits / 640:.3f}",
    flush=True,
)

for sk in (1000, 5000, 20000):
    s = r.searcher(10, search_k=sk, engine="forest")
    dq = s.prepare_queries(q)
    jax.block_until_ready(s.device_fn(*dq))
    t0 = time.perf_counter()
    outs = [s.device_fn(*dq) for _ in range(10)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / 10
    got = s(q[:64])
    hits = sum(
        len({i for i, _ in g} & {i for i, _ in e}) for g, e in zip(got, exact)
    )
    rec = hits / (64 * 10)
    print(
        f"sk={sk}: {dt * 1e3:7.2f} ms/256 -> {256 / dt:8.0f} qps  "
        f"recall@10={rec:.3f}",
        flush=True,
    )

# single-pop reference arm (multipop deviation delta at the big sk)
s = r.searcher(10, search_k=20000, engine="forest", multipop=1)
dq = s.prepare_queries(q)
jax.block_until_ready(s.device_fn(*dq))
t0 = time.perf_counter()
outs = [s.device_fn(*dq) for _ in range(10)]
jax.block_until_ready(outs)
dt = (time.perf_counter() - t0) / 10
got = s(q[:64])
hits = sum(len({i for i, _ in g} & {i for i, _ in e}) for g, e in zip(got, exact))
print(
    f"sk=20000 multipop=1: {dt * 1e3:7.2f} ms/256 -> {256 / dt:8.0f} qps  "
    f"recall@10={hits / 640:.3f}",
    flush=True,
)
