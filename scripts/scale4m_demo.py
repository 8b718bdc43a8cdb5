"""4M x 768 bf16-resident streaming exact serving demo (VERDICT r2 item 5).

The f32 item matrix at 4M x 768 is 12.3 GB — it does not fit v5e-1 HBM
alongside anything else, so this demo serves from a bfloat16-resident
corpus (6.1 GB; `ARROY_SERVING_DTYPE=bf16`) through the chunked
streaming exact scan.  Recall@10 is measured against a HOST numpy f32
oracle (the on-device oracle would read the same bf16 rows and hide the
quantization).

    python scripts/scale4m_demo.py [M] [D]

The index is built with split_after=M (single descendants node — the
forest is irrelevant to the exact engine and a 4M tree build would pay
a 12 GB streaming build for nothing).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ["ARROY_SERVING_DTYPE"] = "bf16"

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from arroy_tpu import Database, Reader, Writer  # noqa: E402

M = int(sys.argv[1]) if len(sys.argv) > 1 else 4_194_304
D = int(sys.argv[2]) if len(sys.argv) > 2 else 768
B = 256
CHUNK = 262_144

rng = np.random.default_rng(42)
parents = rng.standard_normal((64, D)).astype(np.float32)


def clustered(n):
    pa, pb = rng.integers(64, size=n), rng.integers(64, size=n)
    mask = rng.random((n, D)) < 0.5
    x = np.where(mask, parents[pa], parents[pb]).astype(np.float32)
    x += 0.05 * rng.standard_normal((n, D)).astype(np.float32)
    return x


print(f"generating {M}x{D} clustered corpus on host...", flush=True)
t0 = time.perf_counter()
x = np.empty((M, D), np.float32)
for lo in range(0, M, CHUNK):
    n = min(CHUNK, M - lo)
    x[lo : lo + n] = clustered(n)
print(f"corpus: {time.perf_counter() - t0:.1f}s ({x.nbytes / (1 << 30):.1f} GiB)", flush=True)

db = Database()  # in-memory: the 12 GB matrix should not hit /tmp
w = Writer(db, 0, D)
t0 = time.perf_counter()
with db.write() as t:
    for lo in range(0, M, CHUNK):
        n = min(CHUNK, M - lo)
        w.add_items(t, np.arange(lo, lo + n, dtype=np.uint32), x[lo : lo + n])
    w.builder(seed=42).split_after(M).build(t)  # single-leaf metadata
print(f"ingest+meta: {time.perf_counter() - t0:.1f}s", flush=True)

r = Reader.open(db.read(), 0, db)
dev = r._device()
print(
    f"device footprint: {dev.nbytes() / (1 << 30):.2f} GiB"
    f"  (rows dtype {dev.rows.dtype})",
    flush=True,
)

q = clustered(B)
nq = 64
print("host f32 oracle...", flush=True)
t0 = time.perf_counter()
x2 = np.einsum("md,md->m", x, x, dtype=np.float32)
dots = q[:nq] @ x.T  # [nq, M]
d2 = x2[None, :] - 2.0 * dots + np.einsum("bd,bd->b", q[:nq], q[:nq])[:, None]
want = np.argpartition(d2, 10, axis=1)[:, :10]
exact_sets = [set(map(int, row)) for row in want]
print(f"oracle: {time.perf_counter() - t0:.1f}s", flush=True)

for prec in ("bf16", "f32x1"):
    s = r.searcher(10, engine="exact", precision=prec)
    dq = s.prepare_queries(q)
    t0 = time.perf_counter()
    jax.block_until_ready(s.device_fn(*dq))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [s.device_fn(*dq) for _ in range(8)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / 8
    ids = np.asarray(outs[-1][0])[:nq, :10]
    hits = sum(len(set(map(int, ri)) & es) for ri, es in zip(ids, exact_sets))
    rec = hits / (nq * 10)
    tflops = 2.0 * M * D * (B / dt) / 1e12
    print(
        f"exact[{prec}, bf16-resident]: {dt * 1e3:7.2f} ms/{B} -> "
        f"{B / dt:8.0f} qps  recall@10={rec:.4f}  "
        f"{tflops:.1f} TFLOP/s  (compile {compile_s:.1f}s)",
        flush=True,
    )
