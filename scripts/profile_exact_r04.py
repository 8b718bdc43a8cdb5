"""Stage-level on-chip profile of the exact-engine pipeline (round 4).

Measures, at the bench config (M=100k, d=768, B=1024, k=10), the cost of
each stage in isolation so the MFU work targets the real bottleneck:

  1. f32 matmul alone
  2. bf16 matmul alone
  3. matmul + score elementwise (euclidean decomposition)
  4. matmul + score + lax.top_k(k)        (the current f32x1 tail)
  5. matmul + score + approx_max_k(c)     (the current bf16 select)
  6. ... + [B,c,d] gather + exact re-score (the current bf16 tail)

Run ON TPU:  python scripts/profile_exact_r04.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

M = int(os.environ.get("PROF_M", 100_000))
D = int(os.environ.get("PROF_D", 768))
B = int(os.environ.get("PROF_B", 1024))
K = 10
C = int(os.environ.get("PROF_C", 128))
ITERS = int(os.environ.get("PROF_ITERS", 10))


def bench(name, fn, *args, flops=None):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(ITERS)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / ITERS
    qps = B / dt
    extra = ""
    if flops:
        extra = f"  {flops / dt / 1e12:.1f} TFLOP/s ({flops / dt / 197e12:.1%} of bf16 peak)"
    print(f"{name:44s} {dt * 1e3:8.2f} ms/batch  {qps:9.0f} qps{extra}", flush=True)
    return dt


def main():
    print(f"devices: {jax.devices()}  M={M} D={D} B={B} C={C}", flush=True)
    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.standard_normal((M, D)).astype(np.float32))
    rows_bf = rows.astype(jnp.bfloat16)
    rows_t = jnp.asarray(np.ascontiguousarray(np.asarray(rows).T))  # [D, M]
    rows_t_bf = rows_t.astype(jnp.bfloat16)
    x2 = jnp.sum(rows * rows, axis=1)
    q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    q_bf = q.astype(jnp.bfloat16)
    mm_flops = 2.0 * B * M * D

    @jax.jit
    def mm_f32(q, r):
        return jax.lax.dot_general(q, r, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    @jax.jit
    def mm_f32_nt(q, rt):
        return jax.lax.dot_general(q, rt, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    @jax.jit
    def mm_bf16(q, r):
        return jax.lax.dot_general(q, r, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    @jax.jit
    def mm_score(q, r, x2):
        dots = jax.lax.dot_general(q, r, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        return 2.0 * dots - x2[None, :]

    @jax.jit
    def mm_score_sum(q, r, x2):
        return jnp.sum(mm_score(q, r, x2))

    @functools.partial(jax.jit, static_argnames=("k",))
    def mm_score_topk(q, r, x2, k):
        s = mm_score(q, r, x2)
        return jax.lax.top_k(s, k)

    @functools.partial(jax.jit, static_argnames=("c",))
    def mm_score_amaxk(q, r, x2, c):
        s = mm_score(q, r, x2)
        return jax.lax.approx_max_k(s, c, recall_target=0.98)

    @functools.partial(jax.jit, static_argnames=("c", "k"))
    def full_bf16(q, qbf, r, rbf, x2, c, k):
        dots = jax.lax.dot_general(qbf, rbf, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        s = 2.0 * dots - x2[None, :]
        _, cand = jax.lax.approx_max_k(s, c, recall_target=0.98)
        x = r[cand]  # [B, c, D]
        d = jnp.sum((q[:, None, :] - x) ** 2, axis=-1)
        return jax.lax.top_k(-d, k)

    @functools.partial(jax.jit, static_argnames=("c", "k"))
    def full_bf16_dotrescore(q, qbf, r, rbf, x2, c, k):
        # re-score via gathered dots instead of the (q-x)^2 broadcast
        dots = jax.lax.dot_general(qbf, rbf, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        s = 2.0 * dots - x2[None, :]
        _, cand = jax.lax.approx_max_k(s, c, recall_target=0.98)
        x = r[cand]  # [B, c, D]
        d2 = jnp.einsum("bd,bcd->bc", q, x, preferred_element_type=jnp.float32)
        dd = x2[cand] - 2.0 * d2
        return jax.lax.top_k(-dd, k)

    @functools.partial(jax.jit, static_argnames=("c", "k"))
    def full_bf16_norescore(qbf, rbf, x2, c, k):
        # bf16 select, then exact top_k over the c bf16 scores only
        dots = jax.lax.dot_general(qbf, rbf, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        s = 2.0 * dots - x2[None, :]
        sc, cand = jax.lax.approx_max_k(s, c, recall_target=0.98)
        return jax.lax.top_k(sc, k), cand

    bench("f32 matmul [B,M] (rhs contract dim1)", mm_f32, q, rows, flops=mm_flops)
    bench("f32 matmul [B,M] (rhs [D,M] dim0)", mm_f32_nt, q, rows_t, flops=mm_flops)
    bench("bf16 matmul [B,M]", mm_bf16, q_bf, rows_bf, flops=mm_flops)
    bench("bf16 matmul [B,M] (rhs [D,M])", mm_f32_nt, q_bf, rows_t_bf, flops=mm_flops)
    bench("f32 matmul+score+SUM (no select)", mm_score_sum, q, rows, x2, flops=mm_flops)
    bench("f32 matmul+score+top_k(10)", mm_score_topk, q, rows, x2, K, flops=mm_flops)
    bench(f"f32 matmul+score+approx_max_k({C})", mm_score_amaxk, q, rows, x2, C, flops=mm_flops)
    bench(f"bf16 matmul+score+approx_max_k({C})", mm_score_amaxk, q_bf, rows_bf, x2, C, flops=mm_flops)
    for c in (32, 64, 128):
        bench(f"bf16 two-stage c={c} (gather (q-x)^2)", full_bf16, q, q_bf, rows, rows_bf, x2, c, K, flops=mm_flops)
        bench(f"bf16 two-stage c={c} (gather dot)", full_bf16_dotrescore, q, q_bf, rows, rows_bf, x2, c, K, flops=mm_flops)
        bench(f"bf16 select-only c={c} (no re-score)", full_bf16_norescore, q_bf, rows_bf, x2, c, K, flops=mm_flops)
    # recall check of bf16 vs f32 top-k at the chosen c
    s_f32 = np.asarray(mm_score(q, rows, x2))
    oracle = np.argsort(-s_f32, axis=1)[:, :K]
    (_, _), cand = jax.block_until_ready(full_bf16_norescore(q_bf, rows_bf, x2, C, K))
    cand = np.asarray(cand)
    hits = sum(len(set(o) & set(cc)) for o, cc in zip(oracle, cand))
    print(f"bf16 approx_max_k({C}) candidate recall vs f32 oracle top-{K}: "
          f"{hits / (B * K):.4f}", flush=True)


if __name__ == "__main__":
    main()
