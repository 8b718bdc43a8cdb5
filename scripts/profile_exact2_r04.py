"""Round-4 exact-engine profile, part 2: matmul efficiency levers.

Measurement notes (hard-won): the axon relay CACHES executions with
bit-identical (program, inputs) — repeated calls on the same query batch
return in ~0.4 ms without running, inflating "throughput" 100x.  Every
iteration here therefore uses a DISTINCT query batch (fresh randomness),
dispatched pipelined (server-style) with one block at the end, and
raw-matmul variants return a reduction so outputs stay small.

Run ON TPU:  python scripts/profile_exact2_r04.py
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
K = 10
ITERS = int(os.environ.get("PROF_ITERS", 6))


def bench_multi(name, fn, qs, *args, flops=None, batch=None):
    """Dispatch fn once per distinct query batch in qs; block at the end."""
    jax.block_until_ready(fn(qs[-1], *args))  # compile warm-up
    t0 = time.perf_counter()
    outs = [fn(q, *args) for q in qs]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / len(qs)
    # trust check: if block_until_ready lied, fetching forces completion
    # and t_fetch blows past dt * len(qs)
    t1 = time.perf_counter()
    for o in outs:
        np.asarray(jax.tree.leaves(o)[0][:1])
    t_fetch = (time.perf_counter() - t1) / len(qs)
    if t_fetch > max(2.0 * dt, 0.06):
        print(f"  !! fetch {t_fetch * 1e3:.2f} ms/iter >> block {dt * 1e3:.2f} — "
              "block_until_ready unreliable, using fetch-inclusive time")
        dt = dt + t_fetch
    extra = ""
    if flops:
        extra = f"  {flops / dt / 1e12:.1f} TFLOP/s ({flops / dt / 197e12:.1%} bf16-peak)"
    if batch:
        extra += f"  {batch / dt:9.0f} qps"
    print(f"{name:46s} {dt * 1e3:8.2f} ms{extra}", flush=True)
    return dt


def main():
    print(f"devices: {jax.devices()}  M={M} D={D} ITERS={ITERS}", flush=True)
    rng = np.random.default_rng(0)

    rows = rng.standard_normal((M, D)).astype(np.float32)
    x2_np = np.sum(rows * rows, axis=1)
    scale = np.abs(rows).max() / 127.0
    rows_i8 = np.clip(np.rint(rows / scale), -127, 127).astype(np.int8)

    rows_bf = jnp.asarray(rows).astype(jnp.bfloat16)
    rows_i8_d = jnp.asarray(rows_i8)
    rows_f32 = jnp.asarray(rows)
    x2 = jnp.asarray(x2_np)
    x2q = jnp.asarray((x2_np / (scale * scale)).astype(np.float32))

    @jax.jit
    def mm_bf16_sum(q, r):
        o = jax.lax.dot_general(q, r, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return jnp.sum(o, axis=1)

    @jax.jit
    def mm_i8_sum(q, r):
        o = jax.lax.dot_general(q, r, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return jnp.sum(o, axis=1)

    @functools.partial(jax.jit, static_argnames=("c", "k"))
    def two_stage_bf16(qpair, rf, rbf, x2, c, k):
        q, qbf = qpair
        dots = jax.lax.dot_general(qbf, rbf, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        s = 2.0 * dots - x2[None, :]
        _, cand = jax.lax.approx_max_k(s, c, recall_target=0.95)
        x = rf[cand]
        d2 = jnp.einsum("bd,bcd->bc", q, x, preferred_element_type=jnp.float32)
        dd = x2[cand] - 2.0 * d2
        nd, ti = jax.lax.top_k(-dd, k)
        return jnp.take_along_axis(cand, ti, axis=1), -nd

    @functools.partial(jax.jit, static_argnames=("c", "k"))
    def two_stage_i8(qpair, rf, ri8, x2, x2q, c, k):
        q, qi8 = qpair
        doti = jax.lax.dot_general(qi8, ri8, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.int32)
        s = 2.0 * doti.astype(jnp.float32) - x2q[None, :]
        _, cand = jax.lax.approx_max_k(s, c, recall_target=0.95)
        x = rf[cand]
        d2 = jnp.einsum("bd,bcd->bc", q, x, preferred_element_type=jnp.float32)
        dd = x2[cand] - 2.0 * d2
        nd, ti = jax.lax.top_k(-dd, k)
        return jnp.take_along_axis(cand, ti, axis=1), -nd

    @functools.partial(jax.jit, static_argnames=("k",))
    def direct_f32(q, rf, x2, k):
        dots = jax.lax.dot_general(q, rf, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        d = x2[None, :] - 2.0 * dots
        neg, idx = jax.lax.top_k(-d, k)
        return idx, -neg

    for B in (1024, 2048):
        qs_np = [rng.standard_normal((B, D)).astype(np.float32) for _ in range(ITERS)]
        qs = [jnp.asarray(q) for q in qs_np]
        qs_bf = [q.astype(jnp.bfloat16) for q in qs]
        qs_i8 = [
            jnp.asarray(np.clip(np.rint(q / scale), -127, 127).astype(np.int8))
            for q in qs_np
        ]
        pairs_bf = list(zip(qs, qs_bf))
        pairs_i8 = list(zip(qs, qs_i8))
        fl = 2.0 * B * M * D

        bench_multi(f"B={B} bf16 mm (sum-reduced)", mm_bf16_sum, qs_bf, rows_bf,
                    flops=fl, batch=B)
        bench_multi(f"B={B} int8 mm (sum-reduced)", mm_i8_sum, qs_i8, rows_i8_d,
                    flops=fl, batch=B)
        bench_multi(f"B={B} direct f32+top_k(10)", direct_f32, qs, rows_f32, x2, K,
                    flops=fl, batch=B)
        for c in (32, 64):
            bench_multi(f"B={B} two-stage bf16 c={c}", two_stage_bf16,
                        pairs_bf, rows_f32, rows_bf, x2, c, K, flops=fl, batch=B)
            bench_multi(f"B={B} two-stage int8 c={c}", two_stage_i8,
                        pairs_i8, rows_f32, rows_i8_d, x2, x2q, c, K,
                        flops=fl, batch=B)

        if B == 1024:
            qd, qbf, qi8 = qs[0], qs_bf[0], qs_i8[0]
            dots = np.asarray(
                jnp.dot(qd, rows_f32.T, preferred_element_type=jnp.float32)
            )
            d_f32 = x2_np[None, :] - 2.0 * dots
            oracle = np.argpartition(d_f32, K, axis=1)[:, :K]
            for name, ids in (
                ("bf16 c=32", two_stage_bf16((qd, qbf), rows_f32, rows_bf, x2, 32, K)[0]),
                ("int8 c=32", two_stage_i8((qd, qi8), rows_f32, rows_i8_d, x2, x2q, 32, K)[0]),
                ("int8 c=64", two_stage_i8((qd, qi8), rows_f32, rows_i8_d, x2, x2q, 64, K)[0]),
                ("direct f32", direct_f32(qd, rows_f32, x2, K)[0]),
            ):
                ids = np.asarray(jax.block_until_ready(ids))
                hits = sum(len(set(o) & set(cc)) for o, cc in zip(oracle, ids))
                print(f"  recall@{K} {name}: {hits / (B * K):.4f}", flush=True)


if __name__ == "__main__":
    main()
