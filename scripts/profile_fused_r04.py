"""On-chip profile: fused Pallas exact-select vs the unfused two-stage.

Run ON TPU:  python scripts/profile_fused_r04.py
Env: FM / FD / FB (corpus size / dims / batch), ITERS.

Timing uses distinct query batches per iteration (the axon relay caches
executions keyed on bit-identical inputs) and fetch-inclusive timing
when block_until_ready disagrees with the fetch (see
results/exact_profile_r04.log for the rationale).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

M = int(os.environ.get("FM", 100_000))
D = int(os.environ.get("FD", 768))
B = int(os.environ.get("FB", 2048))
ITERS = int(os.environ.get("ITERS", 8))
K = 10

from arroy_tpu.ops.pallas_exact import DEFAULT_BM, fused_block_select


def bench(name, fn, batches, flops):
    outs = [fn(*b) for b in batches[:2]]
    jax.block_until_ready(outs)  # compile + warm
    t0 = time.perf_counter()
    outs = [fn(*b) for b in batches]
    jax.block_until_ready(outs)
    t1 = time.perf_counter()
    # fetch a scalar per output to defeat any async reporting
    s = sum(float(jnp.sum(o[0][:1, :1])) for o in outs)
    t2 = time.perf_counter()
    dt_block = (t1 - t0) / len(batches)
    dt_fetch = (t2 - t0) / len(batches)
    dt = dt_block if dt_fetch < 1.8 * dt_block else dt_fetch
    note = "" if dt is dt_block else "  (fetch-inclusive)"
    tf = flops / dt / 1e12
    print(
        f"{name:<44} {dt * 1e3:8.2f} ms  {tf:6.1f} TFLOP/s "
        f"({tf / 197 * 100:5.1f}% bf16-peak)  {B / dt:10.0f} qps{note}",
        flush=True,
    )
    _ = s
    return dt


def main():
    print(f"devices: {jax.devices()}  M={M} D={D} B={B}", flush=True)
    rng = np.random.default_rng(42)
    x = rng.standard_normal((M, D)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    queries = [
        jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
        for _ in range(ITERS)
    ]

    # tables (euclidean scoring)
    mp = -(-M // DEFAULT_BM) * DEFAULT_BM
    p2s = np.zeros(mp, np.int32)
    p2s[:M] = rng.permutation(M).astype(np.int32)
    xp = x[p2s]
    x2 = np.sum(xp * xp, axis=1)
    valid = np.arange(mp) < M
    mx = np.max(np.abs(xp), axis=1)
    iscale = np.where(mx > 0, mx / 127.0, 1.0).astype(np.float32)
    xi8 = jnp.asarray(
        np.clip(np.round(xp / iscale[:, None]), -127, 127).astype(np.int8)
    )
    xbf = jnp.asarray(xp, jnp.bfloat16)
    mult_i8 = jnp.asarray(np.where(valid, 2.0 * iscale, 0.0).astype(np.float32))
    mult_bf = jnp.asarray(np.where(valid, 2.0, 0.0).astype(np.float32))
    add = jnp.asarray(np.where(valid, -x2, -np.inf).astype(np.float32))
    rows = jnp.asarray(x)
    flops = 2.0 * B * M * D

    @jax.jit
    def fused_i8(qv):
        qmax = jnp.max(jnp.abs(qv), axis=1)
        qsc = jnp.where(qmax > 0, qmax / 127.0, 1.0)
        q = jnp.clip(jnp.round(qv / qsc[:, None]), -127, 127).astype(jnp.int8)
        return fused_block_select(q, xi8, qsc, mult_i8, add)

    @jax.jit
    def fused_bf(qv):
        qsc = jnp.ones(qv.shape[0], jnp.float32)
        return fused_block_select(qv.astype(jnp.bfloat16), xbf, qsc, mult_bf, add)

    @jax.jit
    def fused_i8_full(qv):
        """select + value cut + exact f32 re-score + top-k (the full engine)"""
        qmax = jnp.max(jnp.abs(qv), axis=1)
        qsc = jnp.where(qmax > 0, qmax / 127.0, 1.0)
        q = jnp.clip(jnp.round(qv / qsc[:, None]), -127, 127).astype(jnp.int8)
        vals, idxp = fused_block_select(q, xi8, qsc, mult_i8, add)
        selv, sel = jax.lax.top_k(vals, 32)
        cand = jnp.asarray(p2s)[jnp.take_along_axis(idxp, sel, axis=1)]
        xr = rows[cand]
        d = jnp.sum((qv[:, None, :] - xr) ** 2, axis=-1)
        d = jnp.where(selv > -jnp.inf, d, jnp.inf)
        neg, ti = jax.lax.top_k(-d, K)
        return jnp.take_along_axis(cand, ti, axis=1), -neg

    @jax.jit
    def fused_bf_full(qv):
        qsc = jnp.ones(qv.shape[0], jnp.float32)
        vals, idxp = fused_block_select(qv.astype(jnp.bfloat16), xbf, qsc, mult_bf, add)
        selv, sel = jax.lax.top_k(vals, 32)
        cand = jnp.asarray(p2s)[jnp.take_along_axis(idxp, sel, axis=1)]
        xr = rows[cand]
        d = jnp.sum((qv[:, None, :] - xr) ** 2, axis=-1)
        d = jnp.where(selv > -jnp.inf, d, jnp.inf)
        neg, ti = jax.lax.top_k(-d, K)
        return jnp.take_along_axis(cand, ti, axis=1), -neg

    # unfused reference: bf16 mm + approx_max_k(32) + rescore
    xbf_flat = jnp.asarray(x, jnp.bfloat16)
    x2_flat = jnp.asarray(np.sum(x * x, axis=1).astype(np.float32))

    @jax.jit
    def unfused_bf_full(qv):
        dots = jax.lax.dot_general(
            qv.astype(jnp.bfloat16), xbf_flat, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        score = 2.0 * dots - x2_flat[None, :]
        _, cand = jax.lax.approx_max_k(score, 32, recall_target=0.95)
        xr = rows[cand]
        d = jnp.sum((qv[:, None, :] - xr) ** 2, axis=-1)
        neg, ti = jax.lax.top_k(-d, K)
        return jnp.take_along_axis(cand, ti, axis=1), -neg

    try:
        bench("fused int8 select-only", fused_i8, [(q,) for q in queries], flops)
    except Exception as e:
        print(f"fused int8 select FAILED: {type(e).__name__}: {e}", flush=True)
    try:
        bench("fused bf16 select-only", fused_bf, [(q,) for q in queries], flops)
    except Exception as e:
        print(f"fused bf16 select FAILED: {type(e).__name__}: {e}", flush=True)
    t_i8 = t_bf = None
    try:
        t_i8 = bench("fused int8 FULL (select+cut32+rescore)", fused_i8_full,
                     [(q,) for q in queries], flops)
    except Exception as e:
        print(f"fused int8 full FAILED: {type(e).__name__}: {e}", flush=True)
    try:
        t_bf = bench("fused bf16 FULL (select+cut32+rescore)", fused_bf_full,
                     [(q,) for q in queries], flops)
    except Exception as e:
        print(f"fused bf16 full FAILED: {type(e).__name__}: {e}", flush=True)
    bench("unfused bf16 FULL (mm+approx32+rescore)", unfused_bf_full,
          [(q,) for q in queries], flops)

    # recall vs f32 oracle on a small query set
    qs = jnp.asarray(rng.standard_normal((256, D)).astype(np.float32))
    d_or = (
        jnp.sum(qs * qs, axis=1)[:, None]
        - 2 * (qs @ rows.T)
        + jnp.asarray(np.sum(x * x, axis=1))[None, :]
    )
    _, oracle = jax.lax.top_k(-d_or, K)
    oracle = np.asarray(oracle)
    for name, fn in (("int8", fused_i8_full), ("bf16", fused_bf_full)):
        try:
            ids, _ = fn(qs)
            ids = np.asarray(ids)
            hits = sum(
                len(set(ids[i].tolist()) & set(oracle[i].tolist()))
                for i in range(len(qs))
            )
            print(f"  recall@10 fused {name}: {hits / (len(qs) * K):.4f}", flush=True)
        except Exception as e:
            print(f"  recall fused {name} FAILED: {e}", flush=True)


if __name__ == "__main__":
    main()
