"""Pallas gather-score kernel for the leaf-probe engine's stage 2.

The probe pipeline's dominant cost is scoring the per-query selected
blocks: XLA lowers ``blk_rows[bid]`` + ``einsum("bcpd,bd->bcp")`` to a
materialized [B, C, P, d] gather in HBM followed by a batched matvec —
measured 21 ms per 256-query batch at the bench config where the raw
block traffic is ~2.5 ms (results/probe_profile_r05.log).  This kernel
streams each selected block HBM->VMEM exactly once with double-buffered
async copies and reduces it against the query on the VPU, so the
gathered rows never round-trip through HBM:

    grid = (B,); per grid step the kernel walks that query's C block
    ids (scalar-prefetched so the DMA addresses are known before the
    body runs), overlapping block c+1's DMA with block c's
    multiply-reduce.  Per-block [P] score vectors accumulate in a
    loop-carried [C, P] register tile and are written once per query —
    no sub-lane-granularity stores anywhere.

The reference walks its priority queue one node at a time on a scalar
core (reference: src/reader.rs:317-401); this kernel is the TPU shape
of the same leaf-expansion work: bulk DMA + vector reduce.

Row dtypes: bf16 / f32 / int8 (int8 dequant happens OUTSIDE — the
caller multiplies by the gathered per-item scale, keeping the kernel a
pure dot).  Packed sign-bit (uint32) tables keep the XLA popcount path.

Falls back to interpret mode off-TPU for CPU tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_score_kernel(C: int, P: int, bid_ref, rows_hbm, q_ref, out_ref):
    b = pl.program_id(0)

    def body(scratch, sem):
        def dma(slot, c):
            return pltpu.make_async_copy(
                rows_hbm.at[bid_ref[b, c]], scratch.at[slot], sem.at[slot]
            )

        dma(0, 0).start()
        q = q_ref[0].astype(jnp.float32)  # [1, d]

        def loop(c, acc):
            cur = c % 2

            @pl.when(c + 1 < C)
            def _():
                dma((c + 1) % 2, c + 1).start()

            dma(cur, c).wait()
            rows = scratch[cur]  # [P, d]
            s = jnp.sum(rows.astype(jnp.float32) * q, axis=1)  # [P]
            return jax.lax.dynamic_update_slice(acc, s[None, :], (c, 0))

        acc = jnp.zeros((C, P), jnp.float32)
        out_ref[0] = jax.lax.fori_loop(0, C, loop, acc)

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((2,) + rows_hbm.shape[1:], rows_hbm.dtype),
        sem=pltpu.SemaphoreType.DMA((2,)),
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_score(blk_rows, bid, qv, interpret: bool = False):
    """Score per-query selected blocks against the queries.

    blk_rows: [NBT, P, d] bf16/f32/int8 block tables (device-resident)
    bid:      [B, C] int32 block ids, already clamped to [0, NBT)
    qv:       [B, d] f32 queries
    returns:  [B, C, P] f32 raw dots  q_b . row  (no aux terms)
    """
    B, C = bid.shape
    _, P, d = blk_rows.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, 1, d), lambda b, bid_ref: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, C, P), lambda b, bid_ref: (b, 0, 0)),
    )
    return pl.pallas_call(
        functools.partial(_gather_score_kernel, C, P),
        out_shape=jax.ShapeDtypeStruct((B, C, P), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(bid, blk_rows, qv.reshape(B, 1, d))
