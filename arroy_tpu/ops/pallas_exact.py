"""Pallas TPU kernel for the exact engine's fused score + select stage.

The two-stage exact engine (reference contract: oversampled candidate
select + exact re-score, src/reader.rs:381-401) previously ran as
`matmul -> dequant -> approx_max_k`: three HLOs that materialize the
[B, M] score matrix in HBM twice (the i32/f32 dot output plus the f32
score input to the approx_max_k custom call).  At [2048, 100k] that is
~3.2 GB of HBM traffic per batch against 77 MB of actual corpus bytes —
the engine ran the MXU at ~20% while the score-matrix round trips
bounded it.

This kernel fuses the whole stage-1 pipeline: each grid step loads one
corpus block [bm, d] (int8 or bf16) into VMEM, computes the dot against
a query block on the MXU, applies the per-item affine score transform
(dequant scale, cosine norm division, euclidean -|x|^2, dead-slot mask)
on the VPU, and reduces the block to its top-2 (value, index) per query
— only [B, 2*M/bm] floats ever reach HBM.

score[b, m] = dot(q[b], x[m]) * qsc[b] * mult[m] + add[m]

Per metric (int8 mode; bf16 sets qsc=1, iscale=1):
  euclidean:   mult = 2*iscale, add = -|x|^2   (argmin d == argmax s)
  cosine:      mult = iscale/max(norm, eps), add = 0
  dot-product: mult = iscale, add = 0          (query extra coord is 0)
dead slots fold into add = -inf.

Top-2 per block, not top-1: two of the true top-k landing in the same
block would shadow each other.  Callers additionally pre-shuffle the
corpus rows (a fixed threefry permutation) so insertion-order clustering
cannot concentrate a query's true neighbors into one block; with random
placement the probability of 3+ of the top-10 sharing one of ~50 blocks
is <1%, and the stage-2 exact re-score re-ranks the survivors.

Falls back to interpret mode off-TPU for CPU tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: corpus rows per block == one select bin.  128-lane aligned; at
#: [bb, bm] = [256, 1024] the block score tile is 1 MB f32 in VMEM.
#: Smaller blocks mean more bins: the chance of 3+ true top-10 items
#: sharing a bin (and the third being shadowed by per-block top-2)
#: drops quadratically with the bin count.
DEFAULT_BM = 1024
#: queries per block
DEFAULT_BB = 256

_NEG_INF = float("-inf")


def _select_kernel(q_ref, x_ref, qsc_ref, mult_ref, add_ref,
                   v1_ref, i1_ref, v2_ref, i2_ref, *, acc_dtype, bm):
    j = pl.program_id(1)  # corpus block == output row (fast grid axis)
    q = q_ref[:]  # [bb, d]
    x = x_ref[:]  # [bm, d]
    dots = jax.lax.dot_general(
        q, x, (((1,), (1,)), ((), ())), preferred_element_type=acc_dtype
    )  # [bb, bm]
    s = dots.astype(jnp.float32) * (qsc_ref[:] * mult_ref[:]) + add_ref[:]
    m1 = jnp.max(s, axis=1)
    a1 = jnp.argmax(s, axis=1).astype(jnp.int32)
    iota = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s2 = jnp.where(iota == a1[:, None], _NEG_INF, s)
    m2 = jnp.max(s2, axis=1)
    a2 = jnp.argmax(s2, axis=1).astype(jnp.int32)
    base = j * bm
    # the [nb, bb] output blocks stay VMEM-resident across the whole j
    # sweep (j is the fastest grid axis and their index map ignores it);
    # each step fills its own row
    v1_ref[pl.ds(j, 1), :] = m1[None, :]
    i1_ref[pl.ds(j, 1), :] = (base + a1)[None, :]
    v2_ref[pl.ds(j, 1), :] = m2[None, :]
    i2_ref[pl.ds(j, 1), :] = (base + a2)[None, :]


@functools.partial(
    jax.jit, static_argnames=("bm", "bb", "interpret")
)
def fused_block_select(
    q, x, qsc, mult, add, bm: int = DEFAULT_BM, bb: int = DEFAULT_BB,
    interpret: bool = False,
):
    """Stage-1 fused select: per-block top-2 scores for every query.

    q:    [B, d]  int8 or bfloat16 queries
    x:    [Mp, d] int8 or bfloat16 corpus rows, Mp a multiple of `bm`
    qsc:  [B]   f32 per-query dequant scale (ones for bf16)
    mult: [Mp]  f32 per-item score multiplier
    add:  [Mp]  f32 per-item additive term (-inf for dead/pad slots)

    Returns (vals [B, 2*nb] f32, idx [B, 2*nb] i32) where nb = Mp//bm;
    idx are positions into `x` (callers map back through their corpus
    permutation).  Candidates arrive block-major: [max_0..max_nb-1,
    second_0..second_nb-1].
    """
    b, d = q.shape
    mp = x.shape[0]
    assert mp % bm == 0, (mp, bm)
    nb = mp // bm
    p2 = 1
    while p2 < b:
        p2 *= 2
    bbe = min(bb, max(p2, 8))
    bp = pl.cdiv(b, bbe) * bbe
    if bp != b:
        q = jnp.concatenate([q, jnp.zeros((bp - b, d), q.dtype)])
        qsc = jnp.concatenate([qsc, jnp.ones(bp - b, jnp.float32)])
    acc_dtype = jnp.int32 if q.dtype == jnp.int8 else jnp.float32

    kern = functools.partial(_select_kernel, acc_dtype=acc_dtype, bm=bm)
    v1, i1, v2, i2 = pl.pallas_call(
        kern,
        # i (query blocks) outer, j (corpus blocks) inner: the per-query
        # [nb, bbe] output blocks stay VMEM-resident for the whole
        # corpus sweep (their index maps ignore j), which is the pattern
        # Pallas requires for revisited outputs; the corpus streams
        # once per query block
        grid=(bp // bbe, nb),
        in_specs=[
            pl.BlockSpec((bbe, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bbe, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((nb, bbe), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, bbe), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, bbe), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, bbe), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, bp), jnp.float32),
            jax.ShapeDtypeStruct((nb, bp), jnp.int32),
            jax.ShapeDtypeStruct((nb, bp), jnp.float32),
            jax.ShapeDtypeStruct((nb, bp), jnp.int32),
        ],
        interpret=interpret,
    )(q, x, qsc.reshape(bp, 1), mult.reshape(1, mp), add.reshape(1, mp))

    vals = jnp.concatenate([v1.T, v2.T], axis=1)[:b]  # [B, 2nb]
    idx = jnp.concatenate([i1.T, i2.T], axis=1)[:b]
    return vals, idx


def fused_block_select_reference(q, x, qsc, mult, add, bm: int = DEFAULT_BM):
    """jnp oracle (materializes [B, M] — test shapes only)."""
    dots = jax.lax.dot_general(
        q, x,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32 if q.dtype == jnp.int8 else jnp.float32,
    )
    s = dots.astype(jnp.float32) * (qsc[:, None] * mult[None, :]) + add[None, :]
    b, mp = s.shape
    nb = mp // bm
    sb = s.reshape(b, nb, bm)
    a1 = jnp.argmax(sb, axis=2)
    m1 = jnp.max(sb, axis=2)
    iota = jnp.arange(bm)[None, None, :]
    sb2 = jnp.where(iota == a1[:, :, None], _NEG_INF, sb)
    a2 = jnp.argmax(sb2, axis=2)
    m2 = jnp.max(sb2, axis=2)
    off = (jnp.arange(nb) * bm)[None, :]
    vals = jnp.concatenate([m1, m2], axis=1)
    idx = jnp.concatenate([a1 + off, a2 + off], axis=1).astype(jnp.int32)
    return vals, idx
