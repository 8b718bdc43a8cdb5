"""Pallas TPU kernel for the exact engine's fused score + select stage.

The two-stage exact engine (reference contract: oversampled candidate
select + exact re-score, src/reader.rs:381-401) previously ran as
`matmul -> dequant -> approx_max_k`: three HLOs that materialize the
[B, M] score matrix in HBM twice (the i32/f32 dot output plus the f32
score input to the approx_max_k custom call).  At [2048, 100k] that is
~3.2 GB of HBM traffic per batch against 77 MB of actual corpus bytes —
the engine ran the MXU at ~20% while the score-matrix round trips
bounded it.

This kernel fuses the whole stage-1 pipeline: each grid step loads a
group of GP corpus blocks [GP*bm, d] (int8 or bf16) into VMEM, computes
the dot against a query block on the MXU, applies the per-item affine
score transform (dequant scale, cosine norm division, euclidean -|x|^2,
dead-slot mask) on the VPU, and reduces each bm-wide block to its top-2
packed (value, index) keys — only [B, 2*M/bm] int32 ever reach HBM, and
the corpus streams HBM->VMEM exactly once per query block.

score[b, m] = dot(q[b], x[m]) * qsc[b] * mult[m] + add[m]

Per metric (int8 mode; bf16 sets qsc=1, iscale=1):
  euclidean:   mult = 2*iscale, add = -|x|^2   (argmin d == argmax s)
  cosine:      mult = iscale/max(norm, eps), add = 0
  dot-product: mult = iscale, add = 0          (query extra coord is 0)
dead slots fold into add = -inf.

Select uses PACKED TOTAL-ORDER KEYS instead of argmax: the f32 score is
bitcast to i32 and sign-fixed into a monotonic sortable integer, its low
log2(bm) bits are replaced by the lane index, and one `max` reduction
per block yields value+index together (a second max after masking the
winner lane gives the runner-up).  This is ~3 cheap VPU passes per block
versus two full argmax lowerings, outputs 2 arrays instead of 4, and —
critically — each grid step owns a static (GP, bbe) output block
(GP=8 keeps stores sublane-aligned; the v1 kernel's per-step dynamic
row store into a revisited block measured 44 ms for a 2 ms matmul).

Key packing (per f32 score s, block-local lane l in [0, bm)):
  i    = bitcast<i32>(s)
  skey = i >= 0 ? i : i ^ 0x7fffffff     # IEEE total order as signed i32
  key  = (skey & -bm) | l                # low bits carry the lane
Keys order exactly like scores except ties within one value quantum
(2^-(23-log2(bm)) relative — resolved arbitrarily by lane; stage 2
re-scores candidates exactly in f32, so select-order ties are harmless).
Dead/padded slots score -inf, whose key is <= DEAD_KEY_MAX < any finite
score's key.

Top-2 per block, not top-1: two of the true top-k landing in the same
block would shadow each other.  Callers additionally pre-shuffle the
corpus rows (a fixed threefry permutation) so insertion-order clustering
cannot concentrate a query's true neighbors into one block; with random
placement and bm=256 (~400 bins at 100k) the probability of 3+ of the
top-10 sharing a bin is negligible, and the stage-2 exact re-score
re-ranks the survivors.

Falls back to interpret mode off-TPU for CPU tests.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: corpus rows per block == one select bin (pow2, >= 128 lanes).
DEFAULT_BM = 256
#: blocks per grid step; the (GP, bbe) output block is written once per
#: step with static indices (GP=8 == one sublane tile)
DEFAULT_GP = 8
#: queries per block
DEFAULT_BB = 256

_NEG_INF = float("-inf")

#: any packed key <= this marks a dead / padded slot (score -inf);
#: every finite f32 score packs strictly above it for any bm <= 2^23
DEAD_KEY_MAX = int(
    np.int32(np.float32(_NEG_INF).view(np.int32)) ^ np.int32(0x7FFFFFFF)
)  # == i32(0x807fffff)


def _pack_keys(s, lane, bm):
    """Monotonic sortable i32 keys with the low log2(bm) bits = lane."""
    i = jax.lax.bitcast_convert_type(s.astype(jnp.float32), jnp.int32)
    skey = jnp.where(i >= 0, i, i ^ jnp.int32(0x7FFFFFFF))
    return (skey & jnp.int32(-bm)) | lane


def _select_kernel(q_ref, x_ref, qsc_ref, mult_ref, add_ref,
                   k1_ref, k2_ref, *, acc_dtype, bm, gp):
    q = q_ref[:]   # [bbe, d]
    x = x_ref[:]   # [gp*bm, d]
    dots = jax.lax.dot_general(
        q, x, (((1,), (1,)), ((), ())), preferred_element_type=acc_dtype
    )  # [bbe, gp*bm]
    s = dots.astype(jnp.float32) * (qsc_ref[:] * mult_ref[:]) + add_ref[:]
    bbe = s.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (bbe, bm), 1)
    r1, r2 = [], []
    for t in range(gp):  # static unroll: one bin per output sublane
        pk = _pack_keys(s[:, t * bm:(t + 1) * bm], lane, bm)
        m1 = jnp.max(pk, axis=1)
        # lane bits make keys unique per row: exactly one winner masked
        pk2 = jnp.where(pk == m1[:, None], jnp.int32(-2**31), pk)
        m2 = jnp.max(pk2, axis=1)
        r1.append(m1[None, :])
        r2.append(m2[None, :])
    k1_ref[:] = jnp.concatenate(r1, axis=0)  # [gp, bbe]
    k2_ref[:] = jnp.concatenate(r2, axis=0)


@functools.partial(
    jax.jit, static_argnames=("bm", "gp", "bb", "interpret")
)
def fused_block_select(
    q, x, qsc, mult, add, bm: int = DEFAULT_BM, gp: int = DEFAULT_GP,
    bb: int = DEFAULT_BB, interpret: bool = False,
):
    """Stage-1 fused select: per-block top-2 packed keys for every query.

    q:    [B, d]  int8 or bfloat16 queries
    x:    [Mp, d] int8 or bfloat16 corpus rows, Mp a multiple of bm*gp
          (or of bm when Mp/bm < gp — the group then covers all blocks)
    qsc:  [B]   f32 per-query dequant scale (ones for bf16)
    mult: [Mp]  f32 per-item score multiplier
    add:  [Mp]  f32 per-item additive term (-inf for dead/pad slots)

    Returns (keys [B, 2*nb] i32, idx [B, 2*nb] i32) where nb = Mp//bm:
    `keys` are packed total-order score keys (sortable; compare >
    DEAD_KEY_MAX for liveness), `idx` are positions into `x` (callers
    map back through their corpus permutation).  Candidates arrive
    block-major: [max_0..max_nb-1, second_0..second_nb-1].
    """
    b, d = q.shape
    mp = x.shape[0]
    nb = mp // bm
    gp = min(gp, nb)
    assert mp % (bm * gp) == 0, (mp, bm, gp)
    p2 = 1
    while p2 < b:
        p2 *= 2
    bbe = min(bb, max(p2, 8))
    bp = pl.cdiv(b, bbe) * bbe
    if bp != b:
        q = jnp.concatenate([q, jnp.zeros((bp - b, d), q.dtype)])
        qsc = jnp.concatenate([qsc, jnp.ones(bp - b, jnp.float32)])
    acc_dtype = jnp.int32 if q.dtype == jnp.int8 else jnp.float32

    kern = functools.partial(
        _select_kernel, acc_dtype=acc_dtype, bm=bm, gp=gp
    )
    k1, k2 = pl.pallas_call(
        kern,
        # j (corpus groups) outer, i (query blocks) inner: the corpus
        # group stays VMEM-resident across the query sweep, so the
        # corpus streams HBM->VMEM exactly once per bp/bbe query blocks;
        # every step owns its own (gp, bbe) output block — all stores
        # are static and sublane-aligned
        grid=(nb // gp, bp // bbe),
        in_specs=[
            pl.BlockSpec((bbe, d), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gp * bm, d), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bbe, 1), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gp * bm), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gp * bm), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((gp, bbe), lambda j, i: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((gp, bbe), lambda j, i: (j, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, bp), jnp.int32),
            jax.ShapeDtypeStruct((nb, bp), jnp.int32),
        ],
        interpret=interpret,
    )(q, x, qsc.reshape(bp, 1), mult.reshape(1, mp), add.reshape(1, mp))

    keys = jnp.concatenate([k1.T, k2.T], axis=1)[:b]  # [B, 2nb]
    base = (jnp.arange(2 * nb, dtype=jnp.int32) % nb) * bm
    idx = (keys & jnp.int32(bm - 1)) + base[None, :]
    return keys, idx


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
    lane = jnp.arange(bm, dtype=jnp.int32)[None, None, :]
    pk = _pack_keys(sb, lane, bm)
    m1 = jnp.max(pk, axis=2)
    pk2 = jnp.where(pk == m1[:, :, None], jnp.int32(-2**31), pk)
    m2 = jnp.max(pk2, axis=2)
    keys = jnp.concatenate([m1, m2], axis=1)
    base = (jnp.arange(2 * nb, dtype=jnp.int32) % nb) * bm
    idx = (keys & jnp.int32(bm - 1)) + base[None, :]
    return keys, idx
