"""Pallas TPU kernels for the hot binary-quantized ops.

The binary-quantized distance matrix (hamming / ±1 dot between every
query and every item) is the compute core of BQ exact search and BQ
re-scoring.  The jnp formulation broadcasts to a [B, M, w] uint32
intermediate before reducing; this kernel tiles the computation through
VMEM — each grid step XORs a [TB, w] query tile against a [TM, w] item
tile and accumulates popcounts straight into the [TB, TM] output block,
so nothing bigger than the tiles ever exists.

Falls back to the jnp path off-TPU (the kernel also runs under
`interpret=True` for CPU tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TB = 128  # query-tile rows
_TM = 512  # item-tile rows


def _hamming_kernel(q_ref, x_ref, out_ref):
    # q_ref: [TB, w] uint32; x_ref: [TM, w] uint32; out: [TB, TM] int32
    q = q_ref[:]
    x = x_ref[:]
    xor = jnp.bitwise_xor(q[:, None, :], x[None, :, :])  # [TB, TM, w] in VMEM
    pc = jax.lax.population_count(xor).astype(jnp.int32)
    out_ref[:] = jnp.sum(pc, axis=-1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def bq_hamming_matrix(q_words: jax.Array, x_words: jax.Array, interpret: bool = False):
    """[B, w] x [M, w] packed sign bits -> [B, M] hamming distances (int32).

    B and M are padded to tile multiples internally; callers slice.
    """
    b, w = q_words.shape
    m = x_words.shape[0]
    tb = min(_TB, max(8, b))
    tm = min(_TM, max(8, m))
    bp = pl.cdiv(b, tb) * tb
    mp = pl.cdiv(m, tm) * tm
    qp = jnp.zeros((bp, w), jnp.uint32).at[:b].set(q_words)
    xp = jnp.zeros((mp, w), jnp.uint32).at[:m].set(x_words)

    out = pl.pallas_call(
        _hamming_kernel,
        grid=(bp // tb, mp // tm),
        in_specs=[
            pl.BlockSpec((tb, w), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, w), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, tm), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, mp), jnp.int32),
        interpret=interpret,
    )(qp, xp)
    return out[:b, :m]


def bq_hamming_matrix_reference(q_words: jax.Array, x_words: jax.Array) -> jax.Array:
    """jnp oracle (materializes the broadcast — fine for small shapes)."""
    xor = jnp.bitwise_xor(q_words[:, None, :], x_words[None, :, :])
    return jnp.sum(jax.lax.population_count(xor).astype(jnp.int32), axis=-1)
