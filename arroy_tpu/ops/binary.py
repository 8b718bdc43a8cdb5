"""Binary-quantized vector packing and popcount dot products.

The reference packs one bit per dimension into u64 words (sign bit:
``x >= +0.0`` → 1, decode to ±1.0) and computes all three binary-quantized
distances from XOR/XNOR popcounts (reference:
src/unaligned_vector/binary_quantized.rs:17-91, src/spaces/simple.rs:84-131).

On TPU we pack into ``uint32`` lanes (VPU-friendly) but pad the dimension
to a multiple of **64** bits so the padded length — and therefore every
distance value, which is computed over the padded width exactly like the
reference — matches the reference's u64-word padding byte-for-byte.

All device ops boil down to ``jax.lax.population_count`` which lowers to
native VPU popcounts on TPU:

* ``bq_dot(u, v)   = d_pad - 2 * hamming(u, v)``  (±1 dot product,
  reference: src/spaces/simple.rs:119-131)
* ``bq_euclidean   = 4 * hamming``                 (reference:
  src/distance/binary_quantized_euclidean.rs:95-124)
* ``bq_manhattan   = 2 * hamming``                 (reference:
  src/distance/binary_quantized_manhattan.rs:99-120)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

WORD_BITS = 32
#: pad dimensions to a multiple of 64 bits to match the reference's u64 words
PAD_BITS = 64


def padded_dim(dims: int) -> int:
    """Number of stored bits for a `dims`-dimensional BQ vector."""
    return ((dims + PAD_BITS - 1) // PAD_BITS) * PAD_BITS


def n_words(dims: int) -> int:
    return padded_dim(dims) // WORD_BITS


# ---------------------------------------------------------------------------
# host-side pack / unpack (numpy)
# ---------------------------------------------------------------------------

def pack_bits_np(x: np.ndarray) -> np.ndarray:
    """Pack float vectors ``[..., d]`` into sign-bit words ``[..., w]`` (uint32).

    Bit semantics follow the reference scalar packer
    (src/unaligned_vector/binary_quantized.rs:80-91): bit = 1 iff the float's
    sign bit is clear (so +0.0 → 1, -0.0 → 0); padding bits are 0.
    Bit order is LSB-first within each word; dim k lives in word ``k // 32``
    bit ``k % 32``.
    """
    x = np.asarray(x, dtype=np.float32)
    d = x.shape[-1]
    dp = padded_dim(d)
    bits = ~np.signbit(x)  # True where sign is positive (matches is_sign_positive)
    padded = np.zeros(x.shape[:-1] + (dp,), dtype=bool)
    padded[..., :d] = bits
    # [..., w, 32] -> uint32 words
    b = padded.reshape(*padded.shape[:-1], dp // WORD_BITS, WORD_BITS)
    weights = (np.uint32(1) << np.arange(WORD_BITS, dtype=np.uint32))
    return (b.astype(np.uint32) * weights).sum(axis=-1, dtype=np.uint32)


def unpack_bits_np(words: np.ndarray, dims: int) -> np.ndarray:
    """Decode packed words back to ±1.0 float vectors of length ``dims``.

    The reference decodes bit 1 → +1.0 and bit 0 → -1.0
    (src/unaligned_vector/binary_quantized.rs:160-219).
    """
    words = np.asarray(words, dtype=np.uint32)
    w = words.shape[-1]
    shifts = np.arange(WORD_BITS, dtype=np.uint32)
    bits = (words[..., :, None] >> shifts) & np.uint32(1)
    flat = bits.reshape(*words.shape[:-1], w * WORD_BITS)[..., :dims]
    return np.where(flat.astype(bool), np.float32(1.0), np.float32(-1.0))


def unpack_bits_full_np(words: np.ndarray) -> np.ndarray:
    """Decode to ±1.0 over the FULL padded width (padding bits → -1.0).

    This is the representation the reference's two-means works in for
    binary-quantized metrics (src/distance/mod.rs:173-223): every stored
    bit, including padding, becomes a ±1 coordinate.
    """
    w = np.asarray(words, dtype=np.uint32).shape[-1]
    return unpack_bits_np(words, w * WORD_BITS)


# ---------------------------------------------------------------------------
# device-side ops (jax)
# ---------------------------------------------------------------------------

def hamming_rowwise(u: jax.Array, v: jax.Array) -> jax.Array:
    """popcount(u ^ v) summed over the last axis. Shapes broadcast."""
    x = jnp.bitwise_xor(u, v)
    return jnp.sum(jax.lax.population_count(x).astype(jnp.int32), axis=-1)


def bq_dot_rowwise(u: jax.Array, v: jax.Array) -> jax.Array:
    """±1 dot product over the padded width, as f32.

    Equivalent to the reference's XNOR-popcount formulation
    (src/spaces/simple.rs:119-131): ``ones(!(u^v)) - zeros(!(u^v))``
    = ``d_pad - 2 * hamming``.
    """
    d_pad = u.shape[-1] * WORD_BITS
    return (d_pad - 2 * hamming_rowwise(u, v)).astype(jnp.float32)


def unpack_bits_jnp(words: jax.Array, dims: int) -> jax.Array:
    """Device-side decode to ±1.0 float (length ``dims``)."""
    w = words.shape[-1]
    shifts = jnp.arange(WORD_BITS, dtype=jnp.uint32)
    bits = (words[..., :, None] >> shifts) & jnp.uint32(1)
    flat = bits.reshape(*words.shape[:-1], w * WORD_BITS)[..., :dims]
    return jnp.where(flat.astype(bool), 1.0, -1.0).astype(jnp.float32)


def pack_bits_jnp(x: jax.Array) -> jax.Array:
    """Device-side sign-bit packing of float vectors ``[..., d]`` → uint32 words."""
    d = x.shape[-1]
    dp = padded_dim(d)
    # sign-positive test that honours -0.0 exactly like is_sign_positive():
    # signbit of the f32 representation.
    bits_u = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    pos = (bits_u >> 31) == 0
    pad = jnp.zeros(x.shape[:-1] + (dp - d,), dtype=bool)
    padded = jnp.concatenate([pos, pad], axis=-1)
    b = padded.reshape(*padded.shape[:-1], dp // WORD_BITS, WORD_BITS)
    weights = (jnp.uint32(1) << jnp.arange(WORD_BITS, dtype=jnp.uint32))
    return jnp.sum(jnp.where(b, weights, jnp.uint32(0)), axis=-1, dtype=jnp.uint32)
