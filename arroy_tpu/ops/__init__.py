"""Low-level device ops: packing, popcounts, distance kernels."""

from .binary import (
    bq_dot_rowwise,
    hamming_rowwise,
    pack_bits_jnp,
    pack_bits_np,
    padded_dim,
    unpack_bits_full_np,
    unpack_bits_jnp,
    unpack_bits_np,
)

__all__ = [
    "bq_dot_rowwise",
    "hamming_rowwise",
    "pack_bits_jnp",
    "pack_bits_np",
    "padded_dim",
    "unpack_bits_full_np",
    "unpack_bits_jnp",
    "unpack_bits_np",
]
