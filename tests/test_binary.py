"""Binary-quantization pack/unpack and popcount distances.

Mirrors the reference BQ codec semantics (src/unaligned_vector/
binary_quantized.rs): sign-bit packing, ±1 decode, u64-granularity
padding, and the XOR/XNOR popcount distance identities.
"""

import numpy as np
import jax.numpy as jnp

from arroy_tpu.ops.binary import (
    bq_dot_rowwise,
    hamming_rowwise,
    pack_bits_jnp,
    pack_bits_np,
    padded_dim,
    unpack_bits_full_np,
    unpack_bits_np,
)


def test_padded_dim_matches_u64_words():
    # the reference pads to whole u64 words
    assert padded_dim(1) == 64
    assert padded_dim(64) == 64
    assert padded_dim(65) == 128
    assert padded_dim(70) == 128
    assert padded_dim(768) == 768


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    for d in (3, 31, 64, 100, 768):
        x = rng.standard_normal((5, d)).astype(np.float32)
        words = pack_bits_np(x)
        assert words.dtype == np.uint32
        assert words.shape == (5, padded_dim(d) // 32)
        back = unpack_bits_np(words, d)
        assert back.shape == (5, d)
        np.testing.assert_array_equal(back, np.where(~np.signbit(x), 1.0, -1.0))


def test_padding_bits_decode_to_minus_one():
    # reference: padding bits are 0 → decode -1.0
    x = np.ones((1, 3), np.float32)
    words = pack_bits_np(x)
    full = unpack_bits_full_np(words)
    assert full.shape == (1, 64)
    np.testing.assert_array_equal(full[0, :3], [1.0, 1.0, 1.0])
    np.testing.assert_array_equal(full[0, 3:], -np.ones(61, np.float32))


def test_signed_zero_packing():
    # is_sign_positive: +0.0 → bit 1, -0.0 → bit 0
    x = np.array([[0.0, -0.0, 1.0, -1.0]], np.float32)
    back = unpack_bits_np(pack_bits_np(x), 4)
    np.testing.assert_array_equal(back[0], [1.0, -1.0, 1.0, -1.0])


def test_device_pack_matches_host():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((7, 100)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(pack_bits_jnp(jnp.asarray(x))), pack_bits_np(x))


def _oracle_pm1(x):
    d = x.shape[-1]
    dp = padded_dim(d)
    full = -np.ones(x.shape[:-1] + (dp,), np.float32)
    full[..., :d] = np.where(~np.signbit(x), 1.0, -1.0)
    return full


def test_bq_dot_matches_pm1_oracle():
    rng = np.random.default_rng(2)
    u = rng.standard_normal((6, 100)).astype(np.float32)
    v = rng.standard_normal((6, 100)).astype(np.float32)
    got = np.asarray(bq_dot_rowwise(jnp.asarray(pack_bits_np(u)), jnp.asarray(pack_bits_np(v))))
    want = np.sum(_oracle_pm1(u) * _oracle_pm1(v), axis=-1)
    np.testing.assert_array_equal(got, want)


def test_hamming_identities():
    rng = np.random.default_rng(3)
    u = rng.standard_normal((4, 64)).astype(np.float32)
    v = rng.standard_normal((4, 64)).astype(np.float32)
    pu, pv = jnp.asarray(pack_bits_np(u)), jnp.asarray(pack_bits_np(v))
    h = np.asarray(hamming_rowwise(pu, pv))
    up, vp = _oracle_pm1(u), _oracle_pm1(v)
    # reference: bq euclidean = 4*hamming, bq manhattan = 2*hamming
    np.testing.assert_array_equal(4 * h, np.sum((up - vp) ** 2, axis=-1))
    np.testing.assert_array_equal(2 * h, np.sum(np.abs(up - vp), axis=-1))
