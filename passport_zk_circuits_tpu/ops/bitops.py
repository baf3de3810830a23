"""Byte/bit extraction helpers over 32-bit big-endian word tensors.

The reference circuits treat passport blobs as big-endian *bit arrays* and
recompose fields with Bits2Num in several (sometimes reversed) orders
(lib/circuits/bitify/bitify.circom:10-55). Our canonical blob layout is
(n_words, *B) uint32 big-endian words (matching the SHA kernels); these
helpers provide the equivalent bit semantics.

Bit index convention: bit i of a blob is the i-th bit in reading order,
i.e. the (31 - i%32)-th bit of word i//32 (MSB first) — identical to the
reference's bit-array indexing.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import field as fr


def get_byte(words, byte_idx: int):
    """Byte at reading-order index -> (*B,) uint32."""
    w, b = divmod(byte_idx, 4)
    return (words[w] >> (8 * (3 - b))) & 0xFF


def get_bytes(words, byte_off: int, n: int):
    """(n, *B) uint32 bytes starting at byte_off."""
    return jnp.stack([get_byte(words, byte_off + j) for j in range(n)], 0)


def get_bit(words, bit_idx: int):
    """Bit at reading-order index -> (*B,) uint32 in {0,1}."""
    w, b = divmod(bit_idx, 32)
    return (words[w] >> (31 - b)) & 1


def get_bits(words, bit_off: int, n: int):
    """(n, *B) bits starting at bit_off (reading order)."""
    return jnp.stack([get_bit(words, bit_off + j) for j in range(n)], 0)


def bits_to_limbs(bits, k: int, msb_first: bool = True):
    """Recompose a bit tensor (n, *B) into (k, *B) 16-bit limbs.

    msb_first=True: value = sum bits[i] * 2^(n-1-i) (big-endian Bits2Num
    wiring, e.g. identity.circom:34). msb_first=False: value =
    sum bits[i] * 2^i (the direct wiring used for dg1 chunks and the
    passportHash 252-bit recompose, identity.circom:100,
    passportVerificationBuilder.circom:165-177)."""
    n = bits.shape[0]
    limbs = []
    for limb in range(k):
        acc = jnp.zeros(bits.shape[1:], dtype=jnp.uint32)
        for off in range(16):
            j = limb * 16 + off          # weight 2^j
            if j < n:
                src = bits[n - 1 - j] if msb_first else bits[j]
                acc = acc | (src << off)
        limbs.append(acc)
    return jnp.stack(limbs, axis=0)


def bits_to_fr(bits, msb_first: bool = True):
    """Recompose a bit tensor (n, *B) into Fr limbs (16, *B)."""
    return bits_to_limbs(bits, fr.NLIMBS, msb_first)


def word_slice_to_fr(words, bit_off: int, n: int, msb_first: bool = True):
    """Field extraction: n bits at bit_off recomposed into Fr limbs."""
    return bits_to_fr(get_bits(words, bit_off, n), msb_first)


def digest32_bytes(digest_words):
    """(w, *B) uint32 digest -> (4w, *B) bytes (big-endian)."""
    return get_bytes(digest_words, 0, digest_words.shape[0] * 4)


def digest64_bytes(digest_words):
    """(w, 2, *B) uint32-pair digest -> (8w, *B) bytes."""
    w = digest_words.shape[0]
    flat = digest_words.reshape((2 * w,) + digest_words.shape[2:])
    return get_bytes(flat, 0, 8 * w)


def words32_to_words64(words):
    """(2n, *B) uint32 -> (n, 2, *B) hi/lo pairs (for SHA-384/512 input)."""
    n2 = words.shape[0]
    return words.reshape((n2 // 2, 2) + words.shape[1:])


def u64_limbs_from_fr16(l16, j: int):
    """64-bit little-endian chunk j of a 16-bit limb tensor, as Fr limbs.
    (The reference chunks bignums as 64-bit little-endian signals,
    process_passport.js:113-135.)"""
    chunk = l16[4 * j:4 * j + 4]                 # 4 x 16-bit limbs
    out = jnp.zeros((fr.NLIMBS,) + l16.shape[1:], dtype=jnp.uint32)
    return out.at[:4].set(chunk)
