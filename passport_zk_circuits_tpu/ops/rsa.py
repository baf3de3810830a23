"""Batched RSA signature verification (PKCS#1 v1.5) over 16-bit limb bignums.

Capability twin of
/root/reference/circuits/lib/circuits/signatures/rsa.circom:16-114
(``RsaVerifyPkcs1v15``): modexp via PowerMod then a check of the EM
(EMSA-PKCS1-v1_5) byte structure. The reference hardcodes the expected
64-bit chunks of the DigestInfo/padding (rsa.circom:53-59,69-71,101-110);
here the expected encoded message is *constructed* from the in-graph digest
plus the static DER prefix and compared limb-wise.

Faithfulness notes (deltas vs the reference, deliberately strengthened):
  * the reference skips the top chunk check for SHA-256 keys
    (rsa.circom:69 loops to CHUNK_NUMBER-1 exclusive) and never compares the
    low 128 digest bits for SHA-1 (rsa.circom:83-88 computes Bits2Num of the
    digest but does not constrain it against pm.out) — we check the full EM.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import bignum as bn

# DER DigestInfo prefixes (EMSA-PKCS1-v1_5, RFC 8017 §9.2 notes)
DIGEST_INFO = {
    160: bytes.fromhex("3021300906052b0e03021a05000414"),
    224: bytes.fromhex("302d300d06096086480165030402040500041c"),
    256: bytes.fromhex("3031300d060960864801650304020105000420"),
    384: bytes.fromhex("3041300d060960864801650304020205000430"),
    512: bytes.fromhex("3051300d060960864801650304020305000440"),
}


def _digest_byte(digest_words, word_bits: int, byte_idx: int):
    """byte `byte_idx` (big-endian within the digest) from word tensor.
    digest_words: (w, *B) uint32 for 32-bit hashes or (w, 2, *B) for 64-bit."""
    if digest_words.ndim >= 2 and word_bits == 64:
        word, rem = divmod(byte_idx, 8)
        half, b = divmod(rem, 4)
        return (digest_words[word, half] >> (8 * (3 - b))) & 0xFF
    word, b = divmod(byte_idx, 4)
    return (digest_words[word] >> (8 * (3 - b))) & 0xFF


def expected_em_limbs(digest_words, hash_len: int, key_bits: int):
    """Build the EMSA-PKCS1-v1_5 encoded message as (k, *B) 16-bit limbs:
    0x00 0x01 FF..FF 0x00 || DigestInfo || H."""
    n_bytes = key_bits // 8
    h_bytes = hash_len // 8
    prefix = DIGEST_INFO[hash_len]
    ps_len = n_bytes - 3 - len(prefix) - h_bytes
    if ps_len < 8:
        raise ValueError("key too small for digest")
    word_bits = 64 if hash_len in (384, 512) else 32
    if digest_words.ndim >= 2 and word_bits == 64:
        bshape = digest_words.shape[2:]
    else:
        bshape = digest_words.shape[1:]

    # static byte template; None marks digest bytes
    template = ([0x00, 0x01] + [0xFF] * ps_len + [0x00] + list(prefix)
                + [None] * h_bytes)
    digest_start = n_bytes - h_bytes

    k = n_bytes // 2
    limbs = []
    for i in range(k):                      # little-endian 16-bit limbs
        b_hi = n_bytes - 2 - 2 * i          # big-endian byte index
        b_lo = n_bytes - 1 - 2 * i
        vals = []
        for bidx in (b_hi, b_lo):
            tv = template[bidx]
            if tv is None:
                vals.append(_digest_byte(digest_words, word_bits,
                                         bidx - digest_start))
            else:
                vals.append(jnp.full(bshape, tv, dtype=jnp.uint32))
        limbs.append((vals[0] << 8) | vals[1])
    return jnp.stack(limbs, axis=0)


def verify_pkcs1v15(signature, pubkey, mu, digest_words, hash_len: int,
                    key_bits: int, exp: int = 65537):
    """Batched RsaVerifyPkcs1v15.

    signature, pubkey: (k, *B) 16-bit limbs (k = key_bits/16); mu: (k+1, *B)
    Barrett constant for the pubkey modulus (host-precomputed by ingestion);
    digest_words: big-endian hash words. Returns bool (*B,).
    """
    em = _mod_pow(signature, exp, pubkey, mu)
    want = expected_em_limbs(digest_words, hash_len, key_bits)
    return bn.eq(em, want)


def _mod_pow(signature, exp, pubkey, mu):
    """Verification modexp: fused Pallas ladder on verified TPU (ONE
    kernel for the whole square-and-multiply chain, ops/pallas_rsa),
    XLA blocked-conv path otherwise. exp values outside the verified set
    (3, 65537) stay on XLA."""
    from . import pallas_field as pf
    if exp in (3, 65537) and pf.use_pallas() and signature.ndim == 2:
        from . import pallas_rsa
        return pallas_rsa.pow_mod(signature, pubkey, mu, exp)
    return bn.mod_pow(signature, exp, pubkey, mu)


# -- host-side helpers for fixtures/tests -----------------------------------

def emsa_pkcs1_v15_encode(digest: bytes, key_bits: int) -> int:
    """Host oracle: EM as an integer."""
    hash_len = len(digest) * 8
    prefix = DIGEST_INFO[hash_len]
    n_bytes = key_bits // 8
    ps = b"\xff" * (n_bytes - 3 - len(prefix) - len(digest))
    em = b"\x00\x01" + ps + b"\x00" + prefix + digest
    return int.from_bytes(em, "big")


def sign_pkcs1v15(digest: bytes, d: int, n: int, key_bits: int) -> int:
    """Host oracle: produce a valid signature given the private exponent."""
    return pow(emsa_pkcs1_v15_encode(digest, key_bits), d, n)
