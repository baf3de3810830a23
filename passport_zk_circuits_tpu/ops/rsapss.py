"""Batched RSA-PSS signature verification (EMSA-PSS, MGF1) over limb bignums.

Capability twin of
/root/reference/circuits/lib/circuits/signatures/rsaPss.circom:18-254
(``VerifyRsaPssSig``: PowerMod -> EM bytes, 0xBC check, MGF1 dbMask, XOR,
salt extraction, H' = hash(0^64 || mHash || salt)) and signatures/mgf1.circom
(Mgf1Sha256/384/512). Parameter sets used by the reference: (2048, sha256,
salt 32/64, e=3/65537), (2048, sha384, salt 48), (3072, sha256, salt 32).

Delta vs the reference (strengthened, documented): we additionally require
DB's padding bytes to be zero and the 0x01 separator to be present (RFC 8017
§9.1.2 steps 10-11); the reference only recomputes H' over the extracted
salt (rsaPss.circom:136-253).
"""

from __future__ import annotations

import hashlib
import struct

import jax.numpy as jnp

from . import bignum as bn
from . import sha2

_HASH_NAME = {160: "sha1", 256: "sha256", 384: "sha384", 512: "sha512"}


def _em_byte(em_limbs, n_bytes: int, j: int):
    """Big-endian byte j of a little-endian 16-bit limb tensor."""
    le = n_bytes - 1 - j
    return (em_limbs[le // 2] >> (8 * (le % 2))) & 0xFF


def _sha_device(byte_rows, algo: int, bshape):
    """Digest of a short byte stream (static length) on device."""
    return sha2.sha_hash_byte_rows(byte_rows, algo, bshape)


def mgf1(seed_bytes, out_len: int, algo: int, bshape):
    """MGF1 mask: concat of hash(seed || counter) blocks
    (mgf1.circom Mgf1Sha* analog). seed_bytes: list of (B,) byte tensors."""
    h_bytes = algo // 8
    n_blocks = -(-out_len // h_bytes)
    out = []
    for c in range(n_blocks):
        ctr = list(struct.pack(">I", c))
        out.extend(_sha_device(list(seed_bytes) + ctr, algo, bshape))
    return out[:out_len]


def verify_pss(signature, pubkey, mu, digest_words, hash_len: int,
               key_bits: int, salt_len: int, exp: int = 65537):
    """Batched VerifyRsaPssSig. digest_words = mHash (the SA digest).
    Returns bool (*B,)."""
    from .rsa import _mod_pow
    em = _mod_pow(signature, exp, pubkey, mu)
    n_bytes = key_bits // 8
    h_bytes = hash_len // 8
    bshape = em.shape[1:]

    em_bytes = [_em_byte(em, n_bytes, j) for j in range(n_bytes)]
    ok = em_bytes[-1] == 0xBC

    db_len = n_bytes - h_bytes - 1
    H = em_bytes[db_len:db_len + h_bytes]
    db_mask = mgf1(H, db_len, hash_len, bshape)
    db = [m ^ k for m, k in zip(em_bytes[:db_len], db_mask)]
    # clear the top (8*emLen - emBits) = 1 bit (key_bits multiple of 8)
    db[0] = db[0] & 0x7F

    # PS zeros + 0x01 separator (RFC 8017 §9.1.2; stricter than reference)
    sep = db_len - salt_len - 1
    for j in range(sep):
        ok = ok & (db[j] == 0)
    ok = ok & (db[sep] == 0x01)
    salt = db[sep + 1:]

    # mHash bytes from digest words
    if digest_words.ndim >= 2 and hash_len in (384, 512):
        flat = digest_words.reshape((digest_words.shape[0] * 2,) + bshape)
    else:
        flat = digest_words
    mhash = [(flat[j // 4] >> (8 * (3 - j % 4))) & 0xFF
             for j in range(h_bytes)]

    m_prime = [0] * 8 + mhash + salt
    h_prime = _sha_device(m_prime, hash_len, bshape)
    for a, b in zip(H, h_prime):
        ok = ok & (a == b)
    return ok


# -- host-side oracles -------------------------------------------------------

def emsa_pss_encode(mhash: bytes, key_bits: int, salt: bytes) -> int:
    h = hashlib.new(_HASH_NAME[len(mhash) * 8])
    n_bytes = key_bits // 8
    h_bytes = len(mhash)
    db_len = n_bytes - h_bytes - 1
    m_prime = b"\x00" * 8 + mhash + salt
    H = hashlib.new(h.name, m_prime).digest()
    ps = b"\x00" * (db_len - len(salt) - 1)
    db = ps + b"\x01" + salt
    mask = _mgf1_host(H, db_len, h.name)
    masked = bytes(a ^ b for a, b in zip(db, mask))
    masked = bytes([masked[0] & 0x7F]) + masked[1:]
    return int.from_bytes(masked + H + b"\xbc", "big")


def _mgf1_host(seed: bytes, out_len: int, name: str) -> bytes:
    out = b""
    c = 0
    while len(out) < out_len:
        out += hashlib.new(name, seed + struct.pack(">I", c)).digest()
        c += 1
    return out[:out_len]


def sign_pss(mhash: bytes, d: int, n: int, key_bits: int, salt_len: int,
             rng) -> int:
    salt = bytes(rng.randrange(256) for _ in range(salt_len))
    em = emsa_pss_encode(mhash, key_bits, salt)
    return pow(em, d, n)
