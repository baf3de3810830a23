"""Batched PassportVerification: hash flow + signature + SMT inclusion.

Capability twin of
/root/reference/circuits/passportVerification/passportVerificationBuilder.circom:11-246
and passportVerificationFlow.circom:6-109, re-designed as a single jitted
batched forward over word tensors (shifts become static byte offsets instead
of per-bit IsEqual chains).

Faithfulness notes:
  * flow equality checks compare DG_HASH_TYPE bits of each digest at the
    compile-time shifts, including the reference's quirk of comparing only
    the first DG_HASH_TYPE bits of the encapsulated-content hash when the
    signature hash is wider (passportVerificationFlow.circom:56-61);
  * `passportHash` reproduces the reversed-bit Bits2Num(252) recompose
    (passportVerificationBuilder.circom:163-177);
  * the slave-certificate SMT verdict is *returned*, not enforced — the
    reference leaves `isVerified === 1` commented out
    (passportVerificationBuilder.circom:240).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops import field as fr
from ..ops import sha2
from ..ops import rsa
from ..ops import bitops
from ..ops import poseidon as pos
from ..ops import smt
from .params import CircuitParams


class PassportInputs(NamedTuple):
    """Batched circuit inputs; all blobs are SHA-padded 32-bit word tensors
    (n_words, B) and bignums are 16-bit limb tensors (k, B)."""
    dg1_words: jnp.ndarray            # (32, B) — 1024 bits padded
    dg15_words: jnp.ndarray           # (dg15_blocks*block_words, B)
    ec_words: jnp.ndarray             # (ec_blocks*block_words, B)
    sa_words: jnp.ndarray             # (32, B) — 1024 bits padded
    signature: jnp.ndarray            # (k, B)
    pubkey: jnp.ndarray               # (k, B) RSA modulus (or X||Y for ECDSA)
    pubkey_mu: jnp.ndarray            # (k+1, B) Barrett constant
    slave_root: jnp.ndarray           # (16, B)
    slave_branches: jnp.ndarray       # (16, 80, B)


def _hash_blob(words, algo: int):
    """Digest of a padded word blob; returns (digest_words, flat32_words)."""
    if algo in (384, 512):
        dw = sha2.sha_hash_chunks(bitops.words32_to_words64(words), algo)
        flat = dw.reshape((dw.shape[0] * 2,) + dw.shape[2:])
    else:
        dw = sha2.sha_hash_chunks(words, algo)
        flat = dw
    return dw, flat


def _compose_lsb(bits_lsb):
    """value = sum bits_lsb[j] * 2^j as Fr limbs."""
    return bitops.bits_to_fr(jnp.stack(bits_lsb, 0), msb_first=False)


def ec_hash_type(p: CircuitParams) -> int:
    """EC hash = signature hash except SIG_ALGO 24, whose SA hash is SHA-224
    but EC hash stays SHA-256 (passportVerificationBuilder.circom:53-59)."""
    ht = p.sig.hash_len
    return 256 if p.signature_type == 24 else ht


def passport_hash_from_sa_bits(sa_bits, hash_len: int):
    """Poseidon1 of the reversed-first-252-bits recompose
    (passportVerificationBuilder.circom:163-177,242-244)."""
    zeros = jnp.zeros_like(sa_bits[0])
    if hash_len >= 252:
        lsb = [sa_bits[i] for i in range(252)]
    else:
        lsb = [zeros] * (252 - hash_len) + [sa_bits[i]
                                            for i in range(hash_len)]
    return pos.poseidon([_compose_lsb(lsb)])


def rsa_pubkey_hash(pubkey_l16):
    """Poseidon5 of 5 x 192-bit chunks built from the low 15 64-bit limbs
    (little-endian), chunk i = l64[3i]*2^128 + l64[3i+1]*2^64 + l64[3i+2]
    (passportVerificationBuilder.circom:182-191)."""
    chunks = []
    bshape = pubkey_l16.shape[1:]
    for i in range(5):
        limbs = jnp.zeros((fr.NLIMBS,) + bshape, dtype=jnp.uint32)
        limbs = limbs.at[8:12].set(pubkey_l16[4 * (3 * i):4 * (3 * i) + 4])
        limbs = limbs.at[4:8].set(pubkey_l16[4 * (3 * i + 1):4 * (3 * i + 1) + 4])
        limbs = limbs.at[0:4].set(pubkey_l16[4 * (3 * i + 2):4 * (3 * i + 2) + 4])
        chunks.append(limbs)
    return pos.poseidon(chunks)


def ecdsa_pubkey_hash(x_l16, y_l16, field_bits: int):
    """Poseidon2(X, Y) with coordinates truncated to their low
    min(field, 248) bits (passportVerificationBuilder.circom:193-231)."""
    keep = min(field_bits, 248)
    keep_limbs = []
    for coord in (x_l16, y_l16):
        limbs = jnp.zeros((fr.NLIMBS,) + coord.shape[1:], dtype=jnp.uint32)
        full = keep // 16
        limbs = limbs.at[:full].set(coord[:full])
        if keep % 16:
            limbs = limbs.at[full].set(coord[full] & ((1 << (keep % 16)) - 1))
        keep_limbs.append(limbs)
    return pos.poseidon(keep_limbs)


def forward(p: CircuitParams, inp: PassportInputs):
    """Returns dict with passport_hash, pubkey_hash, dg1_hash_bits,
    dg15_hash_bits, flow_ok, sig_ok, smt_ok."""
    dg_algo = p.dg_hash_type
    sa_algo = p.sig.hash_len
    ec_algo = ec_hash_type(p)
    if dg_algo > ec_algo:
        # The reference only compiles when EC_HASH_TYPE >= DG_HASH_TYPE:
        # flow check #3 indexes encapsulatedContentHash[i] for i <
        # DG_HASH_TYPE (passportVerificationFlow.circom:57-62 with
        # HASH_SIZE = DG_HASH_TYPE, builder wiring
        # passportVerificationBuilder.circom:147) — out of bounds, a circom
        # compile error. Surface the same invalidity explicitly.
        raise ValueError(
            f"invalid config: DG hash ({dg_algo}) wider than EC hash "
            f"({ec_algo}) — rejected by the reference at compile time")

    _, dg1_flat = _hash_blob(inp.dg1_words, dg_algo)
    dg15_flat = None
    if p.aa_signature_algo != 0:
        _, dg15_flat = _hash_blob(inp.dg15_words, dg_algo)
    _, ec_flat = _hash_blob(inp.ec_words, ec_algo)
    sa_digest, sa_flat = _hash_blob(inp.sa_words, sa_algo)
    sa_bits = bitops.get_bits(sa_flat, 0, min(252, sa_algo))

    # digest shifts come from DER byte offsets and are always byte-aligned
    # (process_passport.js:294-320 multiplies hex offsets by 4; DER content
    # is byte-aligned) — compare byte ranges instead of per-bit chains.
    for s in (p.dg1_shift, p.ec_shift, p.dg15_shift):
        if s % 8:
            raise ValueError("shifts must be byte-aligned")
    n_cmp = dg_algo // 8  # HASH_SIZE in the flow — the DG hash width (bytes)

    checks = []
    # 1) dg1 digest inside encapsulated content
    checks.append(jnp.all(
        bitops.get_bytes(dg1_flat, 0, n_cmp) ==
        bitops.get_bytes(inp.ec_words, p.dg1_shift // 8, n_cmp), axis=0))
    if p.aa_signature_algo != 0:
        # 2) dg15 digest inside encapsulated content
        checks.append(jnp.all(
            bitops.get_bytes(dg15_flat, 0, n_cmp) ==
            bitops.get_bytes(inp.ec_words, p.dg15_shift // 8, n_cmp),
            axis=0))
        # 4) 0x0F prefix 24 bits before the dg15 digest
        # (passportVerificationFlow.circom:67-79)
        checks.append(
            bitops.get_byte(inp.ec_words, p.dg15_shift // 8 - 3) == 0x0F)
    # 3) encapsulated-content digest inside signed attributes
    checks.append(jnp.all(
        bitops.get_bytes(ec_flat, 0, n_cmp) ==
        bitops.get_bytes(inp.sa_words, p.ec_shift // 8, n_cmp), axis=0))
    flow_ok = checks[0]
    for c in checks[1:]:
        flow_ok = flow_ok & c

    sig = p.sig
    if sig.family == "rsa":
        sig_ok = rsa.verify_pkcs1v15(inp.signature, inp.pubkey,
                                     inp.pubkey_mu, sa_digest,
                                     sig.hash_len, sig.key_bits, sig.exp)
        pubkey_hash = rsa_pubkey_hash(inp.pubkey)
    elif sig.family == "rsapss":
        from ..ops import rsapss
        sig_ok = rsapss.verify_pss(inp.signature, inp.pubkey, inp.pubkey_mu,
                                   sa_digest, sig.hash_len, sig.key_bits,
                                   sig.salt_len, sig.exp)
        pubkey_hash = rsa_pubkey_hash(inp.pubkey)
    else:  # ecdsa
        from ..ops import ecdsa as ecdsa_ops
        half = inp.pubkey.shape[0] // 2
        x, y = inp.pubkey[:half], inp.pubkey[half:]
        sa_bits_full = bitops.get_bits(sa_flat, 0, sa_algo)
        sig_ok = ecdsa_ops.verify(sig.curve, x, y, inp.signature,
                                  sa_bits_full)
        pubkey_hash = ecdsa_pubkey_hash(x, y, sig.key_bits // 2)

    smt_ok, _ = smt.verify(inp.slave_root, pubkey_hash, pubkey_hash,
                           inp.slave_branches)

    passport_hash = passport_hash_from_sa_bits(sa_bits, sa_algo)

    return {
        "passport_hash": passport_hash,
        "pubkey_hash": pubkey_hash,
        "dg1_hash_words": dg1_flat,
        "dg15_hash_words": dg15_flat,
        "sa_hash_words": sa_flat,
        "flow_ok": flow_ok,
        "sig_ok": sig_ok,
        "smt_ok": smt_ok,
    }
