"""Batched RegisterIdentity: the flagship registration circuit family.

Capability twin of
/root/reference/circuits/identityManagement/registerIdentityBuilder.circom:41-196
(wiring PassportVerificationBuilder + RegisterIdentity) and
identity.circom:6-121 (active-auth key extraction, dg1 commitment,
BabyJubJub identity key).

Outputs (batched Fr limbs): dg15_pubkey_hash, passport_hash, dg1_commitment,
pk_identity_hash — the four public outputs of the reference builder
(registerIdentityBuilder.circom:115-123) — plus the flow/signature/SMT
verdict booleans (our richer equivalent of circom's hard constraints).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops import field as fr
from ..ops import bitops
from ..ops import poseidon as pos
from ..ops import babyjubjub as bjj
from .params import CircuitParams
from . import passport_verification as pv


class RegisterIdentityInputs(NamedTuple):
    passport: pv.PassportInputs
    sk_identity: jnp.ndarray          # (16, B) Fr limbs


def dg15_pubkey_hash(p: CircuitParams, dg15_words):
    """Active-auth public key hash (identity.circom:24-87)."""
    aa = p.aa_signature_algo
    bshape = dg15_words.shape[1:]
    if aa == 0:
        return fr.const(0, bshape)
    if aa < 20:
        # RSA-1024 AA key: 5 big-endian chunks 200+200+200+200+224 bits
        chunks = []
        for j in range(4):
            chunks.append(bitops.word_slice_to_fr(
                dg15_words, p.aa_shift + j * 200, 200, msb_first=True))
        chunks.append(bitops.word_slice_to_fr(
            dg15_words, p.aa_shift + 800, 224, msb_first=True))
        return pos.poseidon(chunks)
    # ECDSA AA key: X,Y truncated to min(field, 248) low bits
    field_size, keep = 256, 248
    if aa == 22:
        field_size = 320
    if aa == 23:
        field_size, keep = 192, 192
    xy_shift = field_size - keep
    x = bitops.word_slice_to_fr(
        dg15_words, p.aa_shift + xy_shift, keep, msb_first=True)
    y = bitops.word_slice_to_fr(
        dg15_words, p.aa_shift + field_size + xy_shift, keep, msb_first=True)
    return pos.poseidon([x, y])


def dg1_commitment(p: CircuitParams, dg1_words, sk_identity):
    """Poseidon5 of 4 reversed-bit dg1 chunks + Poseidon1(skIdentity)
    (identity.circom:89-109)."""
    chunk_size = 186 if p.document_type == 3 else 190
    chunks = [bitops.word_slice_to_fr(dg1_words, i * chunk_size, chunk_size,
                                      msb_first=False)
              for i in range(4)]
    sk_hash = pos.poseidon([sk_identity])
    return pos.poseidon(chunks + [sk_hash])


def pk_identity_hash(sk_identity):
    """Poseidon2 of the BabyJubJub public key Base8*sk
    (identity.circom:112-120)."""
    px, py = bjj.base8_mul(sk_identity, sk_identity.shape[1:])
    return pos.poseidon([px, py])


def forward(p: CircuitParams, inp: RegisterIdentityInputs):
    """Full RegisterIdentityBuilder forward. Returns a dict of the four
    public outputs plus verdicts."""
    out = pv.forward(p, inp.passport)
    out["dg15_pubkey_hash"] = dg15_pubkey_hash(p, inp.passport.dg15_words)
    out["dg1_commitment"] = dg1_commitment(p, inp.passport.dg1_words,
                                           inp.sk_identity)
    out["pk_identity_hash"] = pk_identity_hash(inp.sk_identity)
    return out
