"""Batched RegisterIdentityLight: registration without SOD verification.

Capability twin of
/root/reference/circuits/identityManagement/registerIdentityLight.circom:15-92:
dg1 commitment (reversed-bit chunks + Poseidon1(sk)), BabyJubJub identity
key hash, and dg1Hash = the DG hash of dg1 truncated to its low 248 bits
(the trailing-bit Bits2Num recompose, :72-86).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops import field as fr
from ..ops import bitops
from ..ops import poseidon as pos
from ..ops import babyjubjub as bjj
from ..ops import sha2


class LightInputs(NamedTuple):
    dg1_words: jnp.ndarray        # (32, B) — 1024 bits padded
    sk_identity: jnp.ndarray      # (16, B)


def forward(inp: LightInputs, dg_hash_type: int = 256,
            document_type: int = 3):
    chunk = 186 if document_type == 3 else 190
    chunks = [bitops.word_slice_to_fr(inp.dg1_words, i * chunk, chunk,
                                      msb_first=False) for i in range(4)]
    sk_hash = pos.poseidon([inp.sk_identity])
    dg1_commitment = pos.poseidon(chunks + [sk_hash])

    px, py = bjj.base8_mul(inp.sk_identity, inp.sk_identity.shape[1:])
    pk_identity_hash = pos.poseidon([px, py])

    if dg_hash_type in (384, 512):
        dw = sha2.sha_hash_chunks(
            bitops.words32_to_words64(inp.dg1_words), dg_hash_type)
        flat = dw.reshape((dw.shape[0] * 2,) + dw.shape[2:])
    else:
        dw = sha2.sha_hash_chunks(inp.dg1_words, dg_hash_type)
        flat = dw
    # dg1Hash = digest mod 2^248 (big-endian value of the trailing bits)
    keep = min(248, dg_hash_type)
    bits = bitops.get_bits(flat, dg_hash_type - keep, keep)
    dg1_hash = bitops.bits_to_fr(bits, msb_first=True)

    return {"dg1_commitment": dg1_commitment,
            "pk_identity_hash": pk_identity_hash,
            "dg1_hash": dg1_hash}
