"""Host-side input-tensor builder: raw passport blobs -> batched device
tensors for the RegisterIdentity forward.

Performs the off-circuit work the reference does in JS: SHA padding of every
blob (process_passport.js:11-91), bignum chunking (:113-135), and the Barrett
precompute (the reference hints the same idea at :137-139
`compute_barret_reduction`).
"""

from __future__ import annotations

import numpy as np

from ..models.params import CircuitParams
from ..models.passport_verification import PassportInputs
from ..models.register_identity import RegisterIdentityInputs
from ..ops import bignum as bn
from ..ops import field as fr
from . import native


def _padded_words(blobs, block_bits: int, n_blocks: int) -> np.ndarray:
    """B raw blobs -> (n_words, B) padded big-endian word tensor (C++ fast
    path via ingest.native, Python fallback)."""
    return native.pad_words32_batch(blobs, block_bits, n_blocks)


def build_register_inputs(p: CircuitParams, passports) -> RegisterIdentityInputs:
    """passports: list of dicts from ingest.synthetic (or parsed real data).
    Returns batched numpy inputs (limb/word tensors, batch minor-most)."""
    sig = p.sig
    k = sig.key_bits // 16

    dg1_w = _padded_words([pp["dg1"] for pp in passports],
                          p.dg_hash_block_size, 1024 // p.dg_hash_block_size)
    ec_w = _padded_words([pp["ec"] for pp in passports],
                         p.sig_hash_block_size, p.ec_block_number)
    sa_w = _padded_words([pp["sa"] for pp in passports],
                         p.sig_hash_block_size, 1024 // p.sig_hash_block_size)
    if p.aa_signature_algo != 0:
        dg15_w = _padded_words([pp["dg15"] for pp in passports],
                               p.dg_hash_block_size, p.dg15_block_number)
    else:
        dg15_w = np.zeros(
            (p.dg15_block_number * p.dg_hash_block_size // 32,
             len(passports)), dtype=np.uint32)

    if sig.family == "ecdsa":
        # pubkey = (X, Y), signature = (r, s); key_bits = 2 * field bits
        kf = sig.key_bits // 32
        pubkey = np.concatenate([
            bn.ints_to_limbs_batch([pp["pubkey"][0] for pp in passports], kf),
            bn.ints_to_limbs_batch([pp["pubkey"][1] for pp in passports], kf),
        ], axis=0)
        signature = np.concatenate([
            bn.ints_to_limbs_batch([pp["signature"][0] for pp in passports], kf),
            bn.ints_to_limbs_batch([pp["signature"][1] for pp in passports], kf),
        ], axis=0)
        mu = np.zeros((k + 1, len(passports)), dtype=np.uint32)  # unused
    else:
        mods = [pp["pubkey"] for pp in passports]
        pubkey = bn.ints_to_limbs_batch(mods, k)
        signature = bn.ints_to_limbs_batch(
            [pp["signature"] for pp in passports], k)
        mu = bn.barrett_mu_batch(mods, k)
    passport_inp = PassportInputs(
        dg1_words=dg1_w,
        dg15_words=dg15_w,
        ec_words=ec_w,
        sa_words=sa_w,
        signature=signature,
        pubkey=pubkey,
        pubkey_mu=mu,
        slave_root=fr.batch_to_limbs([pp["slave_root"] for pp in passports]),
        slave_branches=np.stack(
            [fr.batch_to_limbs([pp["slave_branches"][i] for pp in passports])
             for i in range(80)], axis=1),
    )
    return RegisterIdentityInputs(
        passport=passport_inp,
        sk_identity=fr.batch_to_limbs(
            [pp["sk_identity"] for pp in passports]),
    )
