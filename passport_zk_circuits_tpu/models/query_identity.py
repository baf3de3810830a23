"""Batched QueryIdentity (TD3 + TD1): selective disclosure over a registered
passport against the on-chain identity-state SMT.

Capability twin of
/root/reference/circuits/identityManagement/queryIdentity.circom:37-229,
queryIdentityTD1.circom:47-237, dg1DataExtractor.circom:5-98,
dg1TD1DataExtractor.circom:5-108, identityStateVerifier.circom:8-47 and
citizenshipCheck.circom:6-276.

circom enforces range/membership checks as hard constraints
(ForceEqualIfEnabled / `=== 1`); the batched witness program returns the
same predicates as booleans in `checks` — a witness is valid iff they all
hold (our sanitizer model, SURVEY.md §5)."""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from ..ops import field as fr
from ..ops import bignum as bn
from ..ops import bitops
from ..ops import poseidon as pos
from ..ops import babyjubjub as bjj
from ..ops import smt
from ..ops import dates
from ..utils.constants.countries import COUNTRIES

# selector bits (queryIdentity.circom:12-31)
SEL_NULLIFIER = 0
SEL_BIRTH_DATE = 1
SEL_EXPIRATION_DATE = 2
SEL_NAME = 3
SEL_NATIONALITY = 4
SEL_CITIZENSHIP = 5
SEL_SEX = 6
SEL_DOCUMENT_NUMBER = 7
SEL_TS_LOWER = 8
SEL_TS_UPPER = 9
SEL_IDC_LOWER = 10
SEL_IDC_UPPER = 11
SEL_EXP_LOWER = 12
SEL_EXP_UPPER = 13
SEL_BIRTH_LOWER = 14
SEL_BIRTH_UPPER = 15
SEL_PERSONAL_NUMBER = 16   # TD1 only (TD3: whitelist bit, unimplemented)
SEL_DOCUMENT_TYPE = 17     # TD1 only

# DG1 field layout: (shift_bits, size_bits) per document type
_TD3_FIELDS = {
    "birth_date": (496, 48), "expiration_date": (560, 48),
    "name": (80, 248), "name_residual": (328, 64),
    "nationality": (472, 24), "citizenship": (56, 24),
    "sex": (552, 8), "document_number": (392, 72),
}
_TD1_FIELDS = {
    "birth_date": (280, 48), "expiration_date": (344, 48),
    "name": (520, 240),
    "nationality": (400, 24), "citizenship": (56, 24),
    "sex": (336, 8), "document_number": (80, 72),
    "personal_number": (160, 88), "document_type": (40, 16),
}


class QueryInputs(NamedTuple):
    dg1_words: jnp.ndarray          # (24, B): 744/760 dg1 bits, zero-padded
    sk_identity: jnp.ndarray        # (16, B)
    pk_passport_hash: jnp.ndarray   # (16, B)
    event_id: jnp.ndarray           # (16, B)
    event_data: jnp.ndarray         # (16, B)
    id_state_root: jnp.ndarray      # (16, B)
    id_state_siblings: jnp.ndarray  # (16, depth, B)
    selector: jnp.ndarray           # (B,) uint32 (18 bits)
    current_date: jnp.ndarray       # (16, B) encoded date
    timestamp: jnp.ndarray          # (16, B)
    timestamp_lower: jnp.ndarray    # (16, B)
    timestamp_upper: jnp.ndarray    # (16, B)
    identity_counter: jnp.ndarray   # (16, B)
    identity_counter_lower: jnp.ndarray
    identity_counter_upper: jnp.ndarray
    birth_date_lower: jnp.ndarray   # (16, B) encoded dates
    birth_date_upper: jnp.ndarray
    expiration_date_lower: jnp.ndarray
    expiration_date_upper: jnp.ndarray
    citizenship_mask: jnp.ndarray   # (16, B) — 240-bit mask


def extract_dg1_fields(dg1_words, document_type: int):
    fields = _TD3_FIELDS if document_type == 3 else _TD1_FIELDS
    return {name: bitops.word_slice_to_fr(dg1_words, off, size,
                                          msb_first=True)
            for name, (off, size) in fields.items()}


def _sel_bit(selector, i: int):
    return ((selector >> i) & 1).astype(bool)


def _gate(value, bit):
    return fr.select(bit, value, jnp.zeros_like(value))


def identity_state_verify(sk_identity, pk_pass_hash, dg_commit,
                          identity_counter, timestamp, root, siblings):
    """IdentityStateVerifier (identityStateVerifier.circom:8-47):
    key = Poseidon2(pkPassHash, Poseidon2(BabyPbk(sk))),
    value = Poseidon3(dgCommit, identityCounter, timestamp); enforced SMT."""
    px, py = bjj.base8_mul(sk_identity, sk_identity.shape[1:])
    pk_hash = pos.poseidon([px, py])
    key = pos.poseidon([pk_pass_hash, pk_hash])
    value = pos.poseidon([dg_commit, identity_counter, timestamp])
    ok, _ = smt.verify(root, key, value, siblings)
    return ok


def citizenship_check(citizenship, mask_limbs):
    """CitizenshipCheck (citizenshipCheck.circom:6-276): citizenship must be
    in the 240-entry table and its mask bit (MSB-first) must be 0.
    Returns (in_table, not_blacklisted)."""
    cz = citizenship[0] | (citizenship[1] << 16)     # 24-bit value
    table = np.asarray(COUNTRIES, dtype=np.uint32)
    match = cz[None, ...] == table.reshape((240,) + (1,) * cz.ndim)
    in_table = match.sum(axis=0) == 1
    # bit i of the mask (num2bits LSB indexing) gates entry 239-i
    bits = fr.to_bits(mask_limbs, 240).astype(bool)  # (240, B) LSB-first
    entry_bit = bits[::-1]                            # entry i <- bit 239-i
    blacklisted = jnp.any(match & entry_bit, axis=0)
    return in_table, ~blacklisted


def forward(inp: QueryInputs, document_type: int = 3, tree_depth: int = 80):
    """Returns (outputs, checks) dicts. Outputs are selector-gated like the
    reference's public outputs; checks are the constraint predicates."""
    f = extract_dg1_fields(inp.dg1_words, document_type)
    sel = inp.selector

    sk_hash = pos.poseidon([inp.sk_identity])
    nullifier = pos.poseidon([inp.sk_identity, sk_hash, inp.event_id])

    outputs = {
        "nullifier": _gate(nullifier, _sel_bit(sel, SEL_NULLIFIER)),
        "birth_date": _gate(f["birth_date"], _sel_bit(sel, SEL_BIRTH_DATE)),
        "expiration_date": _gate(f["expiration_date"],
                                 _sel_bit(sel, SEL_EXPIRATION_DATE)),
        "name": _gate(f["name"], _sel_bit(sel, SEL_NAME)),
        "nationality": _gate(f["nationality"],
                             _sel_bit(sel, SEL_NATIONALITY)),
        "citizenship": _gate(f["citizenship"],
                             _sel_bit(sel, SEL_CITIZENSHIP)),
        "sex": _gate(f["sex"], _sel_bit(sel, SEL_SEX)),
    }
    if document_type == 3:
        outputs["name_residual"] = _gate(f["name_residual"],
                                         _sel_bit(sel, SEL_NAME))
        outputs["document_number"] = _gate(
            f["document_number"], _sel_bit(sel, SEL_DOCUMENT_NUMBER))
    else:
        outputs["document_number_hash"] = _gate(
            pos.poseidon([f["document_number"]]),
            _sel_bit(sel, SEL_DOCUMENT_NUMBER))
        outputs["personal_number_hash"] = _gate(
            pos.poseidon([f["personal_number"]]),
            _sel_bit(sel, SEL_PERSONAL_NUMBER))
        outputs["document_type"] = _gate(
            f["document_type"], _sel_bit(sel, SEL_DOCUMENT_TYPE))

    def bounded(enabled_bit, pred):
        return ~enabled_bit | pred

    checks = {}
    checks["timestamp_lower"] = bounded(
        _sel_bit(sel, SEL_TS_LOWER),
        ~bn.lt(inp.timestamp, inp.timestamp_lower))       # ts >= lower
    checks["timestamp_upper"] = bounded(
        _sel_bit(sel, SEL_TS_UPPER),
        bn.lt(inp.timestamp, inp.timestamp_upper))        # ts < upper
    checks["identity_counter_lower"] = bounded(
        _sel_bit(sel, SEL_IDC_LOWER),
        ~bn.lt(inp.identity_counter, inp.identity_counter_lower))
    checks["identity_counter_upper"] = bounded(
        _sel_bit(sel, SEL_IDC_UPPER),
        bn.lt(inp.identity_counter, inp.identity_counter_upper))

    exp_lo, _ = dates.encoded_date_is_less(inp.expiration_date_lower,
                                           f["expiration_date"])
    exp_hi, _ = dates.encoded_date_is_less(f["expiration_date"],
                                           inp.expiration_date_upper)
    birth_lo, _ = dates.encoded_date_is_less_normalized(
        inp.birth_date_lower, f["birth_date"], inp.current_date)
    birth_hi, _ = dates.encoded_date_is_less_normalized(
        f["birth_date"], inp.birth_date_upper, inp.current_date)
    checks["expiration_lower"] = bounded(_sel_bit(sel, SEL_EXP_LOWER), exp_lo)
    checks["expiration_upper"] = bounded(_sel_bit(sel, SEL_EXP_UPPER), exp_hi)
    checks["birth_lower"] = bounded(_sel_bit(sel, SEL_BIRTH_LOWER), birth_lo)
    checks["birth_upper"] = bounded(_sel_bit(sel, SEL_BIRTH_UPPER), birth_hi)

    # dg1 commitment recompute (reversed-bit chunks, like RegisterIdentity)
    cs = 186 if document_type == 3 else 190
    chunks = [bitops.word_slice_to_fr(inp.dg1_words, i * cs, cs,
                                      msb_first=False) for i in range(4)]
    dg_commit = pos.poseidon(chunks + [sk_hash])

    # eventData is bound by squaring only (queryIdentity.circom:208-209)
    _ = fr.sqr(inp.event_data)

    checks["identity_state"] = identity_state_verify(
        inp.sk_identity, inp.pk_passport_hash, dg_commit,
        inp.identity_counter, inp.timestamp, inp.id_state_root,
        inp.id_state_siblings)

    in_table, not_blacklisted = citizenship_check(f["citizenship"],
                                                  inp.citizenship_mask)
    checks["citizenship_in_table"] = in_table
    checks["citizenship_not_blacklisted"] = not_blacklisted

    return outputs, checks
