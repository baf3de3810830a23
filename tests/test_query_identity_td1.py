"""QueryIdentity TD1 (ID-card) variant end-to-end vs Python oracles.

Capability twin of queryIdentityTD1.circom:47-237: 760-bit dg1, TD1 field
offsets (dg1TD1DataExtractor.circom:5-108), documentNumberHash /
personalNumberHash Poseidon outputs and the documentType reveal gated by
selector bits 16/17 (queryIdentityTD1.circom:89-105), 190-bit dg1 chunks
for the commitment (:203-214)."""
import random
import pytest

import jax
import numpy as np

from passport_zk_circuits_tpu.models import query_identity as qi
from passport_zk_circuits_tpu.ops import field as fr
from passport_zk_circuits_tpu.ops import sha2
from passport_zk_circuits_tpu.utils import poseidon_ref as pref
from passport_zk_circuits_tpu.utils import babyjubjub_ref as bref

from test_query_identity import _enc, _field_be, _rev

rng = random.Random(777)



pytestmark = pytest.mark.slow  # sweep/e2e tier (SURVEY §4 budget)

def make_dg1_td1(rng, birth=b"900115", expiry=b"301231",
                 citizenship=b"UKR", doc_number=b"D23145890",
                 personal=b"99001558998", doc_type=b"ID"):
    dg1 = bytearray(95)
    for i in range(95):
        dg1[i] = 0x41 + rng.randrange(26)
    dg1[40 // 8:40 // 8 + 2] = doc_type               # document type @ 40
    dg1[56 // 8:56 // 8 + 3] = citizenship            # citizenship @ 56
    dg1[80 // 8:80 // 8 + 9] = doc_number             # document number @ 80
    dg1[160 // 8:160 // 8 + 11] = personal            # personal number @ 160
    dg1[280 // 8:280 // 8 + 6] = birth                # birth date @ 280
    dg1[336 // 8] = ord("M")                          # sex @ 336
    dg1[344 // 8:344 // 8 + 6] = expiry               # expiry @ 344
    dg1[400 // 8:400 // 8 + 3] = citizenship          # nationality @ 400
    return bytes(dg1)


def test_query_identity_td1():
    B = 2
    dg1s = [make_dg1_td1(rng) for _ in range(B)]
    sks = [rng.randrange(1, fr.P) for _ in range(B)]
    pk_pass = [rng.randrange(fr.P) for _ in range(B)]
    event_id = [rng.randrange(fr.P) for _ in range(B)]
    ts = [1716482295 + i for i in range(B)]
    idc = [3 + i for i in range(B)]

    roots = []
    for dg1, sk, pkp, t, c in zip(dg1s, sks, pk_pass, ts, idc):
        chunks = [_rev(dg1, i * 190, 190) for i in range(4)]  # TD1: 190-bit
        dg_commit = pref.poseidon(chunks + [pref.poseidon([sk])])
        px, py = bref.base8_mul(sk)
        key = pref.poseidon([pkp, pref.poseidon([px, py])])
        value = pref.poseidon([dg_commit, c, t])
        roots.append(pref.poseidon([key, value, 1]))

    dg1_words = np.stack(
        [sha2.bytes_to_words32(d + b"\x00") for d in dg1s], axis=-1)
    selector = np.full((B,), (1 << 18) - 1, dtype=np.uint32)  # all 18 bits

    inp = qi.QueryInputs(
        dg1_words=dg1_words,
        sk_identity=fr.batch_to_limbs(sks),
        pk_passport_hash=fr.batch_to_limbs(pk_pass),
        event_id=fr.batch_to_limbs(event_id),
        event_data=fr.batch_to_limbs([rng.randrange(fr.P) for _ in range(B)]),
        id_state_root=fr.batch_to_limbs(roots),
        id_state_siblings=np.zeros((16, 80, B), dtype=np.uint32),
        selector=selector,
        current_date=fr.batch_to_limbs([_enc(b"250817")] * B),
        timestamp=fr.batch_to_limbs(ts),
        timestamp_lower=fr.batch_to_limbs([1716482295] * B),
        timestamp_upper=fr.batch_to_limbs([1816482295] * B),
        identity_counter=fr.batch_to_limbs(idc),
        identity_counter_lower=fr.batch_to_limbs([0] * B),
        identity_counter_upper=fr.batch_to_limbs([10] * B),
        birth_date_lower=fr.batch_to_limbs([_enc(b"800101")] * B),
        birth_date_upper=fr.batch_to_limbs([_enc(b"991231")] * B),
        expiration_date_lower=fr.batch_to_limbs([_enc(b"250101")] * B),
        expiration_date_upper=fr.batch_to_limbs([_enc(b"501231")] * B),
        citizenship_mask=fr.batch_to_limbs([0] * B),
    )
    out, checks = jax.jit(lambda i: qi.forward(i, 1, 80))(inp)

    for name, ok in checks.items():
        assert np.asarray(ok).all(), f"check {name} failed"

    for j, (dg1, sk, eid) in enumerate(zip(dg1s, sks, event_id)):
        assert fr.batch_from_limbs(out["nullifier"])[j] == \
            pref.poseidon([sk, pref.poseidon([sk]), eid])
        # TD1 offsets
        assert fr.batch_from_limbs(out["birth_date"])[j] == \
            _field_be(dg1, 280, 48)
        assert fr.batch_from_limbs(out["name"])[j] == _field_be(dg1, 520, 240)
        assert fr.batch_from_limbs(out["citizenship"])[j] == \
            int.from_bytes(b"UKR", "big")
        assert fr.batch_from_limbs(out["nationality"])[j] == \
            int.from_bytes(b"UKR", "big")
        assert fr.batch_from_limbs(out["sex"])[j] == ord("M")
        # TD1-only hashed reveals + documentType (selector bits 16/17)
        assert fr.batch_from_limbs(out["document_number_hash"])[j] == \
            pref.poseidon([_field_be(dg1, 80, 72)])
        assert fr.batch_from_limbs(out["personal_number_hash"])[j] == \
            pref.poseidon([_field_be(dg1, 160, 88)])
        assert fr.batch_from_limbs(out["document_type"])[j] == \
            int.from_bytes(b"ID", "big")
        assert "document_number" not in out     # raw reveal is TD3-only

    # selector bits 16/17 off blind the TD1-only outputs
    inp0 = inp._replace(selector=np.full((B,), 0xFFFF, dtype=np.uint32))
    out0, _ = qi.forward(inp0, 1, 80)
    assert fr.batch_from_limbs(out0["personal_number_hash"]) == [0, 0]
    assert fr.batch_from_limbs(out0["document_type"]) == [0, 0]
