"""QueryIdentity selective disclosure vs Python oracles."""
import random
import pytest

import jax
import numpy as np

from passport_zk_circuits_tpu.models import query_identity as qi
from passport_zk_circuits_tpu.ops import field as fr
from passport_zk_circuits_tpu.ops import sha2
from passport_zk_circuits_tpu.utils import poseidon_ref as pref
from passport_zk_circuits_tpu.utils import babyjubjub_ref as bref
from passport_zk_circuits_tpu.utils.constants.countries import COUNTRIES


pytestmark = pytest.mark.slow  # big-graph compile tier (SURVEY §4 budget)

rng = random.Random(555)


def _date_bytes(y, m, d):
    return f"{y:02d}{m:02d}{d:02d}".encode()


def _enc(date_bytes: bytes) -> int:
    return int.from_bytes(date_bytes, "big")


def make_dg1_td3(rng, birth=b"900115", expiry=b"301231", citizenship=b"UKR"):
    dg1 = bytearray(93)
    for i in range(93):
        dg1[i] = 0x41 + rng.randrange(26)
    dg1[56 // 8:56 // 8 + 3] = citizenship            # citizenship @ bit 56
    dg1[496 // 8:496 // 8 + 6] = birth                # birth date @ 496
    dg1[560 // 8:560 // 8 + 6] = expiry               # expiry @ 560
    dg1[552 // 8] = ord("F")                          # sex @ 552
    return bytes(dg1)


def _field_be(dg1: bytes, shift: int, size: int) -> int:
    bits = []
    for byte in dg1:
        for i in range(7, -1, -1):
            bits.append((byte >> i) & 1)
    v = 0
    for j in range(size):
        v = (v << 1) | bits[shift + j]
    return v


def _rev(dg1: bytes, start: int, n: int) -> int:
    bits = []
    for byte in dg1:
        for i in range(7, -1, -1):
            bits.append((byte >> i) & 1)
    return sum(bits[start + j] << j for j in range(n))


def test_query_identity_td3():
    B = 2
    dg1s = [make_dg1_td3(rng) for _ in range(B)]
    sks = [rng.randrange(1, fr.P) for _ in range(B)]
    pk_pass = [rng.randrange(fr.P) for _ in range(B)]
    event_id = [rng.randrange(fr.P) for _ in range(B)]
    ts = [1716482295 + i for i in range(B)]
    idc = [3 + i for i in range(B)]

    roots = []
    for dg1, sk, pkp, t, c in zip(dg1s, sks, pk_pass, ts, idc):
        chunks = [_rev(dg1, i * 186, 186) for i in range(4)]
        dg_commit = pref.poseidon(chunks + [pref.poseidon([sk])])
        px, py = bref.base8_mul(sk)
        key = pref.poseidon([pkp, pref.poseidon([px, py])])
        value = pref.poseidon([dg_commit, c, t])
        roots.append(pref.poseidon([key, value, 1]))

    dg1_words = np.stack(
        [sha2.bytes_to_words32(d + b"\x00" * 3) for d in dg1s], axis=-1)
    selector = np.full((B,), (1 << 16) - 1, dtype=np.uint32)  # bits 0..15

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
    out, checks = jax.jit(lambda i: qi.forward(i, 3, 80))(inp)

    for name, ok in checks.items():
        assert np.asarray(ok).all(), f"check {name} failed"

    for j, (dg1, sk, eid) in enumerate(zip(dg1s, sks, event_id)):
        got_null = fr.batch_from_limbs(out["nullifier"])[j]
        assert got_null == pref.poseidon([sk, pref.poseidon([sk]), eid])
        assert fr.batch_from_limbs(out["birth_date"])[j] == \
            _field_be(dg1, 496, 48)
        assert fr.batch_from_limbs(out["name"])[j] == _field_be(dg1, 80, 248)
        assert fr.batch_from_limbs(out["citizenship"])[j] == \
            int.from_bytes(b"UKR", "big")
        assert fr.batch_from_limbs(out["sex"])[j] == ord("F")
        assert fr.batch_from_limbs(out["document_number"])[j] == \
            _field_be(dg1, 392, 72)

    # selector all-zero blinds everything
    inp0 = inp._replace(selector=np.zeros((B,), dtype=np.uint32))
    out0, _ = qi.forward(inp0, 3, 80)
    for k in ("nullifier", "birth_date", "name", "document_number"):
        assert fr.batch_from_limbs(out0[k]) == [0, 0]


def test_citizenship_blacklist():
    B = 2
    dg1s = [make_dg1_td3(rng, citizenship=b"UKR"),
            make_dg1_td3(rng, citizenship=b"RUS")]
    # blacklist RUS: entry index in table, bit MSB-first
    rus = int.from_bytes(b"RUS", "big")
    idx = COUNTRIES.index(rus)
    mask = 1 << (239 - idx)
    from passport_zk_circuits_tpu.models.query_identity import \
        citizenship_check
    cz = fr.batch_to_limbs([int.from_bytes(b"UKR", "big"), rus])
    mask_l = fr.batch_to_limbs([mask, mask])
    in_table, not_black = citizenship_check(cz, mask_l)
    assert np.asarray(in_table).all()
    np.testing.assert_array_equal(np.asarray(not_black), [True, False])
    # unknown country fails the membership check
    cz2 = fr.batch_to_limbs([int.from_bytes(b"XXX", "big"), rus])
    in2, _ = citizenship_check(cz2, fr.batch_to_limbs([0, 0]))
    assert not np.asarray(in2)[0]


def test_date_comparators():
    from passport_zk_circuits_tpu.ops import dates
    pairs = [(b"900101", b"901231", True), (b"900101", b"900101", False),
             (b"991231", b"000101", False), (b"200505", b"200506", True)]
    f = fr.batch_to_limbs([_enc(a) for a, b, _ in pairs])
    s = fr.batch_to_limbs([_enc(b) for a, b, _ in pairs])
    less, ok = dates.encoded_date_is_less(f, s)
    np.testing.assert_array_equal(np.asarray(less),
                                  [w for _, _, w in pairs])
    assert np.asarray(ok).all()
    # century normalization: 99 < 00 becomes True when current date is 25xxxx
    cur = fr.batch_to_limbs([_enc(b"250817")] * len(pairs))
    lessn, okn = dates.encoded_date_is_less_normalized(f, s, cur)
    np.testing.assert_array_equal(
        np.asarray(lessn), [True, False, True, True])
    assert np.asarray(okn).all()
    # malformed date (non-digit bytes) flags not-well-formed
    bad = fr.batch_to_limbs([int.from_bytes(b"9A0101", "big")])
    _, okb = dates.encoded_date_is_less(bad, fr.batch_to_limbs([_enc(b"991231")]))
    assert not np.asarray(okb)[0]
