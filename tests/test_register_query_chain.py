"""Chained register -> query flow: the full product story.

Mirror of the reference's generated proof-level test
(/root/reference/helpers/generateRegisterIdentityTest.js:205-239): register
a synthetic passport, build the identity-state SMT from the registration
outputs exactly as the on-chain state would, then run QueryIdentity
against that state and check every constraint predicate + disclosure."""

import random

import numpy as np
import jax
import pytest

from passport_zk_circuits_tpu.models.params import CircuitParams
from passport_zk_circuits_tpu.models import register_identity as ri
from passport_zk_circuits_tpu.models import query_identity as qi
from passport_zk_circuits_tpu.ingest import synthetic
from passport_zk_circuits_tpu.ingest.builder import build_register_inputs
from passport_zk_circuits_tpu.ops import field as fr
from passport_zk_circuits_tpu.ops import sha2
from passport_zk_circuits_tpu.utils import poseidon_ref as pref
from passport_zk_circuits_tpu.utils import babyjubjub_ref as bref


def _enc(s: bytes) -> int:
    return int.from_bytes(s, "big")


@pytest.mark.slow
def test_register_then_query_td3():
    p = CircuitParams.from_name(
        "registerIdentity_1_256_3_4_600_248_1_1496_3_256")
    rng = random.Random(77)
    B = 2
    pps = []
    signer = aa = None
    for _ in range(B):
        pp = synthetic.make_synthetic_passport(p, rng, signer_key=signer,
                                               aa_key=aa)
        signer, aa = pp["signer_key"], pp["aa_key"]
        # give dg1 a valid MRZ-ish layout for the query extractors
        dg1 = bytearray(pp["dg1"])
        for i in range(93):
            dg1[i] = 0x41 + rng.randrange(26)
        dg1[56 // 8:56 // 8 + 3] = b"UKR"
        dg1[496 // 8:496 // 8 + 6] = b"900115"
        dg1[560 // 8:560 // 8 + 6] = b"301231"
        pp = dict(pp)
        pp["dg1"] = bytes(dg1)
        # re-chain the digest tree for the mutated dg1
        ec = bytearray(pp["ec"])
        import hashlib
        ec[p.dg1_shift // 8:p.dg1_shift // 8 + 32] = \
            hashlib.sha256(pp["dg1"]).digest()
        pp["ec"] = bytes(ec)
        sa = bytearray(pp["sa"])
        sa[p.ec_shift // 8:p.ec_shift // 8 + 32] = \
            hashlib.sha256(pp["ec"]).digest()
        pp["sa"] = bytes(sa)
        from passport_zk_circuits_tpu.ops import rsa as rsa_ops
        n, e, d = pp["signer_key"]
        pp["signature"] = rsa_ops.sign_pkcs1v15(
            hashlib.sha256(pp["sa"]).digest(), d, n, p.sig.key_bits)
        pps.append(pp)

    # ---- register ----------------------------------------------------
    inputs = build_register_inputs(p, pps)
    out = jax.jit(lambda i: ri.forward(p, i))(inputs)
    assert np.asarray(out["flow_ok"]).all()
    assert np.asarray(out["sig_ok"]).all()
    assert np.asarray(out["smt_ok"]).all()
    pk_pass_hash = fr.batch_from_limbs(out["dg15_pubkey_hash"])
    dg_commits = fr.batch_from_limbs(out["dg1_commitment"])
    pk_id_hash = fr.batch_from_limbs(out["pk_identity_hash"])

    # ---- identity state from the registration outputs ---------------
    # (generateRegisterIdentityTest.js:196-204 host-side reconstruction)
    ts = [1716482295, 1716482299]
    idc = [1, 2]
    roots = []
    for j, pp in enumerate(pps):
        px, py = bref.base8_mul(pp["sk_identity"] % (1 << 254))
        assert pref.poseidon([px, py]) == pk_id_hash[j]
        key = pref.poseidon([pk_pass_hash[j], pk_id_hash[j]])
        value = pref.poseidon([dg_commits[j], idc[j], ts[j]])
        roots.append(pref.poseidon([key, value, 1]))

    # ---- query against that state ------------------------------------
    dg1_words = np.stack(
        [sha2.bytes_to_words32(pp["dg1"] + b"\x00" * 3) for pp in pps],
        axis=-1)
    event_id = [rng.randrange(fr.P) for _ in range(B)]
    qinp = qi.QueryInputs(
        dg1_words=dg1_words,
        sk_identity=fr.batch_to_limbs([pp["sk_identity"] for pp in pps]),
        pk_passport_hash=fr.batch_to_limbs(pk_pass_hash),
        event_id=fr.batch_to_limbs(event_id),
        event_data=fr.batch_to_limbs([1, 2]),
        id_state_root=fr.batch_to_limbs(roots),
        id_state_siblings=np.zeros((16, 80, B), dtype=np.uint32),
        selector=np.full((B,), (1 << 16) - 1, dtype=np.uint32),
        current_date=fr.batch_to_limbs([_enc(b"250817")] * B),
        timestamp=fr.batch_to_limbs(ts),
        timestamp_lower=fr.batch_to_limbs([ts[0]] * B),
        timestamp_upper=fr.batch_to_limbs([ts[1] + 10] * B),
        identity_counter=fr.batch_to_limbs(idc),
        identity_counter_lower=fr.batch_to_limbs([0] * B),
        identity_counter_upper=fr.batch_to_limbs([5] * B),
        birth_date_lower=fr.batch_to_limbs([_enc(b"800101")] * B),
        birth_date_upper=fr.batch_to_limbs([_enc(b"991231")] * B),
        expiration_date_lower=fr.batch_to_limbs([_enc(b"250101")] * B),
        expiration_date_upper=fr.batch_to_limbs([_enc(b"501231")] * B),
        citizenship_mask=fr.batch_to_limbs([0] * B),
    )
    qout, qchecks = jax.jit(lambda i: qi.forward(i, 3, 80))(qinp)
    for name, ok in qchecks.items():
        assert np.asarray(ok).all(), f"chained query check {name} failed"
    # the nullifier is the registered identity's
    for j, pp in enumerate(pps):
        sk = pp["sk_identity"]
        assert fr.batch_from_limbs(qout["nullifier"])[j] == \
            pref.poseidon([sk, pref.poseidon([sk]), event_id[j]])
        assert fr.batch_from_limbs(qout["citizenship"])[j] == _enc(b"UKR")

    # a non-registered sk must fail the identity-state check
    bad = qinp._replace(sk_identity=fr.batch_to_limbs(
        [(pp["sk_identity"] + 1) % fr.P for pp in pps]))
    _, bad_checks = qi.forward(bad, 3, 80)
    assert not np.asarray(bad_checks["identity_state"]).any()
