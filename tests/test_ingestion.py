"""Full-pipeline test: DER SOD -> parse -> detect -> shifts -> witness."""
import random

import jax
import numpy as np
import pytest

from passport_zk_circuits_tpu.ingest import (asn1, masterlist, passport,
                                             synthetic, x509)
from passport_zk_circuits_tpu.ingest.builder import build_register_inputs
from passport_zk_circuits_tpu.models import register_identity as ri
from passport_zk_circuits_tpu.ops import field as fr
from passport_zk_circuits_tpu.utils.rsa_keygen import gen_rsa_key

rng = random.Random(909)


def test_asn1_roundtrip():
    blob = asn1.seq(asn1.integer(1234567890123456789),
                    asn1.oid("1.2.840.113549.1.1.11"),
                    asn1.der_set(asn1.octet_string(b"hello")),
                    asn1.bit_string(b"\xff\x01"))
    node = asn1.parse(blob)
    assert node.tag == asn1.SEQUENCE
    assert node.child(0).as_int() == 1234567890123456789
    assert node.child(1).as_oid() == "1.2.840.113549.1.1.11"
    assert node.child(2).child(0).content == b"hello"
    assert node.child(3).content == b"\x00\xff\x01"
    # long-form length
    big = asn1.octet_string(b"x" * 300)
    assert asn1.parse(big).content == b"x" * 300


def test_sod_parse_and_detect():
    dg1 = bytes(rng.randrange(256) for _ in range(93))
    aa_n, _, _ = gen_rsa_key(1024, rng)
    dg15 = passport.build_dg15_rsa(aa_n)
    sod, signer = passport.build_sod(dg1, dg15, 1, 256, rng)
    parsed = passport.parse_sod(sod)
    assert parsed["dg_hash_bits"] == 256
    assert parsed["sa_hash_bits"] == 256
    assert parsed["pubkey_n"] == signer[0]
    assert passport.detect_sig_algo(parsed) == 1

    params, witness = passport.process_passport(dg1, dg15, sod)
    assert params.signature_type == 1
    assert params.dg_hash_type == 256
    assert params.document_type == 3
    assert params.dg1_shift % 8 == 0 and params.dg1_shift > 0
    assert params.aa_shift % 8 == 0
    # dg15 bits at aa_shift really are the modulus
    bits_off = params.aa_shift // 8
    assert dg15[bits_off:bits_off + 128] == aa_n.to_bytes(128, "big")



def test_x509_certificate_roundtrip():
    """Build DS certificates (RSA, EC named-curve, EC explicit-params) and
    recover the pubkey through the [0]-certificates walk."""
    ca = gen_rsa_key(2048, rng)
    n, e, _ = gen_rsa_key(2048, rng)
    cert = x509.build_certificate(x509.rsa_spki(n, e), "DS", "CSCA", ca)
    assert x509.parse_certificate_pubkey(cert) == ("rsa", n, e)

    from passport_zk_circuits_tpu.ops.curves import CURVES
    from passport_zk_circuits_tpu.utils import ecdsa_ref
    d, (qx, qy) = ecdsa_ref.keygen(CURVES["brainpoolP256r1"], rng)
    cert2 = x509.build_certificate(
        x509.ec_spki("brainpoolP256r1", qx, qy), "DS", "CSCA", ca)
    assert x509.parse_certificate_pubkey(cert2) == \
        ("ecdsa", "brainpoolP256r1", (qx, qy))
    # explicit parameters: curve matched by prime (the reference's trick,
    # process_passport.js:492-571)
    cert3 = x509.build_certificate(
        x509.ec_spki("brainpoolP256r1", qx, qy, explicit_params=True),
        "DS", "CSCA", ca)
    assert x509.parse_certificate_pubkey(cert3) == \
        ("ecdsa", "brainpoolP256r1", (qx, qy))


def test_sod_parse_rsapss_and_ecdsa():
    dg1 = bytes(rng.randrange(256) for _ in range(93))
    # RSA-PSS algo 11 (2048/SHA-256/salt 32): PSS params carried in the
    # AlgorithmIdentifier
    sod, signer = passport.build_sod(dg1, None, 11, 256, rng)
    parsed = passport.parse_sod(sod)
    assert parsed["family"] == "rsapss"
    assert parsed["salt_len"] == 32
    assert parsed["pubkey_n"] == signer[0]
    assert passport.detect_sig_algo(parsed) == 11
    # ECDSA algo 20 (p256): DER (r, s) + EC SPKI inside a real certificate
    sod2, signer2 = passport.build_sod(dg1, None, 20, 256, rng)
    parsed2 = passport.parse_sod(sod2)
    assert parsed2["family"] == "ecdsa"
    assert parsed2["curve"] == "p256"
    assert parsed2["pubkey_q"] == signer2[1]
    assert passport.detect_sig_algo(parsed2) == 20
    params2, witness2 = passport.process_passport(dg1, None, sod2, aa_algo=0)
    assert params2.signature_type == 20
    assert witness2["signature"] == parsed2["signature"]


def test_master_list_smt():
    """Multi-leaf master list: proofs verify on device, absent keys raise."""
    from passport_zk_circuits_tpu.ops import smt
    ca = gen_rsa_key(2048, rng)
    certs = []
    for _ in range(5):
        n, e, _ = gen_rsa_key(2048, rng)
        certs.append(x509.build_certificate(x509.rsa_spki(n, e),
                                            "DS", "CSCA", ca))
    tree = masterlist.build_master_list(certs)
    hashes = [masterlist.pubkey_hash_of_cert(c) for c in certs]
    roots, keys, sibs = [], [], []
    for h in hashes:
        root, branches = tree.prove(h)
        roots.append(root)
        keys.append(h)
        sibs.append(branches)
    assert len(set(roots)) == 1
    root_l = fr.batch_to_limbs(roots)
    key_l = fr.batch_to_limbs(keys)
    sib_l = np.stack([fr.batch_to_limbs(s) for s in zip(*sibs)], axis=1)
    ok, _ = jax.jit(smt.verify)(root_l, key_l, key_l, sib_l)
    assert np.asarray(ok).all()
    with pytest.raises(KeyError):
        tree.prove(hashes[0] + 1)


@pytest.mark.slow  # full pipeline incl. RSA keygen + witness forward
def test_pipeline_with_master_list():
    """Ingestion anchored to a real multi-leaf master list: the register
    circuit's SMT check passes with the DS cert's proof."""
    dg1 = bytes(rng.randrange(256) for _ in range(93))
    sod, signer = passport.build_sod(dg1, None, 1, 256, rng)
    # master list containing our signer + decoys
    ca = gen_rsa_key(2048, rng)
    certs = [x509.build_certificate(x509.rsa_spki(signer[0], signer[1]),
                                    "DS", "CSCA", ca)]
    for _ in range(3):
        n, e, _ = gen_rsa_key(2048, rng)
        certs.append(x509.build_certificate(x509.rsa_spki(n, e),
                                            "DS", "CSCA", ca))
    tree = masterlist.build_master_list(certs)
    params, witness = passport.process_passport(dg1, None, sod, aa_algo=0,
                                                master_list=tree)
    assert witness["slave_root"] == tree.root()
    inp = build_register_inputs(params, [witness])
    out = jax.jit(lambda i: ri.forward(params, i))(inp)
    assert np.asarray(out["flow_ok"]).all()
    assert np.asarray(out["sig_ok"]).all()
    assert np.asarray(out["smt_ok"]).all()


@pytest.mark.slow  # full pipeline incl. RSA keygen + witness forward
def test_pipeline_end_to_end():
    """SOD -> auto-detected params -> batched witness -> all checks pass and
    outputs match the oracles."""
    dg1 = bytes(rng.randrange(256) for _ in range(93))
    aa_n, _, _ = gen_rsa_key(1024, rng)
    dg15 = passport.build_dg15_rsa(aa_n)
    sod, _ = passport.build_sod(dg1, dg15, 1, 256, rng)
    params, witness = passport.process_passport(dg1, dg15, sod)

    inp = build_register_inputs(params, [witness, witness])
    out = jax.jit(lambda i: ri.forward(params, i))(inp)
    assert np.asarray(out["flow_ok"]).all()
    assert np.asarray(out["sig_ok"]).all()
    assert np.asarray(out["smt_ok"]).all()
    want = synthetic.expected_outputs(params, witness)
    for name in ("passport_hash", "dg1_commitment", "pk_identity_hash",
                 "dg15_pubkey_hash"):
        assert fr.batch_from_limbs(out[name]) == [want[name]] * 2, name
