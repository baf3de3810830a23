"""Full-pipeline test: DER SOD -> parse -> detect -> shifts -> witness."""
import random

import jax
import numpy as np
import pytest

from passport_zk_circuits_tpu.ingest import asn1, passport, synthetic
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
