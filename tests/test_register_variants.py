"""RegisterIdentity variants: ECDSA signer, TD1 documents, Light."""
import random
import pytest

import jax
import numpy as np

from passport_zk_circuits_tpu.models.params import CircuitParams
from passport_zk_circuits_tpu.models import register_identity as ri
from passport_zk_circuits_tpu.models import register_identity_light as ril
from passport_zk_circuits_tpu.ingest import synthetic
from passport_zk_circuits_tpu.ingest.builder import build_register_inputs
from passport_zk_circuits_tpu.ops import field as fr
from passport_zk_circuits_tpu.ops import sha2

rng = random.Random(616)

ECDSA_P256 = CircuitParams(signature_type=20, dg_hash_type=256,
                           document_type=3, ec_block_number=4, ec_shift=600,
                           dg1_shift=248, aa_signature_algo=0, dg15_shift=0,
                           dg15_block_number=1, aa_shift=0)
TD1_RSA = CircuitParams(signature_type=1, dg_hash_type=256, document_type=1,
                        ec_block_number=4, ec_shift=600, dg1_shift=248,
                        aa_signature_algo=0, dg15_shift=0,
                        dg15_block_number=1, aa_shift=0)



pytestmark = pytest.mark.slow  # sweep/e2e tier (SURVEY §4 budget)

def _run(p, B=2):
    signer = None
    pps = []
    for _ in range(B):
        pp = synthetic.make_synthetic_passport(p, rng, signer_key=signer)
        signer = pp["signer_key"]
        pps.append(pp)
    inp = build_register_inputs(p, pps)
    out = jax.jit(lambda i: ri.forward(p, i))(inp)
    return pps, out


def _check(p, pps, out):
    assert np.asarray(out["flow_ok"]).all()
    assert np.asarray(out["sig_ok"]).all()
    assert np.asarray(out["smt_ok"]).all()
    for name in ("passport_hash", "dg1_commitment", "pk_identity_hash"):
        got = fr.batch_from_limbs(out[name])
        want = [synthetic.expected_outputs(p, pp)[name] for pp in pps]
        assert got == want, name


def test_ecdsa_p256_passport():
    pps, out = _run(ECDSA_P256)
    _check(ECDSA_P256, pps, out)
    # tampered signature fails
    bad = dict(pps[0])
    r, s = pps[0]["signature"]
    bad["signature"] = (r ^ 1, s)
    inp = build_register_inputs(ECDSA_P256, [bad, pps[1]])
    out2 = ri.forward(ECDSA_P256, inp)
    sig = np.asarray(out2["sig_ok"])
    assert not sig[0] and sig[1]


def test_td1_document():
    pps, out = _run(TD1_RSA)
    assert all(len(pp["dg1"]) == 95 for pp in pps)
    _check(TD1_RSA, pps, out)


def test_register_identity_light():
    B = 2
    dg1s = [bytes(rng.randrange(256) for _ in range(93)) for _ in range(B)]
    sks = [rng.randrange(1, fr.P) for _ in range(B)]
    padded = [sha2.pad_message(d, 512) for d in dg1s]
    inp = ril.LightInputs(
        dg1_words=np.stack([sha2.bytes_to_words32(p) for p in padded],
                           axis=-1),
        sk_identity=fr.batch_to_limbs(sks))
    out = jax.jit(lambda i: ril.forward(i, 256, 3))(inp)
    for j, (dg1, sk) in enumerate(zip(dg1s, sks)):
        assert fr.batch_from_limbs(out["dg1_commitment"])[j] == \
            synthetic.dg1_commitment_oracle(dg1, 3, sk)
        assert fr.batch_from_limbs(out["pk_identity_hash"])[j] == \
            synthetic.pk_identity_hash_oracle(sk)
        import hashlib
        want = int.from_bytes(hashlib.sha256(dg1).digest(), "big") % (1 << 248)
        assert fr.batch_from_limbs(out["dg1_hash"])[j] == want


def test_ecdsa_active_auth():
    """AA algo 20 (p256): dg15 carries X||Y; dg15PubKeyHash = Poseidon2 of
    truncated coords."""
    p = CircuitParams(signature_type=1, dg_hash_type=256, document_type=3,
                      ec_block_number=4, ec_shift=600, dg1_shift=248,
                      aa_signature_algo=20, dg15_shift=1496,
                      dg15_block_number=3, aa_shift=256)
    pps, out = _run(p)
    _check(p, pps, out)
    got = fr.batch_from_limbs(out["dg15_pubkey_hash"])
    want = [synthetic.dg15_pubkey_hash_oracle(p, pp["dg15"]) for pp in pps]
    assert got == want
