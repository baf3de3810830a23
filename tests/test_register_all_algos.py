"""End-to-end RegisterIdentity over every remaining SIG_ALGO id.

Together with test_register_identity / test_register_variants /
test_register_more_algos this closes the full VerifySignature dispatch table
(signatureVerification.circom:13-116): every id in models.params.SIG_ALGOS has
an end-to-end witness test against the pure-Python output oracles.
"""
import random

import jax
import numpy as np
import pytest

from passport_zk_circuits_tpu.models.params import CircuitParams
from passport_zk_circuits_tpu.models import register_identity as ri
from passport_zk_circuits_tpu.ingest import synthetic
from passport_zk_circuits_tpu.ingest.builder import build_register_inputs
from passport_zk_circuits_tpu.ops import field as fr

rng = random.Random(977)


def _params(sig, dg_hash=256, ec_blocks=4, ec_shift=600, dg1_shift=248):
    return CircuitParams(signature_type=sig, dg_hash_type=dg_hash,
                         document_type=3, ec_block_number=ec_blocks,
                         ec_shift=ec_shift, dg1_shift=dg1_shift,
                         aa_signature_algo=0, dg15_shift=0,
                         dg15_block_number=1, aa_shift=0)


def _run_and_check(p, B=2):
    signer = None
    pps = []
    for _ in range(B):
        pp = synthetic.make_synthetic_passport(p, rng, signer_key=signer)
        signer = pp["signer_key"]
        pps.append(pp)
    inp = build_register_inputs(p, pps)
    out = jax.jit(lambda i: ri.forward(p, i))(inp)
    assert np.asarray(out["flow_ok"]).all()
    assert np.asarray(out["sig_ok"]).all()
    assert np.asarray(out["smt_ok"]).all()
    for name in ("passport_hash", "dg1_commitment", "pk_identity_hash"):
        got = fr.batch_from_limbs(out[name])
        want = [synthetic.expected_outputs(p, pp)[name] for pp in pps]
        assert got == want, name


# RSA / RSA-PSS ids not covered elsewhere. Algo 13 hashes signed attributes
# with SHA-384 (1024-bit blocks): the 48-byte EC digest needs a low shift to
# fit the single padded SA block.
@pytest.mark.parametrize("sig,dg_hash,ec_shift", [
    (4, 160, 600),    # RSA-3072, SHA-1, exp 37187
    (10, 256, 600),   # RSA-PSS 2048, exp 3, salt 32
    (12, 256, 600),   # RSA-PSS 2048, salt 64
    (13, 256, 200),   # RSA-PSS 2048, SHA-384, salt 48
    (14, 256, 600),   # RSA-PSS 3072, salt 32
])
def test_rsa_family(sig, dg_hash, ec_shift):
    _run_and_check(_params(sig, dg_hash=dg_hash, ec_shift=ec_shift))


# ECDSA ids beyond the p256 e2e in test_register_variants. Algo 25 hashes
# with SHA-384 (1024-bit SA blocks) -> low ec_shift, like algo 13.
@pytest.mark.parametrize("sig,ec_shift", [
    (21, 600),        # brainpoolP256r1, SHA-256
    (22, 600),        # brainpoolP320r1, SHA-256
    (23, 600),        # secp192r1, SHA-1
    (24, 600),        # secp224r1, SHA-224 (32-bit chunk quirk in reference)
    (25, 200),        # brainpoolP384r1, SHA-384
])
def test_ecdsa_family(sig, ec_shift):
    _run_and_check(_params(sig, ec_shift=ec_shift), B=1)
