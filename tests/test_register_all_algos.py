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



pytestmark = pytest.mark.slow  # sweep/e2e tier (SURVEY §4 budget)

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
# with SHA-384 (1024-bit SA blocks) -> low ec_shift, like algo 13. Algo 23
# signs with SHA-1, and the reference only compiles when EC_HASH_TYPE >=
# DG_HASH_TYPE (flow check #3 indexes the EC digest with DG_HASH_TYPE
# bits), so its DG hashes must be SHA-1 too.
@pytest.mark.parametrize("sig,dg_hash,ec_shift", [
    (21, 256, 600),   # brainpoolP256r1, SHA-256
    (22, 256, 600),   # brainpoolP320r1, SHA-256
    (23, 160, 600),   # secp192r1, SHA-1 (SHA-1 DG hashes)
    (24, 256, 600),   # secp224r1, SHA-224 SA but SHA-256 EC (ref quirk)
    (25, 256, 200),   # brainpoolP384r1, SHA-384
])
def test_ecdsa_family(sig, dg_hash, ec_shift):
    _run_and_check(_params(sig, dg_hash=dg_hash, ec_shift=ec_shift), B=1)


def test_dg_hash_wider_than_ec_hash_rejected():
    """DG_HASH_TYPE > EC_HASH_TYPE is a circom compile error in the
    reference (passportVerificationFlow.circom:57-62 would index the EC
    digest out of bounds); the framework rejects it explicitly."""
    import jax.numpy as jnp
    from passport_zk_circuits_tpu.models.passport_verification import \
        PassportInputs
    p = _params(23, dg_hash=256, ec_shift=600)   # SHA-1 sig, SHA-256 DGs
    z = jnp.zeros((16, 1), dtype=jnp.uint32)
    inp = PassportInputs(
        dg1_words=jnp.zeros((32, 1), jnp.uint32),
        dg15_words=jnp.zeros((16, 1), jnp.uint32),
        ec_words=jnp.zeros((64, 1), jnp.uint32),
        sa_words=jnp.zeros((32, 1), jnp.uint32),
        signature=z, pubkey=jnp.zeros((24, 1), jnp.uint32),
        pubkey_mu=z, slave_root=z,
        slave_branches=jnp.zeros((16, 80, 1), jnp.uint32))
    with pytest.raises(ValueError, match="DG hash"):
        from passport_zk_circuits_tpu.models import passport_verification
        passport_verification.forward(p, inp)
