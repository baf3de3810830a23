"""End-to-end RegisterIdentity across additional SIG_ALGO / DG-hash combos."""
import random

import jax
import numpy as np
import pytest

from passport_zk_circuits_tpu.models.params import CircuitParams
from passport_zk_circuits_tpu.models import register_identity as ri
from passport_zk_circuits_tpu.ingest import synthetic
from passport_zk_circuits_tpu.ingest.builder import build_register_inputs
from passport_zk_circuits_tpu.ops import field as fr

rng = random.Random(4242)



pytestmark = pytest.mark.slow  # sweep/e2e tier (SURVEY §4 budget)

def _params(sig, dg_hash, ec_blocks=4, aa=0):
    return CircuitParams(signature_type=sig, dg_hash_type=dg_hash,
                         document_type=3, ec_block_number=ec_blocks,
                         ec_shift=600, dg1_shift=248, aa_signature_algo=aa,
                         dg15_shift=0, dg15_block_number=1, aa_shift=0)


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


def test_rsa_sha1_dg_sha1():
    # SIG_ALGO 3: RSA-2048 + SHA-1, dg hash SHA-1 (160-bit digests)
    _run_and_check(_params(3, 160))


def test_rsapss_sha256():
    # SIG_ALGO 11: RSA-2048 PSS salt 32
    _run_and_check(_params(11, 256))


def test_rsa4096():
    # SIG_ALGO 2: RSA-4096 + SHA-256
    _run_and_check(_params(2, 256))


def test_dg_hash_wider_than_160_flow_quirk():
    # dg hash SHA-1 with SHA-256 signature hash: the flow compares only the
    # first 160 bits of the EC digest (the reference quirk)
    _run_and_check(_params(1, 160))
