"""End-to-end RegisterIdentity witness generation vs pure-Python oracles.

The flagship config registerIdentity_1_256_3_4_600_248_1_1496_3_256 is the
one the reference pins in hardhat.config.ts:30.
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


pytestmark = pytest.mark.slow  # big-graph compile tier (SURVEY §4 budget)

rng = random.Random(31337)

FLAGSHIP = CircuitParams.from_name(
    "registerIdentity_1_256_3_4_600_248_1_1496_3_256")
NO_AA = CircuitParams(signature_type=1, dg_hash_type=256, document_type=3,
                      ec_block_number=4, ec_shift=600, dg1_shift=248,
                      aa_signature_algo=0, dg15_shift=0,
                      dg15_block_number=1, aa_shift=0)


def _run(p, B=2):
    signer = None
    pps = []
    for _ in range(B):
        pp = synthetic.make_synthetic_passport(p, rng, signer_key=signer)
        signer = pp["signer_key"]   # share the CA across the batch
        pps.append(pp)
    inp = build_register_inputs(p, pps)
    fwd = jax.jit(lambda i: ri.forward(p, i))
    out = fwd(inp)
    return pps, out


def _assert_outputs(p, pps, out):
    for name in ("passport_hash", "dg1_commitment", "pk_identity_hash",
                 "dg15_pubkey_hash"):
        got = fr.batch_from_limbs(out[name])
        want = [synthetic.expected_outputs(p, pp)[name] for pp in pps]
        assert got == want, f"{name}: {got} != {want}"
    assert np.asarray(out["flow_ok"]).all()
    assert np.asarray(out["sig_ok"]).all()
    assert np.asarray(out["smt_ok"]).all()


def test_flagship_rsa2048_sha256_aa():
    p = FLAGSHIP
    pps, out = _run(p)
    _assert_outputs(p, pps, out)


def test_no_aa_variant():
    p = NO_AA
    pps, out = _run(p)
    _assert_outputs(p, pps, out)
    assert fr.batch_from_limbs(out["dg15_pubkey_hash"]) == [0, 0]


def test_tampered_passport_fails():
    p = NO_AA
    pps, _ = _run(p, B=2)
    # flip a dg1 byte after signing: flow must fail, signature stays ok
    bad = dict(pps[0])
    bad["dg1"] = bytes([pps[0]["dg1"][0] ^ 1]) + pps[0]["dg1"][1:]
    inp = build_register_inputs(p, [bad, pps[1]])
    out = ri.forward(p, inp)
    flow = np.asarray(out["flow_ok"])
    assert not flow[0] and flow[1]
    # tamper the signature instead: sig check must fail
    bad2 = dict(pps[0])
    bad2["signature"] = pps[0]["signature"] ^ 1
    inp2 = build_register_inputs(p, [bad2, pps[1]])
    out2 = ri.forward(p, inp2)
    sig = np.asarray(out2["sig_ok"])
    assert not sig[0] and sig[1]
