"""ECDSA R1CS gadgets (circuit/weierstrass, circuit/ecdsa) vs the host
oracle utils/ecdsa_ref — constraint-satisfaction + bit-exact outputs, and
negative paths (bad signature unbuildable; tampered witness rejected by
the batched checker).

Reference twins: ec/curve.circom EllipticCurveAdd/Double/ScalarMult +
signatures/ecdsa.circom verifyECDSABits.
"""
import hashlib
import random

import numpy as np
import pytest

from passport_zk_circuits_tpu.circuit import bignum as cbn
from passport_zk_circuits_tpu.circuit import ecdsa as ce
from passport_zk_circuits_tpu.circuit import weierstrass as cw
from passport_zk_circuits_tpu.circuit.builder import Builder
from passport_zk_circuits_tpu.ops.curves import CURVES
from passport_zk_circuits_tpu.r1cs import system as r1
from passport_zk_circuits_tpu.utils import ecdsa_ref as ecref

rng = random.Random(4242)


def _rand_point(cv):
    return ecref.scalar_mul(cv, rng.randrange(1, cv.n), (cv.gx, cv.gy))


def _input_point(b, cv, pts):
    return cw.input_point(b, [p[0] for p in pts], [p[1] for p in pts], cv)


@pytest.mark.parametrize("curve", ["p256", "brainpoolP256r1"])
def test_ec_add_double_vs_oracle(curve):
    cv = CURVES[curve]
    B = 2
    p1s = [_rand_point(cv) for _ in range(B)]
    p2s = [_rand_point(cv) for _ in range(B)]
    b = Builder(B)
    P1 = _input_point(b, cv, p1s)
    P2 = _input_point(b, cv, p2s)
    S = cw.ec_add(b, P1, P2, cv)
    D = cw.ec_double(b, P1, cv)
    for j in range(B):
        assert (S.x.vals[j], S.y.vals[j]) == ecref._add(cv, p1s[j], p2s[j])
        assert (D.x.vals[j], D.y.vals[j]) == ecref._add(cv, p1s[j], p1s[j])
    ok, _ = r1.check_batched(b.cs, b.witness_matrix())
    assert np.asarray(ok).all()


@pytest.mark.slow
def test_scalar_mul_and_gen_mul_vs_oracle():
    cv = CURVES["p256"]
    B = 2
    ks = [rng.randrange(1, cv.n) for _ in range(B)]
    qs = [_rand_point(cv) for _ in range(B)]
    b = Builder(B)
    Q = _input_point(b, cv, qs)
    kbig = cbn.from_input(b, ks, cw.k64(cv))
    bits = ce.scalar_bits(b, kbig)
    got = cw.remove_dummy(b, cw.scalar_mul(b, bits, Q, cv), cv)
    geng = cw.remove_dummy(b, cw.gen_mul(b, bits, cv), cv)
    for j in range(B):
        assert ((got.x.vals[j], got.y.vals[j])
                == ecref.scalar_mul(cv, ks[j], qs[j]))
        assert ((geng.x.vals[j], geng.y.vals[j])
                == ecref.scalar_mul(cv, ks[j], (cv.gx, cv.gy)))
    ok, _ = r1.check_batched(b.cs, b.witness_matrix())
    assert np.asarray(ok).all()


def _sign_fixture(curve, B):
    cv = CURVES[curve]
    msgs = [bytes([rng.randrange(256) for _ in range(32)])
            for _ in range(B)]
    digests = [hashlib.sha256(m).digest() for m in msgs]
    keys = [ecref.keygen(cv, rng) for _ in range(B)]
    sigs = [ecref.sign(cv, d, dg, rng) for (d, _), dg in zip(keys, digests)]
    return cv, digests, [q for _, q in keys], sigs


def _build_verify(curve, digests, pubs, sigs):
    cv = CURVES[curve]
    B = len(digests)
    b = Builder(B)
    nl = cw.k64(cv)
    pk = _input_point(b, cv, pubs)
    r = cbn.from_input(b, [s[0] for s in sigs], nl)
    s = cbn.from_input(b, [s[1] for s in sigs], nl)
    dvals = [int.from_bytes(d, "big") for d in digests]
    dbits = []
    for i in range(256):
        dbits.append(b.input([(v >> (255 - i)) & 1 for v in dvals], "hb"))
        b.enforce_bool(dbits[-1])
    ce.verify(b, curve, pk, r, s, dbits)
    return b


@pytest.mark.slow
def test_ecdsa_verify_circuit():
    cv, digests, pubs, sigs = _sign_fixture("p256", 2)
    b = _build_verify("p256", digests, pubs, sigs)
    ok, _ = r1.check_batched(b.cs, b.witness_matrix())
    assert np.asarray(ok).all()
    # constraint-scale parity: the reference's w=4 windowed ECDSA is ~1.5M
    assert b.cs.n_constraints < 2_000_000

    # bad signature: the build itself must fail (hint/check mismatch)
    r_bad, s_bad = sigs[0]
    bad = [((r_bad + 1) % cv.n, s_bad)] + sigs[1:]
    with pytest.raises(AssertionError):
        _build_verify("p256", digests, pubs, bad)


@pytest.mark.slow
def test_register_identity_ecdsa_lowering():
    """SIG_ALGO 20 (ECDSA p256 + SHA-256) RegisterIdentity lowered to
    R1CS: outputs bit-exact vs the synthetic oracles, constraint check
    green — the ECDSA counterpart of the flagship lowering test
    (VERDICT r4 #1; ref signatureVerification.circom:177-261 dispatch)."""
    from passport_zk_circuits_tpu.models.params import CircuitParams
    from passport_zk_circuits_tpu.ingest import synthetic
    from passport_zk_circuits_tpu.circuit import register_identity as cri

    p = CircuitParams(signature_type=20, dg_hash_type=256, document_type=3,
                      ec_block_number=4, ec_shift=600, dg1_shift=248,
                      aa_signature_algo=0, dg15_shift=0, dg15_block_number=1,
                      aa_shift=0)
    pp = synthetic.make_synthetic_passport(p, rng)
    b, outs = cri.build(p, [pp])
    want = synthetic.expected_outputs(p, pp)
    want["pubkey_hash"] = synthetic.ecdsa_pubkey_hash_oracle(
        pp["pubkey"][0], pp["pubkey"][1], p.sig.key_bits // 2)
    for key in ("passport_hash", "dg1_commitment", "pk_identity_hash",
                "pubkey_hash"):
        assert outs[key].ints() == [want[key]], key
    assert outs["smt_ok"].ints() == [1]
    ok, _ = r1.check_batched(b.cs, b.witness_matrix())
    assert np.asarray(ok).all()


@pytest.mark.slow
def test_ecdsa_tampered_witness_rejected():
    """Flip one non-input wire post-build: the R1CS must catch it (the
    x(R) equality or an EC identity breaks)."""
    _, digests, pubs, sigs = _sign_fixture("p256", 1)
    b = _build_verify("p256", digests, pubs, sigs)
    w = b.witness_matrix()
    # tamper the last hinted wire (part of x(R) canonicalization chain)
    w[-1, 0, 0] ^= 1
    ok, _ = r1.check_batched(b.cs, w)
    assert not np.asarray(ok).all()
