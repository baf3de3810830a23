"""Groth16 end-to-end: setup -> batched prove (device NTT/MSM) -> pairing verify.

Capability twin of the reference's snarkjs pipeline
(circuits/scripts/export-keys.sh / prove.sh / verify.sh). The pairing itself
is self-checked (bilinearity / non-degeneracy) rather than trusted."""
import random
import pytest

import numpy as np

from passport_zk_circuits_tpu.groth16 import pairing as pr
from passport_zk_circuits_tpu import groth16 as g16
from passport_zk_circuits_tpu.r1cs import system as r1
from passport_zk_circuits_tpu.ops import field as fr


pytestmark = pytest.mark.slow  # big-graph compile tier (SURVEY §4 budget)

rng = random.Random(1234)


def test_pairing_bilinearity():
    e = pr.pairing(pr.G2, pr.G1)
    assert e != pr.FQ12.one()                       # non-degenerate
    assert e ** pr.R == pr.FQ12.one()               # order r
    e23 = pr.pairing(pr.ec_mul(pr.G2, 3), pr.ec_mul(pr.G1, 2))
    assert e ** 6 == e23                            # bilinear


def _demo_circuit():
    """Public z, w4; private x, y, bits: z = x*y, w4 = (x+y)^2, plus an
    8-bit decomposition of x to give the QAP some width."""
    cs = r1.ConstraintSystem()
    z = cs.new_var("z")          # public wire 1
    w4 = cs.new_var("w4")        # public wire 2
    x = cs.new_var("x")
    y = cs.new_var("y")
    cs.constrain({x: 1}, {y: 1}, {z: 1})
    s = cs.new_var("s")          # s = x + y (linear; bound via (x+y)*1 = s)
    cs.constrain({x: 1, y: 1}, {0: 1}, {s: 1})
    cs.constrain({s: 1}, {s: 1}, {w4: 1})
    cs.bits(x, 8)
    return cs, (z, w4, x, y, s)


def _witness_rows(cs, xs, ys):
    zs = [x * y % fr.P for x, y in zip(xs, ys)]
    w4s = [(x + y) ** 2 % fr.P for x, y in zip(xs, ys)]
    ss = [(x + y) % fr.P for x, y in zip(xs, ys)]
    rows = [1, zs, w4s, xs, ys, ss]
    for i in range(8):
        rows.append([(x >> i) & 1 for x in xs])
    return r1.witness_matrix(rows, len(xs)), zs, w4s


def test_groth16_end_to_end():
    cs, _ = _demo_circuit()
    pk, vk = g16.setup(cs, n_public=2, seed=7)

    B = 2
    xs = [rng.randrange(1 << 8) for _ in range(B)]
    ys = [rng.randrange(fr.P) for _ in range(B)]
    w, zs, w4s = _witness_rows(cs, xs, ys)

    # sanity: witness satisfies the system
    ok, _ = r1.check_batched(cs, w)
    assert np.asarray(ok).all()

    proofs = g16.prove(pk, cs, w, seed=3)
    assert len(proofs) == B
    assert g16.verify(vk, proofs[0], [zs[0], w4s[0]])
    assert g16.verify(vk, proofs[1], [zs[1], w4s[1]])

    # wrong public input fails
    assert not g16.verify(vk, proofs[0], [(zs[0] + 1) % fr.P, w4s[0]])
    # proofs are not interchangeable across statements
    if (zs[0], w4s[0]) != (zs[1], w4s[1]):
        assert not g16.verify(vk, proofs[1], [zs[0], w4s[0]])
    # tampered proof point fails (still on-curve: use A' = A + G1)
    bad_a = pr.ec_add((pr.FQ1([proofs[0].a[0]]), pr.FQ1([proofs[0].a[1]])),
                      pr.G1)
    tampered = g16.Proof(a=(bad_a[0].coeffs[0], bad_a[1].coeffs[0]),
                         b=proofs[0].b, c=proofs[0].c)
    assert not g16.verify(vk, tampered, [zs[0], w4s[0]])


def test_groth16_unsatisfied_witness_rejected():
    """A witness violating a constraint yields a proof that fails to verify
    (the QAP division leaves a nonzero remainder)."""
    cs, _ = _demo_circuit()
    pk, vk = g16.setup(cs, n_public=2, seed=11)
    xs, ys = [5], [9]
    w, zs, w4s = _witness_rows(cs, xs, ys)
    w[1] = fr.batch_to_limbs([(zs[0] + 1) % fr.P])   # claim wrong product
    proofs = g16.prove(pk, cs, w, seed=4)
    assert not g16.verify(vk, proofs[0], [(zs[0] + 1) % fr.P, w4s[0]])
