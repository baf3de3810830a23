"""snarkjs-interop artifact export: verification_key.json / proof.json /
verifier.sol / .wtns / .r1cs (groth16/export.py).

Artifact parity with the reference toolchain outputs
(circuits/scripts/export-keys.sh, gen-witness.sh, compile-circuit.sh)."""
import json
import random

import numpy as np

from passport_zk_circuits_tpu import groth16 as g16
from passport_zk_circuits_tpu.groth16 import export as ex
from passport_zk_circuits_tpu.r1cs import system as r1
from passport_zk_circuits_tpu.ops import field as fr

from test_groth16 import _demo_circuit, _witness_rows

rng = random.Random(42)


def _setup():
    cs, _ = _demo_circuit()
    pk, vk = g16.setup(cs, n_public=2, seed=7)
    return cs, pk, vk


def test_vk_json_shape():
    _, _, vk = _setup()
    d = json.loads(ex.vk_to_json(vk))
    assert d["protocol"] == "groth16" and d["curve"] == "bn128"
    assert d["nPublic"] == 2
    assert len(d["IC"]) == 3
    # alpha1 is a valid affine G1 point: y^2 = x^3 + 3 over Fq
    x, y = int(d["vk_alpha_1"][0]), int(d["vk_alpha_1"][1])
    q = 21888242871839275222246405745257275088696311157297823662689037894645226208583
    assert (y * y - x * x * x - 3) % q == 0


def test_proof_json_roundtrip_verifies():
    cs, pk, vk = _setup()
    xs = [rng.randrange(1 << 8)]
    ys = [rng.randrange(fr.P)]
    w, zs, w4s = _witness_rows(cs, xs, ys)
    proofs = g16.prove(pk, cs, w, seed=3)
    back = ex.proof_from_json(ex.proof_to_json(proofs[0]))
    assert g16.verify(vk, back, [zs[0], w4s[0]])
    pubs = json.loads(ex.public_to_json([zs[0], w4s[0]]))
    assert [int(p) for p in pubs] == [zs[0], w4s[0]]


def test_vk_alphabeta_12_matches_pairing():
    # snarkjs emits the precomputed e(alpha1, beta2) in the tower (2x3x2)
    # layout; reconstruct the flat FQ12 from the JSON and compare.
    from passport_zk_circuits_tpu.groth16 import pairing as pr
    _, _, vk = _setup()
    d = json.loads(ex.vk_to_json(vk))
    tower = d["vk_alphabeta_12"]
    assert len(tower) == 2 and all(len(r) == 3 for r in tower)
    flat = [0] * 12
    for i in range(2):
        for j in range(3):
            a0, a1 = int(tower[i][j][0]), int(tower[i][j][1])
            e = i + 2 * j
            flat[e + 6] = a1
            flat[e] = (a0 - 9 * a1) % pr.Q
    expect = pr.pairing(vk.beta2, vk.alpha1)
    assert pr.FQ12(flat) == expect
    assert expect != pr.FQ12.one()


def test_solidity_calldata_preswaps_b():
    cs, pk, vk = _setup()
    xs = [rng.randrange(1 << 8)]
    ys = [rng.randrange(fr.P)]
    w, zs, w4s = _witness_rows(cs, xs, ys)
    proof = g16.prove(pk, cs, w, seed=3)[0]
    call = ex.solidity_calldata(proof, [zs[0], w4s[0]])
    parts = json.loads("[" + call + "]")
    pa, pb, pc, pubs = parts
    assert [int(x, 16) for x in pa] == [proof.a[0], proof.a[1]]
    (bx, by) = ex._fq2_pair(proof.b)
    # G2 coords pre-swapped (c1, c0) per snarkjs generatecall
    assert [int(x, 16) for x in pb[0]] == [bx[1], bx[0]]
    assert [int(x, 16) for x in pb[1]] == [by[1], by[0]]
    assert [int(x, 16) for x in pc] == [proof.c[0], proof.c[1]]
    assert [int(x, 16) for x in pubs] == [zs[0], w4s[0]]


def test_solidity_verifier_contents():
    _, _, vk = _setup()
    sol = ex.solidity_verifier(vk, name="RegisterVerifier")
    assert "contract RegisterVerifier" in sol
    assert "pragma solidity" in sol
    # all IC points inlined, input arity matches nPublic
    for i in range(len(vk.ic)):
        assert f"IC{i}x" in sol and f"IC{i}y" in sol
    assert f"uint256[{vk.n_public}] calldata input" in sol
    # pairing precompile call present; VK constants are embedded verbatim
    assert "staticcall(gas(), 8" in sol
    assert str(vk.alpha1[0]) in sol
    assert str(vk.gamma2[0].coeffs[1]) in sol
    # snarkjs checkField parity: public signals >= r are rejected, never
    # reduced mod r (no public-signal aliasing)
    assert "require(s < r" in sol
    assert "s % r" not in sol
    # pB arrives pre-swapped (c1,c0) and is copied verbatim
    assert "p[2] = b[0][0]; p[3] = b[0][1];" in sol
    # braces from the template survived formatting (balanced contract body)
    assert sol.count("{") == sol.count("}")


def test_wtns_roundtrip():
    vals = [1] + [rng.randrange(fr.P) for _ in range(17)]
    blob = ex.export_wtns(vals)
    assert blob[:4] == b"wtns"
    assert ex.import_wtns(blob) == vals


def test_r1cs_roundtrip_and_check():
    cs, _ = _demo_circuit()
    blob = ex.export_r1cs(cs, n_public=2)
    assert blob[:4] == b"r1cs"
    cs2 = ex.import_r1cs(blob)
    assert cs2.n_vars == cs.n_vars
    assert cs2.n_constraints == cs.n_constraints
    assert sorted(cs2.a) == sorted(cs.a)
    assert sorted(cs2.b) == sorted(cs.b)
    assert sorted(cs2.c) == sorted(cs.c)
    # a valid witness still satisfies the reimported system
    xs = [rng.randrange(1 << 8)]
    ys = [rng.randrange(fr.P)]
    w, _, _ = _witness_rows(cs, xs, ys)
    ok, _ = r1.check_batched(cs2, w)
    assert np.asarray(ok).all()
