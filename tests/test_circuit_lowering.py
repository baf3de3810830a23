"""R1CS lowering: gadget-level golden tests + RegisterIdentityLight e2e.

Mirrors the reference's constraint-check discipline: every witness is run
through the batched Az∘Bz−Cz sanitizer
(/root/reference/test/automatisationTest.js:51 checkConstraints), and
outputs are compared bit-exactly against the same host oracles that gate
the witness programs."""

import hashlib
import random

import numpy as np
import pytest

from passport_zk_circuits_tpu.circuit import Builder
from passport_zk_circuits_tpu.circuit import poseidon as cpose
from passport_zk_circuits_tpu.circuit import babyjubjub as cbjj
from passport_zk_circuits_tpu.circuit import sha256 as csha
from passport_zk_circuits_tpu.r1cs.system import check_batched
from passport_zk_circuits_tpu.utils import poseidon_ref as pref
from passport_zk_circuits_tpu.utils import babyjubjub_ref as bref


def _check(b):
    ok, _ = check_batched(b.cs, b.witness_matrix())
    assert np.asarray(ok).all()


def test_builder_gadgets():
    b = Builder(3)
    x = b.input([5, 0, 7])
    z = b.is_zero(x)
    assert z.ints() == [0, 1, 0]
    e = b.is_equal(x, b.const(7))
    assert e.ints() == [0, 0, 1]
    s = b.select(e, x + 1, x.scale(2))
    assert s.ints() == [10, 0, 8]
    bits = b.num2bits(x, 3)
    assert [bt.ints() for bt in bits] == [[1, 0, 1], [0, 0, 1], [1, 0, 1]]
    lt = b.lt_const(x, 6, 3)
    assert lt.ints() == [1, 1, 0]
    _check(b)


def test_builder_detects_bad_hint():
    b = Builder(1)
    x = b.input([4])
    y = b.hint([9], "bad")
    # pairing constraint is wrong on purpose: y must equal x * 2
    b.cs.constrain({1: 2}, {0: 1}, {2: 1})   # 2x = y -> 8 != 9
    ok, per = check_batched(b.cs, b.witness_matrix())
    assert not np.asarray(ok).all()


def test_poseidon_gadget_matches_oracle():
    b = Builder(2)
    xs = b.input([3, 11])
    ys = b.input([4, 12])
    h = cpose.poseidon(b, [xs, ys])
    assert h.ints() == [pref.poseidon([3, 4]), pref.poseidon([11, 12])]
    h1 = cpose.poseidon(b, [xs])
    assert h1.ints() == [pref.poseidon([3]), pref.poseidon([11])]
    _check(b)


@pytest.mark.slow
def test_babyjubjub_gadget_matches_oracle():
    rng = random.Random(1)
    sks = [rng.randrange(1, pref.P) for _ in range(2)]
    b = Builder(2)
    sk = b.input(sks)
    px, py = cbjj.base8_mul(b, sk)
    for i, s in enumerate(sks):
        x, y = bref.base8_mul(s % (1 << 254))
        assert px.ints()[i] == x and py.ints()[i] == y
    _check(b)


@pytest.mark.slow
def test_sha256_gadget_matches_hashlib():
    from passport_zk_circuits_tpu.ingest import native
    rng = random.Random(2)
    msgs = [bytes(rng.randrange(256) for _ in range(50)),
            bytes(rng.randrange(256) for _ in range(50))]
    words = native.pad_words32_batch(msgs, 512, 1)
    b = Builder(2)
    bits = []
    for w in range(words.shape[0]):
        for i in range(31, -1, -1):
            s = b.input([(int(v) >> i) & 1 for v in words[w]])
            b.enforce_bool(s)
            bits.append(s)
    digest = csha.sha_hash_chunks(b, bits, 256)
    for lane in range(2):
        want = hashlib.sha256(msgs[lane]).digest()
        got_bits = [bt.ints()[lane] for bt in digest]
        got = bytes(
            sum(got_bits[8 * i + k] << (7 - k) for k in range(8))
            for i in range(32))
        assert got == want
    _check(b)


@pytest.mark.slow
def test_sha512_sha384_sha1_gadgets_match_hashlib():
    from passport_zk_circuits_tpu.circuit import sha as csha_all
    from passport_zk_circuits_tpu.ingest import native
    rng = random.Random(5)
    for algo, hname in ((512, "sha512"), (384, "sha384"), (160, "sha1")):
        block = 1024 if algo in (384, 512) else 512
        nbytes = 100 if block == 1024 else 50       # one padded block
        msgs = [bytes(rng.randrange(256) for _ in range(nbytes)),
                bytes(rng.randrange(256) for _ in range(nbytes))]
        words = native.pad_words32_batch(msgs, block, 1)
        b = Builder(2)
        bits = []
        for w in range(words.shape[0]):
            for i in range(31, -1, -1):
                s = b.input([(int(v) >> i) & 1 for v in words[w]])
                b.enforce_bool(s)
                bits.append(s)
        digest = csha_all.sha_hash_chunks(b, bits, algo)
        assert len(digest) == {512: 512, 384: 384, 160: 160}[algo]
        for lane in range(2):
            want = hashlib.new(hname, msgs[lane]).digest()
            got_bits = [bt.ints()[lane] for bt in digest]
            got = bytes(
                sum(got_bits[8 * i + k] << (7 - k) for k in range(8))
                for i in range(len(want)))
            assert got == want, (algo, lane)
        _check(b)


def _lowering_config_roundtrip(name: str):
    from passport_zk_circuits_tpu.models.params import CircuitParams
    from passport_zk_circuits_tpu.ingest import synthetic
    from passport_zk_circuits_tpu.circuit import register_identity as cri
    from passport_zk_circuits_tpu.r1cs.system import check_batched as chk

    p = CircuitParams.from_name(name)
    rng = random.Random(hash(name) & 0xFFFF)
    pp = synthetic.make_synthetic_passport(p, rng)
    b, outs = cri.build(p, [pp])
    want = synthetic.expected_outputs(p, pp)
    for key in ("passport_hash", "dg1_commitment", "pk_identity_hash",
                "dg15_pubkey_hash"):
        assert outs[key].ints() == [want[key]], (name, key)
    assert outs["pubkey_hash"].ints() == [
        synthetic.rsa_pubkey_hash_oracle(pp["pubkey"])]
    assert outs["smt_ok"].ints() == [1]
    ok, _ = chk(b.cs, b.witness_matrix())
    assert np.asarray(ok).all()
    return b


@pytest.mark.slow
def test_register_identity_rsapss_lowering():
    """SIG_ALGO 11 (RSA-2048-PSS salt32) lowered: MGF1/EMSA-PSS as hard
    constraints (rsaPss.circom twin)."""
    _lowering_config_roundtrip("registerIdentity_11_256_3_4_600_248_0_0_1_0")


@pytest.mark.slow
def test_register_identity_sha1_lowering():
    """SIG_ALGO 3 (RSA-2048 + SHA-1, dg SHA-1): the 160-bit hash gadget
    wired through the full circuit."""
    _lowering_config_roundtrip("registerIdentity_3_160_3_4_600_248_0_0_1_0")


@pytest.mark.slow
def test_register_identity_sha384_pss_lowering():
    """SIG_ALGO 13 (RSA-2048-PSS + SHA-384, dg SHA-384): 64-bit-word SHA
    blocks (sha512Rounds.circom twin) through hashes, flow, and PSS."""
    # ec_shift 504: SHA-384 digests (48B) must fit the 111-byte signed
    # attributes (one 1024-bit block minus the 17-byte MD padding minimum)
    _lowering_config_roundtrip("registerIdentity_13_384_3_4_504_248_0_0_1_0")


@pytest.mark.slow
def test_register_light_lowering_e2e():
    from passport_zk_circuits_tpu.circuit import register_light
    rng = random.Random(42)
    B = 2
    dg1s = [bytes(rng.randrange(256) for _ in range(93)) for _ in range(B)]
    sks = [rng.randrange(1, pref.P) for _ in range(B)]
    b, outs = register_light.build(dg1s, sks)

    for i in range(B):
        dig = hashlib.sha256(dg1s[i]).digest()
        assert outs["dg1_hash"].ints()[i] == \
            int.from_bytes(dig, "big") & ((1 << 248) - 1)
        bits = [(byte >> (7 - k)) & 1 for byte in dg1s[i] for k in range(8)]
        chunks = [sum(bits[j * 186 + t] << t for t in range(186))
                  for j in range(4)]
        assert outs["dg1_commitment"].ints()[i] == \
            pref.poseidon(chunks + [pref.poseidon([sks[i]])])
        x, y = bref.base8_mul(sks[i] % (1 << 254))
        assert outs["pk_identity_hash"].ints()[i] == pref.poseidon([x, y])

    commit_ints = outs["dg1_commitment"].ints()
    pub = b.finalize([outs["dg1_commitment"], outs["pk_identity_hash"],
                      outs["dg1_hash"]])
    # NOTE: Sig objects hold pre-permutation wire indices — do not evaluate
    # them after finalize(); use the returned public values instead.
    assert len(pub) == 3 and b.n_public == 3
    # public wires sit at 1..3 with the right values
    assert [int(v) for v in b.vals[1]] == commit_ints == pub[0]
    _check(b)


@pytest.mark.slow
def test_bignum_gadgets_match_ints():
    from passport_zk_circuits_tpu.circuit import bignum as cbn
    rng = random.Random(3)
    B = 2
    b = Builder(B)
    xs = [rng.getrandbits(256) for _ in range(B)]
    ys = [rng.getrandbits(256) for _ in range(B)]
    ms = [rng.getrandbits(255) | (1 << 255) | 1 for _ in range(B)]
    x = cbn.from_input(b, xs, 4)
    y = cbn.from_input(b, ys, 4)
    m = cbn.from_input(b, ms, 4)
    z = cbn.mult(b, x, y)
    assert z.vals == [a * c for a, c in zip(xs, ys)]
    assert [sum(int(l.ints()[i]) << (64 * j)
                for j, l in enumerate(z.limbs)) for i in range(B)] == z.vals
    r = cbn.mod_mul(b, x, y, m, canonical=True)
    assert r.vals == [a * c % d for a, c, d in zip(xs, ys, ms)]
    c = cbn.lt(b, x, y)
    assert c.ints() == [int(a < d) for a, d in zip(xs, ys)]
    p = cbn.pow_mod(b, x, 65537, m)
    assert p.vals == [pow(a, 65537, d) for a, d in zip(xs, ms)]
    _check(b)


@pytest.mark.slow
def test_smt_gadget_matches_witness_ops():
    """Constraint SMT verdict == ops/smt.verify on a 1-leaf tree + a
    negative case (wrong root)."""
    from passport_zk_circuits_tpu.circuit import smt as csmt
    key = pref.poseidon([77])
    value = key
    root = pref.poseidon([key, value, 1])
    b = Builder(2)
    rt = b.input([root, (root + 1) % pref.P])
    k = b.input([key, key])
    v = b.input([value, value])
    branches = [b.input([0, 0]) for _ in range(80)]
    ok = csmt.verify(b, rt, k, v, branches)
    assert ok.ints() == [1, 0]
    _check(b)


@pytest.mark.slow
def test_register_identity_flagship_lowering():
    """The flagship config lowered to R1CS: outputs bit-exact vs the
    synthetic oracles, full constraint check green
    (automatisationTest.js:51 checkConstraints analog for the REAL
    circuit, not a demo system)."""
    from passport_zk_circuits_tpu.models.params import CircuitParams
    from passport_zk_circuits_tpu.ingest import synthetic
    from passport_zk_circuits_tpu.circuit import register_identity as cri

    p = CircuitParams.from_name(
        "registerIdentity_1_256_3_4_600_248_1_1496_3_256")
    rng = random.Random(7)
    pps = []
    signer = aa = None
    for _ in range(2):
        pp = synthetic.make_synthetic_passport(p, rng, signer_key=signer,
                                               aa_key=aa)
        signer, aa = pp["signer_key"], pp["aa_key"]
        pps.append(pp)
    b, outs = cri.build(p, pps)
    assert b.cs.n_constraints > 400_000
    want = [synthetic.expected_outputs(p, pp) for pp in pps]
    for key in ("passport_hash", "dg1_commitment", "pk_identity_hash",
                "dg15_pubkey_hash"):
        assert outs[key].ints() == [w[key] for w in want]
    assert outs["smt_ok"].ints() == [1, 1]
    ok, _ = check_batched(b.cs, b.witness_matrix())
    assert np.asarray(ok).all()


@pytest.mark.slow
def test_groth16_proves_real_gadget_circuit():
    """Groth16 setup/prove/verify on a lowered REAL gadget circuit (the
    BabyJubJub identity-key derivation + Poseidon hash of
    identity.circom:112-120) — the snarkjs pipeline analog running on a
    circuit from this framework's own lowering, not a demo system.
    The full RegisterIdentityLight/flagship proof runs in
    tools/prove_light_tpu.py (TPU-scale setup)."""
    from passport_zk_circuits_tpu.groth16 import protocol as g16
    rng = random.Random(9)
    sks = [rng.randrange(1, pref.P) for _ in range(2)]
    b = Builder(2)
    sk = b.input(sks)
    px, py = cbjj.base8_mul(b, sk)
    pk_hash = cpose.poseidon(b, [px, py])
    pub = b.finalize([pk_hash])
    for i, s in enumerate(sks):
        x, y = bref.base8_mul(s % (1 << 254))
        assert pub[0][i] == pref.poseidon([x, y])

    pk, vk = g16.setup(b.cs, n_public=1, seed=3)
    proofs = g16.prove(pk, b.cs, b.witness_matrix(), seed=4)
    for lane in range(2):
        assert g16.verify(vk, proofs[lane], [pub[0][lane]])
        assert not g16.verify(vk, proofs[lane],
                              [(pub[0][lane] + 1) % pref.P])


def test_query_identity_lowering():
    """QueryIdentity TD3 lowered to R1CS: disclosure outputs bit-exact,
    all enforced predicates (bounds, dates, identity state, citizenship)
    satisfied, and a corrupted witness rejected
    (queryIdentity.circom:37-229 as hard constraints)."""
    from passport_zk_circuits_tpu.circuit import query_identity as cqi
    rng2 = random.Random(555)

    def make_dg1():
        dg1 = bytearray(93)
        for i in range(93):
            dg1[i] = 0x41 + rng2.randrange(26)
        dg1[7:10] = b"UKR"
        dg1[62:68] = b"900115"
        dg1[70:76] = b"301231"
        dg1[69] = ord("F")
        return bytes(dg1)

    B = 2
    dg1s = [make_dg1() for _ in range(B)]
    sks = [rng2.randrange(1, pref.P) for _ in range(B)]
    pkp = [rng2.randrange(pref.P) for _ in range(B)]
    ts = [1716482295, 1716482299]
    idc = [1, 2]
    roots = []
    for dg1, sk, pk, t, c in zip(dg1s, sks, pkp, ts, idc):
        bits = [(byte >> (7 - i)) & 1 for byte in dg1 for i in range(8)]
        chunks = [sum(bits[j * 186 + k] << k for k in range(186))
                  for j in range(4)]
        commit = pref.poseidon(chunks + [pref.poseidon([sk])])
        x, y = bref.base8_mul(sk % (1 << 254))
        key = pref.poseidon([pk, pref.poseidon([x, y])])
        value = pref.poseidon([commit, c, t])
        roots.append(pref.poseidon([key, value, 1]))

    enc = lambda s: int.from_bytes(s, "big")  # noqa: E731
    inp = {
        "dg1": dg1s, "sk": sks, "pk_passport_hash": pkp,
        "event_id": [5, 6], "event_data": [7, 8], "root": roots,
        "siblings": [[0] * B for _ in range(80)],
        "selector": [(1 << 16) - 1] * B,
        "current_date": [enc(b"250817")] * B,
        "timestamp": ts, "timestamp_lower": [ts[0]] * B,
        "timestamp_upper": [ts[1] + 10] * B,
        "identity_counter": idc, "identity_counter_lower": [0] * B,
        "identity_counter_upper": [5] * B,
        "birth_date_lower": [enc(b"800101")] * B,
        "birth_date_upper": [enc(b"991231")] * B,
        "expiration_date_lower": [enc(b"250101")] * B,
        "expiration_date_upper": [enc(b"501231")] * B,
        "citizenship_mask": [0] * B,
    }
    b = Builder(B)
    outs = cqi.build(b, inp)
    for j in range(B):
        assert outs["nullifier"].ints()[j] == pref.poseidon(
            [sks[j], pref.poseidon([sks[j]]), [5, 6][j]])
        assert outs["citizenship"].ints()[j] == enc(b"UKR")
    w = b.witness_matrix()
    ok, _ = check_batched(b.cs, w)
    assert np.asarray(ok).all()
    # corrupt the identity-state root wire in lane 0 -> rejected
    import passport_zk_circuits_tpu.ops.field as frf
    root_wire = next(i for i, lbl in b.cs.labels.items() if lbl == "q_root")
    w_bad = w.copy()
    w_bad[root_wire, :, 0] = frf.to_limbs((roots[0] + 1) % pref.P)
    ok_bad, _ = check_batched(b.cs, w_bad)
    assert not np.asarray(ok_bad)[0] and np.asarray(ok_bad)[1]


def test_query_identity_td1_lowering():
    """QueryIdentity TD1 lowered to R1CS (queryIdentityTD1.circom:47-237):
    documentNumberHash / personalNumberHash / documentType outputs,
    190-bit commitment chunks, all predicates enforced."""
    from passport_zk_circuits_tpu.circuit import query_identity as cqi
    rng2 = random.Random(909)

    def make_dg1():
        dg1 = bytearray(95)
        for i in range(95):
            dg1[i] = 0x41 + rng2.randrange(26)
        dg1[5:7] = b"ID"
        dg1[7:10] = b"UKR"
        dg1[10:19] = b"D23145890"
        dg1[20:31] = b"99001558998"
        dg1[35:41] = b"900115"
        dg1[42] = ord("M")
        dg1[43:49] = b"301231"
        dg1[50:53] = b"UKR"
        return bytes(dg1)

    B = 2
    dg1s = [make_dg1() for _ in range(B)]
    sks = [rng2.randrange(1, pref.P) for _ in range(B)]
    pkp = [rng2.randrange(pref.P) for _ in range(B)]
    ts = [1716482295, 1716482299]
    idc = [1, 2]
    roots = []
    for dg1, sk, pk, t, c in zip(dg1s, sks, pkp, ts, idc):
        bits = [(byte >> (7 - i)) & 1 for byte in dg1 for i in range(8)]
        chunks = [sum(bits[j * 190 + k] << k for k in range(190))
                  for j in range(4)]
        commit = pref.poseidon(chunks + [pref.poseidon([sk])])
        x, y = bref.base8_mul(sk % (1 << 254))
        key = pref.poseidon([pk, pref.poseidon([x, y])])
        value = pref.poseidon([commit, c, t])
        roots.append(pref.poseidon([key, value, 1]))

    enc = lambda s: int.from_bytes(s, "big")  # noqa: E731
    inp = {
        "dg1": dg1s, "sk": sks, "pk_passport_hash": pkp,
        "event_id": [5, 6], "event_data": [7, 8], "root": roots,
        "siblings": [[0] * B for _ in range(80)],
        "selector": [(1 << 18) - 1] * B,
        "current_date": [enc(b"250817")] * B,
        "timestamp": ts, "timestamp_lower": [ts[0]] * B,
        "timestamp_upper": [ts[1] + 10] * B,
        "identity_counter": idc, "identity_counter_lower": [0] * B,
        "identity_counter_upper": [5] * B,
        "birth_date_lower": [enc(b"800101")] * B,
        "birth_date_upper": [enc(b"991231")] * B,
        "expiration_date_lower": [enc(b"250101")] * B,
        "expiration_date_upper": [enc(b"501231")] * B,
        "citizenship_mask": [0] * B,
    }
    b = Builder(B)
    outs = cqi.build(b, inp, document_type=1)
    for j in range(B):
        assert outs["document_number_hash"].ints()[j] == pref.poseidon(
            [enc(b"D23145890")])
        assert outs["personal_number_hash"].ints()[j] == pref.poseidon(
            [enc(b"99001558998")])
        assert outs["document_type"].ints()[j] == enc(b"ID")
        assert outs["citizenship"].ints()[j] == enc(b"UKR")
    ok, _ = check_batched(b.cs, b.witness_matrix())
    assert np.asarray(ok).all()


@pytest.mark.slow
def test_light_circuit_snarkjs_artifacts_roundtrip():
    """The R1CS-lowered RegisterIdentityLight exports to the snarkjs
    binfile formats (.r1cs / .wtns) and round-trips through our importers
    with the witness still satisfying the re-imported system — connecting
    the real circuits to the toolchain artifacts the reference's shell
    pipeline produces (circom --r1cs / gen-witness.sh:24)."""
    from passport_zk_circuits_tpu.circuit import register_light
    from passport_zk_circuits_tpu.groth16.export import (
        export_r1cs, import_r1cs, export_wtns, import_wtns)
    rng = random.Random(4)
    dg1s = [bytes(rng.randrange(256) for _ in range(93))]
    sks = [rng.randrange(1, pref.P)]
    b, outs = register_light.build(dg1s, sks)
    b.finalize([outs["dg1_commitment"], outs["pk_identity_hash"],
                outs["dg1_hash"]])

    blob = export_r1cs(b.cs, n_public=3, n_outputs=3)
    cs2 = import_r1cs(blob)
    assert cs2.n_vars == b.cs.n_vars
    assert cs2.n_constraints == b.cs.n_constraints

    wvals = b.witness_ints(0)
    wblob = export_wtns(wvals)
    assert import_wtns(wblob) == [v % pref.P for v in wvals]

    ok, _ = check_batched(cs2, b.witness_matrix())
    assert np.asarray(ok).all()
