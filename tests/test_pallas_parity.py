"""Pallas-kernel parity vs the XLA path / host oracles (interpret mode).

Round 3's fused kernels passed nothing but ad-hoc checks and broke on the
real chip; this file is the CI gate VERDICT asked for: every fused kernel
runs under PZK_PALLAS=1 in CPU interpret mode and must be bit-equal to
the XLA implementations (which are themselves oracle-tested). The REAL
hardware gate is tools/verify_pallas_tpu.py, which runs the same checks
through Mosaic on the chip and writes the `.pallas_verified` marker.

Interpret mode is slow — batches here are tiny on purpose.
"""

import os
import random

import numpy as np
import pytest

os.environ["PZK_PALLAS"] = "1"

import jax  # noqa: E402

from passport_zk_circuits_tpu.ops import field as fr  # noqa: E402
from passport_zk_circuits_tpu.ops import pallas_field as pf  # noqa: E402
from passport_zk_circuits_tpu.ops import pallas_poseidon as ppk  # noqa: E402
from passport_zk_circuits_tpu.utils import poseidon_ref as pref  # noqa: E402

rng = random.Random(11)
B = 4


def _ints(x):
    return fr.batch_from_limbs(np.asarray(jax.block_until_ready(x)))


def test_use_pallas_env_override():
    assert pf.use_pallas()          # PZK_PALLAS=1 forces on
    os.environ["PZK_PALLAS"] = "0"
    try:
        assert not pf.use_pallas()
    finally:
        os.environ["PZK_PALLAS"] = "1"


def test_pallas_mul_matches_xla():
    xs = [0, 1, fr.P - 1, rng.randrange(fr.P)]
    ys = [fr.P - 1, 1, fr.P - 1, rng.randrange(fr.P)]
    a, b = fr.batch_to_limbs(xs), fr.batch_to_limbs(ys)
    got = _ints(pf.mul(a, b))
    want = _ints(fr.mul(a, b))
    assert got == want == [(x * y) % fr.P for x, y in zip(xs, ys)]


def test_pallas_mul_chain():
    xs = [rng.randrange(fr.P) for _ in range(B)]
    ys = [rng.randrange(fr.P) for _ in range(B)]
    got = _ints(pf.mul_chain(fr.batch_to_limbs(xs), fr.batch_to_limbs(ys),
                             5))
    want = [x * pow(y, 5, fr.P) % fr.P for x, y in zip(xs, ys)]
    assert got == want


def test_pallas_add_sub_building_blocks():
    xs = [0, fr.P - 1, rng.randrange(fr.P), rng.randrange(fr.P)]
    ys = [fr.P - 1, fr.P - 1, rng.randrange(fr.P), 0]
    a, b = fr.batch_to_limbs(xs), fr.batch_to_limbs(ys)
    assert _ints(jax.jit(pf.addmod)(a, b)) == \
        [(x + y) % fr.P for x, y in zip(xs, ys)]
    assert _ints(jax.jit(pf.submod)(a, b)) == \
        [(x - y) % fr.P for x, y in zip(xs, ys)]


@pytest.mark.slow
@pytest.mark.parametrize("n_in", [1, 2, 3, 4, 5])
def test_pallas_poseidon_matches_oracle(n_in):
    cols = [[rng.randrange(fr.P) for _ in range(B)] for _ in range(n_in)]
    got = _ints(ppk.poseidon([fr.batch_to_limbs(c) for c in cols]))
    assert got == [pref.poseidon([c[i] for c in cols]) for i in range(B)]


@pytest.mark.slow
def test_pallas_smt_climb_matches_xla():
    from passport_zk_circuits_tpu.ops import smt
    keys = [rng.randrange(fr.P) for _ in range(B)]
    vals = [rng.randrange(fr.P) for _ in range(B)]
    roots = [pref.poseidon([k, v, 1]) for k, v in zip(keys, vals)]
    sibs = np.zeros((16, 80, B), np.uint32)
    rl = fr.batch_to_limbs(roots)
    kl = fr.batch_to_limbs(keys)
    vl = fr.batch_to_limbs(vals)
    ok, computed = smt.verify(rl, kl, vl, sibs)          # pallas branch
    assert np.asarray(ok).all()
    os.environ["PZK_PALLAS"] = "0"
    try:
        ok_x, computed_x = smt.verify(rl, kl, vl, sibs)  # XLA branch
    finally:
        os.environ["PZK_PALLAS"] = "1"
    assert np.asarray(ok_x).all()
    np.testing.assert_array_equal(np.asarray(computed),
                                  np.asarray(computed_x))


@pytest.mark.slow
def test_pallas_poseidon_routing_through_ops():
    """ops/poseidon routes to the fused kernel when use_pallas() — outputs
    must stay bit-identical either way."""
    from passport_zk_circuits_tpu.ops import poseidon as pos
    cols = [[rng.randrange(fr.P) for _ in range(B)] for _ in range(2)]
    inp = [fr.batch_to_limbs(c) for c in cols]
    got = _ints(pos.poseidon(inp))
    os.environ["PZK_PALLAS"] = "0"
    try:
        want = _ints(pos.poseidon(inp))
    finally:
        os.environ["PZK_PALLAS"] = "1"
    assert got == want


@pytest.mark.slow
def test_pallas_babyjubjub_ladder_matches_oracle():
    from passport_zk_circuits_tpu.ops import babyjubjub as bjj
    from passport_zk_circuits_tpu.utils import babyjubjub_ref as bref
    sks = [0, 1, 7, rng.randrange(fr.P)]
    x, y = bjj.base8_mul(fr.batch_to_limbs(sks), (len(sks),))
    gx, gy = _ints(x), _ints(y)
    for i, s in enumerate(sks):
        wx, wy = bref.base8_mul(s % (1 << 254))
        assert (gx[i], gy[i]) == (wx, wy)
    os.environ["PZK_PALLAS"] = "0"
    try:
        x2, y2 = bjj.base8_mul(fr.batch_to_limbs(sks), (len(sks),))
    finally:
        os.environ["PZK_PALLAS"] = "1"
    assert _ints(x2) == gx and _ints(y2) == gy


def test_pallas_rsa_pow_matches_ints():
    from passport_zk_circuits_tpu.ops import pallas_rsa
    from passport_zk_circuits_tpu.ops import bignum as bn
    k = 16                        # 256-bit keeps interpret mode fast
    for exp in (3, 65537, 37187):
        mods = [rng.getrandbits(255) | (1 << 255) | 1 for _ in range(2)]
        sigs = [rng.randrange(m) for m in mods]
        got = bn.limbs_to_ints_batch(np.asarray(jax.block_until_ready(
            pallas_rsa.pow_mod(bn.ints_to_limbs_batch(sigs, k),
                               bn.ints_to_limbs_batch(mods, k),
                               bn.barrett_mu_batch(mods, k), exp))))
        assert got == [pow(s, exp, m) for s, m in zip(sigs, mods)], exp


@pytest.mark.slow
def test_pallas_sha256_single_block_matches_hashlib():
    # interpret mode executes the unrolled kernel op-by-op — keep it to
    # ONE block and ONE lane; the on-chip gate covers real sizes
    import hashlib
    from passport_zk_circuits_tpu.ops import sha2
    m = b"abc"
    words = np.stack([sha2.bytes_to_words32(sha2.pad_message(m, 512))],
                     axis=-1)
    dw = np.asarray(jax.block_until_ready(sha2.sha_hash_chunks(words, 256)))
    got = b"".join(int(dw[w, 0]).to_bytes(4, "big") for w in range(8))
    assert got == hashlib.sha256(m).digest()
