"""ECDSA + Weierstrass EC vs pure-Python oracles."""
import hashlib
import random

import jax
import numpy as np
import pytest

from passport_zk_circuits_tpu.ops import bignum as bn
from passport_zk_circuits_tpu.ops import curves
from passport_zk_circuits_tpu.ops import weierstrass as wst
from passport_zk_circuits_tpu.ops import ecdsa
from passport_zk_circuits_tpu.ops import bitops
from passport_zk_circuits_tpu.utils import ecdsa_ref as ref


pytestmark = pytest.mark.slow  # big-graph compile tier (SURVEY §4 budget)

rng = random.Random(64)


def test_curves_validate():
    assert curves.validate_all()


@pytest.mark.parametrize("name", ["p256", "secp192r1"])
def test_scalar_mul_matches_oracle(name):
    c = wst.ctx(name)
    cv = c.curve
    B = 2
    scalars = [rng.randrange(1, cv.n) for _ in range(B)]
    pts = [ref.scalar_mul(cv, rng.randrange(1, cv.n), (cv.gx, cv.gy))
           for _ in range(B)]
    qx = bn.ints_to_limbs_batch([p[0] for p in pts], c.k)
    qy = bn.ints_to_limbs_batch([p[1] for p in pts], c.k)
    s = bn.ints_to_limbs_batch(scalars, c.kn)
    jac = jax.jit(lambda s, x, y: wst.scalar_mul_window(c, s, x, y))(s, qx, qy)
    ax, ay = wst.to_affine(c, jac)
    got = list(zip(bn.limbs_to_ints_batch(ax), bn.limbs_to_ints_batch(ay)))
    want = [ref.scalar_mul(cv, k, p) for k, p in zip(scalars, pts)]
    assert got == want


@pytest.mark.parametrize("name", ["p256"])
def test_fixed_base_matches_oracle(name):
    c = wst.ctx(name)
    cv = c.curve
    scalars = [1, 2, rng.randrange(1, cv.n)]
    s = bn.ints_to_limbs_batch(scalars, c.kn)
    jac = jax.jit(lambda s: wst.fixed_base_mul(c, s))(s)
    ax, ay = wst.to_affine(c, jac)
    got = list(zip(bn.limbs_to_ints_batch(ax), bn.limbs_to_ints_batch(ay)))
    want = [ref.scalar_mul(cv, k, (cv.gx, cv.gy)) for k in scalars]
    assert got == want


@pytest.mark.parametrize("name,hash_len", [("p256", 256),
                                           ("secp192r1", 160)])
def test_ecdsa_verify(name, hash_len):
    c = wst.ctx(name)
    cv = c.curve
    B = 2
    hname = {160: "sha1", 224: "sha224", 256: "sha256"}[hash_len]
    keys = [ref.keygen(cv, rng) for _ in range(B)]
    msgs = [bytes(rng.randrange(256) for _ in range(30)) for _ in range(B)]
    digs = [hashlib.new(hname, m).digest() for m in msgs]
    sigs = [ref.sign(cv, d, dg, rng) for (d, _), dg in zip(keys, digs)]
    for (d, Q), dg, (r, s) in zip(keys, digs, sigs):
        assert ref.verify(cv, Q, dg, r, s)

    pk_x = bn.ints_to_limbs_batch([Q[0] for _, Q in keys], c.k)
    pk_y = bn.ints_to_limbs_batch([Q[1] for _, Q in keys], c.k)
    sig_l = np.concatenate([
        bn.ints_to_limbs_batch([r for r, _ in sigs], c.kn),
        bn.ints_to_limbs_batch([s for _, s in sigs], c.kn)], axis=0)
    bits = np.stack(
        [[(int.from_bytes(dg, "big") >> (hash_len - 1 - i)) & 1
          for dg in digs] for i in range(hash_len)]).astype(np.uint32)

    ok = jax.jit(lambda x, y, s, h: ecdsa.verify(name, x, y, s, h))(
        pk_x, pk_y, sig_l, bits)
    assert np.asarray(ok).all()

    # tamper r -> fail
    bad = sig_l.copy()
    bad[0, 0] ^= 1
    ok2 = np.asarray(ecdsa.verify(name, pk_x, pk_y, bad, bits))
    assert not ok2[0] and ok2[1]
    # r = 0 -> fail
    zero = sig_l.copy()
    zero[:c.kn, 0] = 0
    ok3 = np.asarray(ecdsa.verify(name, pk_x, pk_y, zero, bits))
    assert not ok3[0]
