"""Golden tests: Fr/bignum limb arithmetic vs Python ints (the oracle)."""
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from passport_zk_circuits_tpu.ops import bignum as bn
from passport_zk_circuits_tpu.ops import field as fr

rng = random.Random(1234)
B = 8  # batch


def rand_fr(n=B):
    return [rng.randrange(fr.P) for _ in range(n)]


def test_limb_roundtrip():
    xs = rand_fr()
    a = fr.batch_to_limbs(xs)
    assert fr.batch_from_limbs(a) == xs


def test_add_sub():
    xs, ys = rand_fr(), rand_fr()
    a, b = fr.batch_to_limbs(xs), fr.batch_to_limbs(ys)
    got = fr.batch_from_limbs(jax.jit(fr.add)(a, b))
    assert got == [(x + y) % fr.P for x, y in zip(xs, ys)]
    got = fr.batch_from_limbs(jax.jit(fr.sub)(a, b))
    assert got == [(x - y) % fr.P for x, y in zip(xs, ys)]


def test_mul():
    xs, ys = rand_fr(), rand_fr()
    a, b = fr.batch_to_limbs(xs), fr.batch_to_limbs(ys)
    got = fr.batch_from_limbs(jax.jit(fr.mul)(a, b))
    assert got == [(x * y) % fr.P for x, y in zip(xs, ys)]


def test_edge_values():
    xs = [0, 1, fr.P - 1, fr.P - 2, 2, 3, (fr.P - 1) // 2, 12345]
    ys = [fr.P - 1, fr.P - 1, fr.P - 1, 1, 0, fr.P - 3, 2, fr.P - 12345]
    a, b = fr.batch_to_limbs(xs), fr.batch_to_limbs(ys)
    assert fr.batch_from_limbs(fr.mul(a, b)) == [
        (x * y) % fr.P for x, y in zip(xs, ys)]
    assert fr.batch_from_limbs(fr.add(a, b)) == [
        (x + y) % fr.P for x, y in zip(xs, ys)]


def test_pow_inv():
    xs = rand_fr()
    a = fr.batch_to_limbs(xs)
    e = 65537
    got = fr.batch_from_limbs(jax.jit(lambda v: fr.pow_(v, e))(a))
    assert got == [pow(x, e, fr.P) for x in xs]
    got = fr.batch_from_limbs(jax.jit(fr.inv)(a))
    assert got == [pow(x, fr.P - 2, fr.P) for x in xs]


def test_bits_roundtrip():
    xs = rand_fr()
    a = fr.batch_to_limbs(xs)
    bits = fr.to_bits(a, 254)
    back = fr.from_bits(bits)
    assert fr.batch_from_limbs(back) == xs
    # bit values match python
    bits_np = np.asarray(jax.device_get(bits))
    for j, x in enumerate(xs):
        for i in range(254):
            assert bits_np[i, j] == (x >> i) & 1


def test_predicates():
    xs = [0, 5, fr.P - 1, 7, 7, 0, 1, 2]
    ys = [0, 6, fr.P - 1, 7, 3, 1, 0, 2]
    a, b = fr.batch_to_limbs(xs), fr.batch_to_limbs(ys)
    np.testing.assert_array_equal(
        np.asarray(fr.eq(a, b)), [x == y for x, y in zip(xs, ys)])
    np.testing.assert_array_equal(
        np.asarray(fr.lt(a, b)), [x < y for x, y in zip(xs, ys)])
    np.testing.assert_array_equal(
        np.asarray(fr.is_zero(a)), [x == 0 for x in xs])


def test_generic_bignum_rsa_sized():
    """2048-bit Montgomery modexp (e=65537) vs Python pow — the RSA hot path
    (PowerMod semantics, bigInt.circom:280)."""
    k = bn.nlimbs_for_bits(2048)
    nb = 4
    mods, bases = [], []
    for _ in range(nb):
        m = rng.getrandbits(2048) | (1 << 2047) | 1
        mods.append(m)
        bases.append(rng.randrange(m))
    mod_l = bn.ints_to_limbs_batch(mods, k)
    base_l = bn.ints_to_limbs_batch(bases, k)
    mu = bn.barrett_mu_batch(mods, k)

    def modexp(base, mod, mu):
        return bn.mod_pow(base, 65537, mod, mu)

    got = bn.limbs_to_ints_batch(jax.jit(modexp)(base_l, mod_l, mu))
    assert got == [pow(b, 65537, m) for b, m in zip(bases, mods)]


def test_carry_normalize_and_polymul():
    xs = [rng.getrandbits(512) for _ in range(B)]
    ys = [rng.getrandbits(512) for _ in range(B)]
    k = bn.nlimbs_for_bits(512)
    a, b = bn.ints_to_limbs_batch(xs, k), bn.ints_to_limbs_batch(ys, k)
    prod = bn.carry_normalize(bn.poly_mul(a, b), k_out=2 * k)
    assert bn.limbs_to_ints_batch(prod) == [x * y for x, y in zip(xs, ys)]
