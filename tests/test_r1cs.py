"""R1CS builder + batched Az∘Bz−Cz checker."""
import random

import jax
import numpy as np

from passport_zk_circuits_tpu.r1cs import system as r1
from passport_zk_circuits_tpu.ops import field as fr

rng = random.Random(11)


def test_mul_and_bool_gadgets():
    cs = r1.ConstraintSystem()
    x = cs.new_var("x")
    y = cs.new_var("y")
    z = cs.mul(x, y)
    b = cs.new_var("b")
    cs.enforce_bool(b)

    B = 4
    xs = [rng.randrange(fr.P) for _ in range(B)]
    ys = [rng.randrange(fr.P) for _ in range(B)]
    good = r1.witness_matrix(
        [1, xs, ys, [x * y % fr.P for x, y in zip(xs, ys)], [0, 1, 1, 0]], B)
    ok, per = jax.jit(lambda w: r1.check_batched(cs, w))(good)
    assert np.asarray(ok).all()

    bad = good.copy()
    bad[3] = fr.batch_to_limbs([x * y % fr.P + 1 for x, y in zip(xs, ys)])
    ok2, per2 = r1.check_batched(cs, bad)
    assert not np.asarray(ok2).any()
    # the failing row is the mul constraint (row 0)
    assert not np.asarray(per2)[0].any()
    # boolean wire != {0,1} fails
    bad2 = good.copy()
    bad2[4] = fr.batch_to_limbs([2, 1, 1, 0])
    ok3, per3 = r1.check_batched(cs, bad2)
    np.testing.assert_array_equal(np.asarray(ok3), [False, True, True, True])


def test_bits_gadget_large_lincomb():
    cs = r1.ConstraintSystem()
    x = cs.new_var("x")
    bits = cs.bits(x, 254)

    B = 2
    xs = [rng.randrange(fr.P) for _ in range(B)]
    wires = [1, xs]
    for i in range(254):
        wires.append([(v >> i) & 1 for v in xs])
    w = r1.witness_matrix(wires, B)
    ok, _ = jax.jit(lambda w: r1.check_batched(cs, w))(w)
    assert np.asarray(ok).all()
    # flip one bit -> recompose row fails
    w2 = w.copy()
    w2[2] = fr.batch_to_limbs([1 - ((v >> 0) & 1) for v in xs])
    ok2, _ = r1.check_batched(cs, w2)
    assert not np.asarray(ok2).any()


def test_is_zero_gadget():
    cs = r1.ConstraintSystem()
    x = cs.new_var("x")
    out = cs.is_zero(x)

    B = 3
    xs = [0, 5, fr.P - 1]
    invs = [0 if v == 0 else pow(v, fr.P - 2, fr.P) for v in xs]
    outs = [1 if v == 0 else 0 for v in xs]
    w = r1.witness_matrix([1, xs, invs, outs], B)
    ok, _ = r1.check_batched(cs, w)
    assert np.asarray(ok).all()
    # claiming is_zero(5) == 1 must fail
    w2 = r1.witness_matrix([1, xs, invs, [1, 1, 0]], B)
    ok2, _ = r1.check_batched(cs, w2)
    np.testing.assert_array_equal(np.asarray(ok2), [True, False, True])
