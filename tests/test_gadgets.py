"""Stdlib gadget equivalents: switcher, sort, matrix, float."""
import random

import jax
import jax.numpy as jnp
import numpy as np

from passport_zk_circuits_tpu.ops import field as fr
from passport_zk_circuits_tpu.ops import gadgets as g

rng = random.Random(9)


def test_switcher_and_force_equal():
    a = fr.batch_to_limbs([1, 2, 3])
    b = fr.batch_to_limbs([4, 5, 6])
    sel = np.array([True, False, True])
    L, R = g.switcher(sel, a, b)
    assert fr.batch_from_limbs(L) == [4, 2, 6]
    assert fr.batch_from_limbs(R) == [1, 5, 3]
    ok = g.force_equal_if_enabled(np.array([True, True, False]), a,
                                  fr.batch_to_limbs([1, 9, 9]))
    np.testing.assert_array_equal(np.asarray(ok), [True, False, True])


def test_sort_checked():
    B, n = 3, 8
    cols = [[rng.randrange(1 << 48) for _ in range(n)] for _ in range(B)]
    vals = np.stack([fr.batch_to_limbs([c[i] for c in cols])
                     for i in range(n)], axis=0)     # (n, 16, B)
    sv, ok_sorted, ok_perm = jax.jit(g.sort_checked)(vals)
    assert np.asarray(ok_sorted).all() and np.asarray(ok_perm).all()
    for j in range(B):
        got = [fr.batch_from_limbs(sv[i])[j] for i in range(n)]
        assert got == sorted(cols[j])


def test_mat_mul():
    B, n, m, q = 2, 2, 3, 2
    A = [[[rng.randrange(fr.P) for _ in range(B)] for _ in range(m)]
         for _ in range(n)]
    Bm = [[[rng.randrange(fr.P) for _ in range(B)] for _ in range(q)]
          for _ in range(m)]
    A_l = np.stack([np.stack([fr.batch_to_limbs(A[i][j]) for j in range(m)])
                    for i in range(n)])
    B_l = np.stack([np.stack([fr.batch_to_limbs(Bm[i][j]) for j in range(q)])
                    for i in range(m)])
    C = jax.jit(g.mat_mul)(A_l, B_l)
    for i in range(n):
        for j in range(q):
            got = fr.batch_from_limbs(C[i, j])
            want = [sum(A[i][k][b] * Bm[k][j][b] for k in range(m)) % fr.P
                    for b in range(B)]
            assert got == want


def test_float_mult():
    n = 8
    xs = [int(6.5 * 2 ** n), int(2.25 * 2 ** n)]
    ys = [int(2.0 * 2 ** n), int(0.5 * 2 ** n)]
    a, b = fr.batch_to_limbs(xs), fr.batch_to_limbs(ys)
    out = g.float_mult(a, b, n)
    got = fr.batch_from_limbs(out)
    assert got == [x * y // 2 ** n for x, y in zip(xs, ys)]
