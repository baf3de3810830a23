"""NTT over Fr and MSM over BN254 G1 vs naive oracles."""
import random
import pytest

import jax
import numpy as np

from passport_zk_circuits_tpu.ops import field as fr
from passport_zk_circuits_tpu.ops import bignum as bn
from passport_zk_circuits_tpu.ops import ntt
from passport_zk_circuits_tpu.ops import msm
from passport_zk_circuits_tpu.ops.curves import CURVES
from passport_zk_circuits_tpu.utils import ecdsa_ref as ecref


pytestmark = pytest.mark.slow  # big-graph compile tier (SURVEY §4 budget)

rng = random.Random(808)


def _naive_dft(coeffs, w):
    n = len(coeffs)
    return [sum(coeffs[j] * pow(w, i * j, fr.P) for j in range(n)) % fr.P
            for i in range(n)]


def test_ntt_vs_naive_dft():
    n, B = 8, 2
    cols = [[rng.randrange(fr.P) for _ in range(n)] for _ in range(B)]
    a = np.stack([fr.batch_to_limbs([c[i] for c in cols])
                  for i in range(n)], axis=1)         # (16, n, B)
    out = jax.jit(ntt.ntt)(a)
    w = ntt.root_of_unity(3)
    for j, c in enumerate(cols):
        got = [fr.batch_from_limbs(out[:, i])[j] for i in range(n)]
        assert got == _naive_dft(c, w)


def test_ntt_roundtrip_and_polymul():
    n, B = 64, 2
    cols = [[rng.randrange(fr.P) for _ in range(n)] for _ in range(B)]
    a = np.stack([fr.batch_to_limbs([c[i] for c in cols])
                  for i in range(n)], axis=1)
    back = jax.jit(lambda x: ntt.intt(ntt.ntt(x)))(a)
    for j, c in enumerate(cols):
        got = [fr.batch_from_limbs(back[:, i])[j] for i in range(n)]
        assert got == c

    # cyclic convolution vs schoolbook
    ys = [[rng.randrange(fr.P) for _ in range(n)] for _ in range(B)]
    b = np.stack([fr.batch_to_limbs([c[i] for c in ys])
                  for i in range(n)], axis=1)
    prod = jax.jit(ntt.poly_mul_ntt)(a, b)
    for j in range(B):
        want = [sum(cols[j][u] * ys[j][(i - u) % n] for u in range(n)) % fr.P
                for i in range(n)]
        got = [fr.batch_from_limbs(prod[:, i])[j] for i in range(n)]
        assert got == want


def test_msm_vs_oracle():
    cv = CURVES["bn254_g1"]
    N = 5
    scalars = [rng.randrange(1, cv.n) for _ in range(N)]
    pts = [ecref.scalar_mul(cv, rng.randrange(1, cv.n), (cv.gx, cv.gy))
           for _ in range(N)]
    px = bn.ints_to_limbs_batch([p[0] for p in pts], 16)
    py = bn.ints_to_limbs_batch([p[1] for p in pts], 16)
    s = bn.ints_to_limbs_batch(scalars, 16)
    x, y = jax.jit(msm.msm, static_argnums=3)(px, py, s, "bn254_g1")

    acc = None
    for k, p in zip(scalars, pts):
        acc = ecref._add(cv, acc, ecref.scalar_mul(cv, k, p))
    assert (bn.limbs_to_int(x), bn.limbs_to_int(y)) == acc
