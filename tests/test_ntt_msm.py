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
    """Pippenger-table MSM with a lane axis vs the naive host oracle.
    N=8 points, 2 proof lanes; lane 1 includes zero scalars (infinity
    table entries) to exercise the unified-add edge cases."""
    cv = CURVES["bn254_g1"]
    N, B = 8, 2
    lanes = [[rng.randrange(1, cv.n) for _ in range(N)],
             [0, 0] + [rng.randrange(1, cv.n) for _ in range(N - 2)]]
    pts = [ecref.scalar_mul(cv, rng.randrange(1, cv.n), (cv.gx, cv.gy))
           for _ in range(N)]
    px = bn.ints_to_limbs_batch([p[0] for p in pts], 16)
    py = bn.ints_to_limbs_batch([p[1] for p in pts], 16)
    s = np.stack([bn.ints_to_limbs_batch(l, 16) for l in lanes], axis=1)
    x, y = jax.jit(msm.msm_affine, static_argnums=3)(px, py, s, "bn254_g1")

    for lane, scalars in enumerate(lanes):
        acc = None
        for k, p in zip(scalars, pts):
            if k:
                acc = ecref._add(cv, acc, ecref.scalar_mul(cv, k, p))
        assert (bn.limbs_to_int(np.asarray(x)[:, lane]),
                bn.limbs_to_int(np.asarray(y)[:, lane])) == acc


def test_msm_g2_vs_oracle():
    """G2 MSM (production pi_B path) vs the host pairing-module oracle."""
    from passport_zk_circuits_tpu.ops import g2
    from passport_zk_circuits_tpu.groth16 import pairing as pr

    N = 4
    base_ks = [rng.randrange(1, pr.R) for _ in range(N)]
    pts = [pr.ec_mul(pr.G2, k) for k in base_ks]
    scalars = [rng.randrange(1, pr.R) for _ in range(N - 1)] + [0]
    q, inf = g2.points_to_limbs(pts)
    s = bn.ints_to_limbs_batch(scalars, 16)
    x, y = jax.jit(msm.msm_affine, static_argnums=3)(
        q[0], q[1], s, "bn254_g2")

    acc = None
    for k, p in zip(scalars, pts):
        acc = pr.ec_add(acc, pr.ec_mul(p, k))
    assert g2.limbs_to_point(np.asarray(x), np.asarray(y)) == acc


def test_g2_fixed_base_vs_oracle():
    from passport_zk_circuits_tpu.ops import g2
    from passport_zk_circuits_tpu.groth16 import pairing as pr

    ks = [0, 1, rng.randrange(pr.R)]
    sl = bn.ints_to_limbs_batch(ks, 16)
    x, y = jax.jit(lambda s: g2.to_affine(g2.fixed_base_mul(s)))(sl)
    for i, k in enumerate(ks):
        got = g2.limbs_to_point(np.asarray(x)[:, :, i],
                                np.asarray(y)[:, :, i])
        assert got == pr.ec_mul(pr.G2, k)
