"""Multi-scalar multiplication over BN254 G1 — Groth16-prover groundwork.

The reference's proving step (snarkjs groth16, circuits/scripts/prove.sh)
reduces to MSMs over the proving key. This module provides the batched
TPU formulation: N points live on the batch axis, each runs the windowed
ladder in lockstep, and the results fold with a log2(N) pairwise tree of
unified Jacobian additions (no sequential bucket walk).

`bn254_g1` comes from the self-validated curve registry.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import bignum as bn
from . import weierstrass as wst


def msm(px, py, scalars, curve: str = "bn254_g1"):
    """Sum_j scalars[:, j] * (px[:, j], py[:, j]).

    px, py: (k, N) affine coordinate limbs; scalars: (kn, N).
    Returns affine (x, y) of the aggregate (each (k,))."""
    c = wst.ctx(curve)
    acc = wst.scalar_mul_window(c, scalars, px, py)   # jacobian, batch N

    # pairwise tree reduction over the point axis
    X, Y, Z = acc
    n = X.shape[1]
    while n > 1:
        half = n // 2
        left = (X[:, :half], Y[:, :half], Z[:, :half])
        right = (X[:, half:2 * half], Y[:, half:2 * half], Z[:, half:2 * half])
        X2, Y2, Z2 = wst.jac_add(c, left, right)
        if n % 2:
            X = jnp.concatenate([X2, X[:, -1:]], axis=1)
            Y = jnp.concatenate([Y2, Y[:, -1:]], axis=1)
            Z = jnp.concatenate([Z2, Z[:, -1:]], axis=1)
            n = half + 1
        else:
            X, Y, Z = X2, Y2, Z2
            n = half
    return wst.to_affine(c, (X[:, 0], Y[:, 0], Z[:, 0]))
