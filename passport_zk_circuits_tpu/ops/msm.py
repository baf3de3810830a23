"""Multi-scalar multiplication over BN254 G1/G2 — the Groth16 prover core.

The reference's proving step (snarkjs groth16, circuits/scripts/prove.sh)
reduces to MSMs over the proving key. TPU formulation (round 5, replacing
the per-point full ladder): Pippenger's windowed decomposition with the
doubling chain hoisted OUT of the per-point work —

    sum_j s_j P_j  =  sum_w 2^{4w} S_w,       S_w = sum_j T_j[d_{j,w}]

* per point: ONE 16-entry window table T_j (15 batched Jacobian adds,
  shared across every window AND every proof lane),
* per window: a one-hot f32 table select (MXU matmul, exact: limbs < 2^16)
  and a pairwise tree reduction over the point axis (N-1 adds),
* per MSM: a single Horner chain of 4 doublings + 1 add per window —
  254 doublings TOTAL instead of 254 *per point*.

Cost ~79 unified adds/point vs ~254 doubles + 79 adds/point for the
ladder (~3x fewer field mults), with every step batched over both the
point axis and an optional proof-lane axis. G2 MSMs (production pi_B,
[v_j(tau)]G2 query) run the identical code over ops/g2.G2Ctx — the
formulas only touch the field through the ctx interface.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import g2 as _g2
from . import weierstrass as wst

WINDOW = 4


def _ctx(curve: str):
    return _g2.ctx() if curve == "bn254_g2" else wst.ctx(curve)


def _build_table(c, px, py):
    """T[d] = [d]P for d = 0..15, batched over the trailing point axis.
    px/py: (k[, 2], N) affine limbs. Returns Jacobian coords (16, ...)."""
    one = c.const_like(1, px)
    base = (px, py, one)
    inf = wst.infinity_like(c, px)

    def build(acc, _):
        acc = wst.jac_add(c, acc, base)
        return acc, acc

    _, tbl = jax.lax.scan(build, inf, None, length=(1 << WINDOW) - 1)
    return tuple(jnp.concatenate([i[None], t], axis=0)
                 for i, t in zip(inf, tbl))


def _digits(scalars, kn: int):
    """(kn, *L, N) 16-bit limbs -> (nwin, *L, N) 4-bit digits, MSB-first."""
    wins = []
    for wdx in range(kn * 4):
        limb = scalars[kn - 1 - wdx // 4]
        wins.append((limb >> (4 * (3 - wdx % 4))) & 0xF)
    return jnp.stack(wins, axis=0)


def _select(tbl, onehot, g2: bool):
    """One-hot select (16, k[,2], N) x (16, *L, N) -> (k[,2], *L, N).
    f32 einsum is exact (limbs < 2^16, one-hot picks a single entry) ONLY
    at full f32 precision — the TPU MXU's default bf16 passes truncate
    16-bit limbs, so Precision.HIGHEST is mandatory here."""
    eq = "dkcn,d...n->kc...n" if g2 else "dkn,d...n->k...n"
    return tuple(
        jnp.einsum(eq, t.astype(jnp.float32), onehot,
                   precision=jax.lax.Precision.HIGHEST).astype(jnp.uint32)
        for t in tbl)


def msm(px, py, scalars, curve: str = "bn254_g1"):
    """sum_j scalars[..., j] * (px[..., j], py[..., j]), Jacobian out.

    px, py: (k, N) affine limbs (G1) or (k, 2, N) (G2, curve="bn254_g2");
    scalars: (kn, *L, N) — *L is an optional proof-lane axis shared
    against the single point table. N must be a power of two (callers
    pad with zero scalars). Returns Jacobian coords shaped (k[, 2], *L).
    """
    c = _ctx(curve)
    g2 = curve == "bn254_g2"
    n = px.shape[-1]
    assert n & (n - 1) == 0, "msm: pad N to a power of two"
    kn = scalars.shape[0]
    lshape = scalars.shape[1:-1]

    tbl = _build_table(c, px, py)
    digs = _digits(scalars, kn)
    idx16 = np.arange(16, dtype=np.uint32).reshape(
        (16,) + (1,) * (len(lshape) + 1))

    acc0 = wst.infinity_like(
        c, jnp.zeros(px.shape[:-1] + lshape, jnp.uint32))

    def step(acc, dig):
        onehot = (dig[None] == idx16).astype(jnp.float32)
        sel = _select(tbl, onehot, g2)              # (k[,2], *L, N)
        m = n
        while m > 1:
            half = m // 2
            left = tuple(t[..., :half] for t in sel)
            right = tuple(t[..., half:m] for t in sel)
            sel = wst.jac_add(c, left, right)
            m = half
        s_w = tuple(t[..., 0] for t in sel)
        for _ in range(WINDOW):
            acc = wst.jac_double(c, acc)
        acc = wst.jac_add(c, acc, s_w)
        return acc, None

    acc, _ = jax.lax.scan(step, acc0, digs)
    return acc


def msm_affine(px, py, scalars, curve: str = "bn254_g1"):
    """msm + to_affine (infinity -> zeros)."""
    c = _ctx(curve)
    return wst.to_affine(c, msm(px, py, scalars, curve))
