"""Batched BN254 G2 (twist over FQ2) point arithmetic on device.

Groundwork for the production-shaped Groth16 pi_B: the proving key carries
[v_j(tau)]G2 query points (the analog of snarkjs' zkey B2 section,
/root/reference/circuits/scripts/export-keys.sh:27-31) and the prover
computes pi_B with a G2 multi-scalar multiplication — so G2 arithmetic
must run batched on the chip, not point-at-a-time on the host.

Design: an FQ2 element rides as a ``(k, 2, *batch)`` uint32 limb tensor
(component axis right after the limb axis, batch minor-most as everywhere
else). `G2Ctx` implements the same field interface as
`weierstrass.CurveCtx` — mul/sqr/add/sub/inv + the group-formula hooks —
so the Jacobian formulas in ops/weierstrass.py (jac_add/jac_double/
to_affine/...) work unchanged over the twist. FQ2 is Fq[u]/(u^2 + 1)
(groth16/pairing.py FQ2), multiplication is 3-mul Karatsuba over the
Barrett base-field core in ops/bignum.
"""

from __future__ import annotations

import functools
import pathlib

import numpy as np
import jax
import jax.numpy as jnp

from . import bignum as bn
from . import weierstrass as wst

Q = 21888242871839275222246405745257275088696311157297823662689037894645226208583
R = 21888242871839275222246405745257275088548364400416034343698204186575808495617

K = bn.nlimbs_for_bits(Q.bit_length())         # 16 limbs of 16 bits
KN = bn.nlimbs_for_bits(R.bit_length())

_CACHE_DIR = pathlib.Path(__file__).parent.parent / "utils" / "constants"


class G2Ctx:
    """Field + group-formula interface over FQ2 for ops/weierstrass."""

    def __init__(self):
        self.k = K
        self.kn = KN
        self.p_limbs = bn.int_to_limbs(Q, K)
        self.mu_p = bn.barrett_mu(Q, K)

    # -- FQ2 ops on (k, 2, *B) tensors --------------------------------

    def add(self, x, y):
        return bn.add_mod(x, y, self.p_limbs)

    def sub(self, x, y):
        return bn.sub_mod(x, y, self.p_limbs)

    def mul(self, x, y):
        x0, x1 = x[:, 0], x[:, 1]
        y0, y1 = y[:, 0], y[:, 1]
        m0 = bn.mod_mul(x0, y0, self.p_limbs, self.mu_p)
        m1 = bn.mod_mul(x1, y1, self.p_limbs, self.mu_p)
        t = bn.mod_mul(bn.add_mod(x0, x1, self.p_limbs),
                       bn.add_mod(y0, y1, self.p_limbs),
                       self.p_limbs, self.mu_p)
        re = bn.sub_mod(m0, m1, self.p_limbs)                 # u^2 = -1
        im = bn.sub_mod(bn.sub_mod(t, m0, self.p_limbs), m1, self.p_limbs)
        return jnp.stack([re, im], axis=1)

    def sqr(self, x):
        # (x0 + x1 u)^2 = (x0+x1)(x0-x1) + 2 x0 x1 u  — 2 base muls
        x0, x1 = x[:, 0], x[:, 1]
        re = bn.mod_mul(bn.add_mod(x0, x1, self.p_limbs),
                        bn.sub_mod(x0, x1, self.p_limbs),
                        self.p_limbs, self.mu_p)
        m = bn.mod_mul(x0, x1, self.p_limbs, self.mu_p)
        return jnp.stack([re, bn.add_mod(m, m, self.p_limbs)], axis=1)

    def inv(self, x):
        # 1/(x0 + x1 u) = (x0 - x1 u) / (x0^2 + x1^2)
        x0, x1 = x[:, 0], x[:, 1]
        n0 = bn.mod_mul(x0, x0, self.p_limbs, self.mu_p)
        n1 = bn.mod_mul(x1, x1, self.p_limbs, self.mu_p)
        norm = bn.add_mod(n0, n1, self.p_limbs)
        ninv = bn.mod_pow(norm, Q - 2, self.p_limbs, self.mu_p)
        re = bn.mod_mul(x0, ninv, self.p_limbs, self.mu_p)
        im = bn.mod_mul(bn.sub_mod(jnp.zeros_like(x1), x1, self.p_limbs),
                        ninv, self.p_limbs, self.mu_p)
        return jnp.stack([re, im], axis=1)

    # -- group-formula hooks (weierstrass.jac_* contract) --------------

    def const_like(self, v: int, tmpl):
        """Embed the base-field int v as (v, 0) in FQ2, tmpl-shaped."""
        bshape = tmpl.shape[2:]
        re = bn._bcast_limbs(bn.int_to_limbs(v % Q, K), bshape)
        return jnp.stack([re, jnp.zeros_like(re)], axis=1)

    def a_const_like(self, tmpl):
        return jnp.zeros_like(tmpl)                    # twist has a = 0

    def is_zero_f(self, x):
        return bn.is_zero(x[:, 0]) & bn.is_zero(x[:, 1])

    def sel(self, cond, a, b):
        return jnp.where(cond[None, None].astype(bool), a, b)


@functools.lru_cache(maxsize=None)
def ctx() -> G2Ctx:
    return G2Ctx()


# -- host conversions (pairing.FQ2 affine points <-> limb tensors) ----------

def fq2_to_limbs(el) -> np.ndarray:
    """pairing.FQ2 -> (k, 2) uint32."""
    c0, c1 = (int(c) % Q for c in el.coeffs)
    return np.stack([bn.int_to_limbs(c0, K), bn.int_to_limbs(c1, K)], axis=1)


def limbs_to_fq2(a):
    from ..groth16 import pairing as pr
    a = np.asarray(a)
    return pr.FQ2([bn.limbs_to_int(a[:, 0]), bn.limbs_to_int(a[:, 1])])


def points_to_limbs(points):
    """Affine pairing-G2 points (None = infinity) -> ((2, k, 2, N) limb
    tensor, (N,) infinity mask)."""
    n = len(points)
    out = np.zeros((2, K, 2, n), np.uint32)
    inf = np.zeros(n, bool)
    for i, pt in enumerate(points):
        if pt is None:
            inf[i] = True
        else:
            out[0, :, :, i] = fq2_to_limbs(pt[0])
            out[1, :, :, i] = fq2_to_limbs(pt[1])
    return out, inf


def limbs_to_point(x, y):
    """Affine (k, 2) coordinate limb pair -> pairing-G2 point (or None)."""
    x, y = np.asarray(x), np.asarray(y)
    if not (x.any() or y.any()):
        return None
    return (limbs_to_fq2(x), limbs_to_fq2(y))


# -- fixed-base [s]G2 via stride-8 tables (setup-side b2_query) -------------

@functools.lru_cache(maxsize=None)
def _fixed_base_table_g2():
    """table[w, j] = (j * 2^(8w)) * G2 affine over FQ2, j = 0..255
    (j = 0 stored as zeros + inf flag). Host-generated with the pairing
    module's affine ops and cached as npz — the G2 counterpart of
    weierstrass._fixed_base_table (ref ec/powers stride tables,
    curve.circom:680-740)."""
    cache = _CACHE_DIR / "fixed_base_bn254_g2.npz"
    if cache.exists():
        d = np.load(cache)
        return d["x"], d["y"], d["inf"]
    from ..groth16 import pairing as pr

    nwin = -(-R.bit_length() // 8)
    xs = np.zeros((nwin, 256, K, 2), np.uint32)
    ys = np.zeros((nwin, 256, K, 2), np.uint32)
    infs = np.zeros((nwin, 256), bool)
    stride_base = pr.G2
    for w in range(nwin):
        acc = None
        for j in range(256):
            if acc is None:
                infs[w, j] = True
            else:
                xs[w, j] = fq2_to_limbs(acc[0])
                ys[w, j] = fq2_to_limbs(acc[1])
            acc = pr.ec_add(acc, stride_base)
        for _ in range(8):
            stride_base = pr.ec_double(stride_base)
    _CACHE_DIR.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(cache, x=xs, y=ys, inf=infs)
    return xs, ys, infs


def fixed_base_mul(scalar_limbs):
    """scalar * G2 for batched Fr scalars (kn, *B) -> Jacobian FQ2 point
    ((k, 2, *B) coordinates)."""
    c = ctx()
    xs, ys, infs = _fixed_base_table_g2()
    nwin = xs.shape[0]
    bshape = scalar_limbs.shape[1:]
    idx256 = np.arange(256, dtype=np.uint32).reshape(
        (256,) + (1,) * len(bshape))

    bytes_ = []
    for w in range(nwin):
        limb = scalar_limbs[w // 2]
        bytes_.append((limb >> (8 * (w % 2))) & 0xFF)
    bytes_ = jnp.stack(bytes_, axis=0)                  # (nwin, *B)

    def step(acc, xsel):
        byte, tx, ty, tinf = xsel     # (*B,), (256,k,2), (256,k,2), (256,)
        onehot = (byte[None] == idx256).astype(jnp.float32)     # (256, *B)
        # exact in f32 (limbs < 2^16, one-hot selects a single entry) —
        # but only at Precision.HIGHEST: the MXU's default bf16 passes
        # truncate 16-bit limbs
        hi = jax.lax.Precision.HIGHEST
        qx = jnp.einsum("dkc,d...->kc...", tx.astype(jnp.float32),
                        onehot, precision=hi).astype(jnp.uint32)
        qy = jnp.einsum("dkc,d...->kc...", ty.astype(jnp.float32),
                        onehot, precision=hi).astype(jnp.uint32)
        qinf = jnp.einsum("d,d...->...", tinf.astype(jnp.float32),
                          onehot, precision=hi).astype(bool)
        acc = wst.jac_add_affine(c, acc, qx, qy, qinf)
        return acc, None

    one = c.const_like(1, jnp.zeros((K, 2) + bshape, jnp.uint32))
    acc = (one, one, jnp.zeros_like(one))
    acc, _ = jax.lax.scan(
        step, acc,
        (bytes_, jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(infs)))
    return acc


def to_affine(P):
    return wst.to_affine(ctx(), P)
