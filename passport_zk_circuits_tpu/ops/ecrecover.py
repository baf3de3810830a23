"""Batched Ethereum-style ECDSA public-key recovery (secp256k1).

Capability twin of
/root/reference/circuits/lib/circuits/signatures/ecrecover.circom:9-124
(``EcRecover``: y^2 candidate from r, square-root witness, curve checks,
Q = r^-1 * (s*R - h*G)).

The square root is computed in-graph via the (p+1)/4 exponent (secp256k1's
p ≡ 3 mod 4), playing the role of the reference's unconstrained sqrt witness
plus its y^2 re-check.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import bignum as bn
from . import weierstrass as wst


def recover(r, s, v_odd, hash_bits):
    """r, s: (16, *B) limbs; v_odd: (*B,) bool (y parity, v-27 of Ethereum);
    hash_bits: (256, *B) big-endian bits.
    Returns (qx, qy, ok): the recovered affine public key and validity."""
    from . import ecdsa as ec
    c = wst.ctx("secp256k1")
    cv = c.curve
    bshape = r.shape[1:]

    # R_x = r (the low-s / low-r normalization of the reference: no n offset)
    rx = r
    # y^2 = x^3 + 7; y = (y^2)^((p+1)/4), validity = y*y == y^2
    y2 = c.add(c.mul(c.sqr(rx), rx), c.const(cv.b, bshape))
    y = bn.mod_pow(y2, (cv.p + 1) // 4, c.p_limbs, c.mu_p)
    ok = bn.eq(c.sqr(y), y2)

    # choose parity: y or p - y
    y_is_odd = (y[0] & 1).astype(bool)
    y_other = bn.sub_mod(jnp.zeros_like(y), y, c.p_limbs)
    y_sel = jnp.where((y_is_odd == jnp.asarray(v_odd))[None], y, y_other)

    h = ec.hash_bits_to_limbs(hash_bits, c.kn)
    h_mod = bn.barrett_reduce(jnp.concatenate([h, jnp.zeros_like(h)], 0),
                              c.n_limbs, c.mu_n)
    r_inv = bn.mod_pow(r, cv.n - 2, c.n_limbs, c.mu_n)
    u1 = bn.mod_mul(r_inv, bn.sub_mod(jnp.zeros_like(h_mod), h_mod,
                                      c.n_limbs), c.n_limbs, c.mu_n)
    u2 = bn.mod_mul(r_inv, s, c.n_limbs, c.mu_n)

    # Q = u1*G + u2*R
    g_part = wst.fixed_base_mul(c, u1)
    r_part = wst.scalar_mul_window(c, u2, rx, y_sel)
    Q = wst.jac_add(c, g_part, r_part)
    qx, qy = wst.to_affine(c, Q)
    ok = ok & ~wst.is_inf(Q) & ~bn.is_zero(r) & ~bn.is_zero(s)
    ok = ok & bn.lt(r, c.n_limbs) & bn.lt(s, c.n_limbs)
    return qx, qy, ok
