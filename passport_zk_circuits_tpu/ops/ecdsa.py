"""Batched ECDSA signature verification over the registry curves.

Capability twin of
/root/reference/circuits/lib/circuits/signatures/ecdsa.circom:18-162
(``verifyECDSABits``: bits->chunks, s^-1 = BigModInv mod n, u1 = s^-1*h,
u2 = s^-1*r, R = u1*G (fixed-base stride-8) + u2*PK (windowed w=4),
x(R) mod n == r).

Deltas (strengthened, documented): we also require r, s in [1, n-1] and the
public key on the curve — the reference constrains neither.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import bignum as bn
from . import weierstrass as wst


def hash_bits_to_limbs(hash_bits, kn: int):
    """Big-endian hash bit tensor (nbits, *B) -> (kn, *B) limbs (the
    bits2num-then-chunk step, ecdsa.circom:33-40). If the hash is wider
    than the order field, the leftmost bits are kept (standard ECDSA)."""
    from . import bitops
    if hash_bits.shape[0] > kn * 16:
        hash_bits = hash_bits[:kn * 16]
    return bitops.bits_to_limbs(hash_bits, kn, msb_first=True)


def on_curve(c: wst.CurveCtx, x, y):
    """y^2 == x^3 + a*x + b (PointOnCurve analog, ec/curve.circom:107)."""
    lhs = c.sqr(y)
    rhs = c.add(c.mul(c.sqr(x), x),
                c.add(c.mul(c.const(c.curve.a, x.shape[1:]), x),
                      c.const(c.curve.b, x.shape[1:])))
    return bn.eq(lhs, rhs)


def verify(curve_name: str, pk_x, pk_y, signature, hash_bits):
    """pk_x, pk_y: (k, *B) field limbs; signature: (2*kn, *B) = r || s;
    hash_bits: (hash_len, *B) big-endian bits. Returns bool (*B,)."""
    c = wst.ctx(curve_name)
    kn = c.kn
    r = signature[:kn]
    s = signature[kn:2 * kn]
    h = hash_bits_to_limbs(hash_bits, kn)

    # scalar-field (mod n) arithmetic
    s_inv = bn.mod_pow(s, c.curve.n - 2, c.n_limbs, c.mu_n)
    u1 = bn.mod_mul(s_inv, bn.barrett_reduce(
        jnp.concatenate([h, jnp.zeros_like(h)], axis=0),
        c.n_limbs, c.mu_n), c.n_limbs, c.mu_n)
    u2 = bn.mod_mul(s_inv, r, c.n_limbs, c.mu_n)

    # R = u1*G + u2*PK
    r1 = wst.fixed_base_mul(c, u1)
    # pk may live in a wider limb count than kn — widths match here (k==kn
    # for all registry curves except p521 where both are 33)
    r2 = wst.scalar_mul_window(c, u2, pk_x, pk_y)
    R = wst.jac_add(c, r1, r2)
    rx, _ = wst.to_affine(c, R)

    # x(R) mod n == r  (ecdsa.circom:82-90); k == kn for every registry curve
    assert c.k == c.kn
    rx_mod_n = bn.barrett_reduce(
        jnp.concatenate([rx, jnp.zeros_like(rx)], axis=0),
        c.n_limbs, c.mu_n)
    ok = bn.eq(rx_mod_n, r)

    # strengthened validity (documented delta vs the reference)
    n_ext = c.n_limbs
    ok = ok & ~bn.is_zero(r) & ~bn.is_zero(s)
    ok = ok & bn.lt(r, n_ext) & bn.lt(s, n_ext)
    ok = ok & on_curve(c, pk_x, pk_y)
    ok = ok & ~wst.is_inf(R)
    return ok


def verify_blinded(curve_name: str, pk_x, pk_y, signature, hash_bits,
                   beta, alpha_x, alpha_y):
    """Blinded-verification variant — capability twin of the experimental
    signatures/ecdsaBeta.circom:22-128: the prover supplies a random ~80-bit
    blind `beta` and the precomputed point alpha = beta * s^-1 * r * PK; the
    verifier checks   beta*R == (beta * s^-1 * h) * G + alpha   and
    x(R) mod n == r, where R = u1*G + u2*PK is computed cheaply (the
    reference computes it with zero-constraint witness ops,
    ec/curveUnconstrained.circom).

    beta: (kn, *B) limbs (value < 2^80); alpha_*: (k, *B) affine coords.
    Returns bool (*B,)."""
    c = wst.ctx(curve_name)
    kn = c.kn
    r = signature[:kn]
    s = signature[kn:2 * kn]
    h = hash_bits_to_limbs(hash_bits, kn)

    s_inv = bn.mod_pow(s, c.curve.n - 2, c.n_limbs, c.mu_n)
    h_mod = bn.barrett_reduce(jnp.concatenate([h, jnp.zeros_like(h)], 0),
                              c.n_limbs, c.mu_n)
    u1 = bn.mod_mul(s_inv, h_mod, c.n_limbs, c.mu_n)
    u2 = bn.mod_mul(s_inv, r, c.n_limbs, c.mu_n)

    # R = u1*G + u2*PK (the "unconstrained" path of the reference)
    R = wst.jac_add(c, wst.fixed_base_mul(c, u1),
                    wst.scalar_mul_window(c, u2, pk_x, pk_y))
    rx, ry = wst.to_affine(c, R)

    # left: beta * R (80-bit scalar, EllipticCurveIntScalarMult analog)
    left = wst.scalar_mul_window(c, beta, rx, ry)
    lx, ly = wst.to_affine(c, left)

    # right: (beta * u1 mod n) * G + alpha
    bu1 = bn.mod_mul(beta, u1, c.n_limbs, c.mu_n)
    right = wst.jac_add_affine(c, wst.fixed_base_mul(c, bu1),
                               alpha_x, alpha_y,
                               bn.is_zero(alpha_x) & bn.is_zero(alpha_y))
    rxr, ryr = wst.to_affine(c, right)

    ok = bn.eq(lx, rxr) & bn.eq(ly, ryr)
    rx_mod_n = bn.barrett_reduce(
        jnp.concatenate([rx, jnp.zeros_like(rx)], 0), c.n_limbs, c.mu_n)
    ok = ok & bn.eq(rx_mod_n, r) & ~bn.is_zero(r) & ~bn.is_zero(s)
    return ok
