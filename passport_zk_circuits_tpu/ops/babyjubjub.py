"""Batched BabyJubJub (twisted Edwards over BN254 Fr) point arithmetic.

Capability twin of /root/reference/circuits/lib/circuits/babyjubjub/
(curve.circom:19-206: addZeroBabyjub / BabyjubjubAdd / BabyjubjubDouble /
BabyjubjubBase8Multiplication / BabyjubjubMultiplication, get.circom:5
GetBabyjubjubBase8) and of circomlib's BabyPbk used by the reference at
identityStateVerifier.circom:19 / registerIdentityLight.circom:59.

TPU-native re-design: points are kept in **extended twisted-Edwards
coordinates (X:Y:Z:T)** through the whole scalar ladder — the complete
unified addition needs no inversions and no zero-point special-casing (the
reference's affine circuits burn a modular inverse per step and encode the
identity as (0,0), curve.circom:19-69). One Fermat inversion converts back
to affine at the end. The 254-bit double-and-add runs under ``lax.scan``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import field as fr

# curve: a*x^2 + y^2 = 1 + d*x^2*y^2 over Fr
A = 168700
D = 168696

BASE8_X = 5299619240641551281634865583518297030282874472190772894086521144482721001553
BASE8_Y = 16950150798460657717958625567821834550301663161624707787222815936182638968203

ORDER = 21888242871839275222246405745257275088614511777268538073601725287587578984328
SUBORDER = ORDER >> 3


def identity(batch_shape=()):
    """Identity in extended coordinates: (0, 1, 1, 0)."""
    zero = fr.const(0, batch_shape)
    one = fr.const(1, batch_shape)
    return (zero, one, one, zero)


def to_extended(x, y):
    """Affine (x, y) -> extended (X, Y, Z, T) with Z=1, T=x*y."""
    one = jnp.broadcast_to(jnp.asarray(fr.ONE_LIMBS).reshape(
        (fr.NLIMBS,) + (1,) * (x.ndim - 1)), x.shape)
    return (x, y, one, fr.mul(x, y))


def to_affine(p):
    """Extended -> affine via one Fermat inversion of Z."""
    X, Y, Z, _ = p
    zinv = fr.inv(Z)
    return fr.mul(X, zinv), fr.mul(Y, zinv)


def add(p, q):
    """Complete unified addition (add-2008-hwcd), 9 muls + 2 const muls."""
    X1, Y1, Z1, T1 = p
    X2, Y2, Z2, T2 = q
    Aa = fr.mul(X1, X2)
    Bb = fr.mul(Y1, Y2)
    Cc = fr.mul(fr.mul(T1, T2), fr.const(D, T1.shape[1:]))
    Dd = fr.mul(Z1, Z2)
    E = fr.sub(fr.sub(fr.mul(fr.add(X1, Y1), fr.add(X2, Y2)), Aa), Bb)
    F = fr.sub(Dd, Cc)
    G = fr.add(Dd, Cc)
    H = fr.sub(Bb, fr.mul(Aa, fr.const(A, Aa.shape[1:])))
    return (fr.mul(E, F), fr.mul(G, H), fr.mul(F, G), fr.mul(E, H))


def double(p):
    return add(p, p)


def select_point(cond, p, q):
    return tuple(fr.select(cond, a, b) for a, b in zip(p, q))


def scalar_mul(scalar, point, nbits: int = 254):
    """scalar: (16, *B) Fr limbs (used as an integer, like the reference's
    Num2Bits(254) ladder, curve.circom:143-171); point: affine (x, y) limb
    pair. Returns affine (x, y). LSB-first double-and-add under lax.scan;
    on verified TPU the whole ladder runs as ONE fused Pallas kernel
    (ops/pallas_babyjubjub.ladder)."""
    x, y = point
    from . import pallas_field as pf
    if pf.use_pallas() and x.ndim == 2:
        from . import pallas_babyjubjub as pbjj
        bits_u = fr.to_bits(scalar, nbits)
        return to_affine(pbjj.ladder(bits_u, x, y))
    bits = fr.to_bits(scalar, nbits).astype(bool)    # (nbits, *B)
    base0 = to_extended(x, y)

    def step(carry, bit):
        acc, base = carry
        acc2 = add(acc, base)
        acc = select_point(bit, acc2, acc)
        base = double(base)
        return (acc, base), None

    (acc, _), _ = jax.lax.scan(step, (identity(x.shape[1:]), base0), bits)
    return to_affine(acc)


def base8_mul(scalar, batch_shape=()):
    """BabyjubjubBase8Multiplication / circomlib BabyPbk analog:
    pk = Base8 * scalar. scalar: (16, *B) -> affine ((16, *B), (16, *B))."""
    bx = fr.const(BASE8_X, batch_shape)
    by = fr.const(BASE8_Y, batch_shape)
    return scalar_mul(scalar, (bx, by))


def on_curve(x, y):
    """BabyjubjubPointOnCurve analog (curve.circom:122): a*x^2 + y^2 ==
    1 + d*x^2*y^2 -> bool (*B,)."""
    x2 = fr.sqr(x)
    y2 = fr.sqr(y)
    lhs = fr.add(fr.mul(x2, fr.const(A, x.shape[1:])), y2)
    rhs = fr.add(fr.const(1, x.shape[1:]),
                 fr.mul(fr.mul(x2, y2), fr.const(D, x.shape[1:])))
    return fr.eq(lhs, rhs)
