"""BN254 scalar field (Fr) arithmetic — the base field of every circuit value.

This is the TPU-native replacement for circom's implicit field: every signal in
the reference is an element of Fr
(prime pinned at /root/reference/test/automatisationTest.js:9). Elements are
(16, *batch) uint32 limb arrays (16-bit limbs, limb-major; see ops/bignum.py).
Reduction is Barrett with the static BN254 mu constant, so all values stay in
the standard domain end-to-end.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import bignum as bn

# BN254 (alt_bn128) scalar field modulus.
P = 21888242871839275222246405745257275088548364400416034343698204186575808495617
NLIMBS = 16                      # 16 x 16-bit limbs = 256 bits >= 254

P_LIMBS = bn.int_to_limbs(P, NLIMBS)
MU_LIMBS = bn.barrett_mu(P, NLIMBS)
ZERO_LIMBS = np.zeros(NLIMBS, dtype=np.uint32)
ONE_LIMBS = bn.int_to_limbs(1, NLIMBS)


# -- host conversions -------------------------------------------------------

def to_limbs(x: int) -> np.ndarray:
    return bn.int_to_limbs(x % P, NLIMBS)


def from_limbs(a) -> int:
    return bn.limbs_to_int(a)


def batch_to_limbs(xs) -> np.ndarray:
    return bn.ints_to_limbs_batch([x % P for x in xs], NLIMBS)


def batch_from_limbs(a) -> list:
    return bn.limbs_to_ints_batch(a)


# -- device ops -------------------------------------------------------------

def add(a, b):
    return bn.add_mod(a, b, P_LIMBS)


def sub(a, b):
    return bn.sub_mod(a, b, P_LIMBS)


def neg(a):
    return bn.sub_mod(jnp.zeros_like(jnp.asarray(a)), a, P_LIMBS)


def mul(a, b):
    return bn.mod_mul(a, b, P_LIMBS, MU_LIMBS)


def sqr(a):
    return bn.mod_mul(a, a, P_LIMBS, MU_LIMBS)


def pow_(a, exp: int):
    return bn.mod_pow(a, exp, P_LIMBS, MU_LIMBS, one=ONE_LIMBS)


def inv(a):
    """Inverse via Fermat (a^(p-2)); inv(0) = 0, matching circom's witness
    convention (lib/circuits/bitify/comparators.circom:11 IsZero)."""
    return bn.mod_pow(a, P - 2, P_LIMBS, MU_LIMBS)


def reduce_overflowed(t):
    """Reduce a (32, *B) overflowed limb tensor mod p (lazy-accumulation
    helper: sum many products, reduce once)."""
    return bn.barrett_reduce(t, P_LIMBS, MU_LIMBS)


# -- predicates / bit ops ---------------------------------------------------

def is_zero(a):
    return bn.is_zero(a)


def eq(a, b):
    return bn.eq(a, b)


def lt(a, b):
    return bn.lt(a, b)


def select(cond, a, b):
    """cond ? a : b with cond shape (*batch,) broadcast over limb axis."""
    return jnp.where(jnp.asarray(cond)[None, ...].astype(bool), a, b)


def to_bits(a, nbits: int):
    """Little-endian bit decomposition -> (nbits, *batch) uint32 in {0,1}.
    Num2Bits analog (lib/circuits/bitify/bitify.circom:10)."""
    a = jnp.asarray(a, dtype=jnp.uint32)
    bits = []
    for i in range(nbits):
        limb, off = divmod(i, bn.W)
        bits.append((a[limb] >> off) & 1)
    return jnp.stack(bits, axis=0)


def from_bits(bits):
    """(nbits, *batch) {0,1} -> (16, *batch) limbs. Bits2Num analog
    (lib/circuits/bitify/bitify.circom:38)."""
    bits = jnp.asarray(bits, dtype=jnp.uint32)
    nbits = bits.shape[0]
    limbs = []
    for limb in range(NLIMBS):
        acc = jnp.zeros(bits.shape[1:], dtype=jnp.uint32)
        for off in range(bn.W):
            i = limb * bn.W + off
            if i < nbits:
                acc = acc | (bits[i] << off)
        limbs.append(acc)
    return jnp.stack(limbs, axis=0)


def const(x: int, batch_shape=()):
    """Broadcast a Python int constant to (16, *batch_shape)."""
    limbs = jnp.asarray(to_limbs(x))
    return jnp.broadcast_to(limbs.reshape((NLIMBS,) + (1,) * len(batch_shape)),
                            (NLIMBS,) + tuple(batch_shape))
