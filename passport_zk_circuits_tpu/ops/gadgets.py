"""Batched equivalents of the reference's small stdlib gadget circuits.

Capability map (semantics, not circom structure):
  * Switcher (lib/circuits/utils/switcher.circom:16) -> `switcher`
  * comparators (lib/circuits/bitify/comparators.circom: IsZero/IsEqual/
    LessThan/LessEqThan/GreaterThan/GreaterEqThan) -> field.py predicates +
    `force_equal_if_enabled`
  * bit gates (lib/circuits/bitify/bitGates.circom, 16 two-input gates and
    vector Xor2) -> plain jnp bitwise ops on {0,1} tensors; `xor2`
  * BinSum (lib/circuits/bitify/operations.circom:9) -> `bin_sum`
  * sort (lib/circuits/sort/nonSignalSort.circom:17 NonSignalSort — sort as
    an unconstrained hint + sortedness/multiset checks; heapSort.circom) ->
    `sort_checked` (batched sort + the same two verification predicates)
  * matrix (lib/circuits/matrix/matrix.circom: multiply/scalar/hadamard/
    add/transpose) -> `mat_*` over Fr with lazy accumulation
  * float (lib/circuits/float/float.circom: fixed-point with precision n,
    FloatMult floors a*b/2^n, CutPrecision) -> `float_mult`, `cut_precision`
  * int/arithmetic (lib/circuits/int/arithmetic.circom: Inverse, Division)
    -> field.inv and `div_strict`

The reference's dstu/binField.circom GF(2^163) template is dead code (its
main template is commented out) and intentionally not reproduced.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import field as fr
from . import bignum as bn


def switcher(sel, a, b):
    """(outL, outR) = (b, a) if sel else (a, b)."""
    return fr.select(sel, b, a), fr.select(sel, a, b)


def force_equal_if_enabled(enabled, x, y):
    """Predicate form of ForceEqualIfEnabled: holds iff !enabled or x==y."""
    return ~jnp.asarray(enabled, bool) | fr.eq(x, y)


def xor2(a, b):
    """Vector XOR over {0,1} tensors (bitGates.circom Xor2)."""
    return a ^ b


def bin_sum(bit_tensors):
    """Sum of k bit-vectors -> bit vector of the sum (BinSum analog).
    bit_tensors: list of (n, *B) {0,1}; returns (n + ceil(log2(k)), *B)."""
    acc = None
    for t in bit_tensors:
        v = fr.from_bits(t)
        acc = v if acc is None else bn.carry_normalize(
            jnp.asarray(acc) + jnp.asarray(v), k_out=fr.NLIMBS)
    n = bit_tensors[0].shape[0]
    import math
    extra = max(1, math.ceil(math.log2(max(len(bit_tensors), 2))))
    return fr.to_bits(acc, n + extra)


def sort_checked(values, descending: bool = False):
    """NonSignalSort semantics: produce the sorted sequence plus the two
    predicates the reference constrains — sortedness and multiset equality.

    values: (n, 16, *B) Fr limbs (small ints in practice). Returns
    (sorted_values, is_sorted (*B,), is_permutation (*B,))."""
    n = values.shape[0]
    # lexicographic sort on the low 4 limbs (values fit 64 bits, like the
    # reference's BITS-bounded inputs); x64 mode is off so no u64 keys
    keys = [values[:, j] for j in range(4)]          # each (n, *B)
    order = jnp.lexsort(keys, axis=0)                # last key = primary
    if descending:
        order = jnp.flip(order, axis=0)
    sorted_vals = jnp.take_along_axis(values, order[:, None], axis=0)
    # sortedness predicate via limb-wise compares (what the circuit checks)
    if descending:
        ok_sorted = jnp.stack([~bn.lt(sorted_vals[i], sorted_vals[i + 1])
                               for i in range(n - 1)]).all(axis=0)
    else:
        ok_sorted = jnp.stack([~bn.lt(sorted_vals[i + 1], sorted_vals[i])
                               for i in range(n - 1)]).all(axis=0)
    # the gather by argsort is a permutation by construction; the multiset
    # predicate (the reference's second check) is therefore identically true
    ok_perm = jnp.ones_like(ok_sorted, dtype=bool)
    return sorted_vals, ok_sorted, ok_perm


# -- matrices over Fr --------------------------------------------------------

def mat_mul(A, B):
    """(n, m, 16, *B) @ (m, q, 16, *B) -> (n, q, 16, *B) over Fr with lazy
    accumulation + one reduction per output (MatrixMultiply analog)."""
    n, m = A.shape[0], A.shape[1]
    q = B.shape[1]
    outs = []
    for i in range(n):
        # products of row i with all columns at once
        prods = bn.poly_mul(jnp.moveaxis(A[i][:, None], 2, 0),
                            jnp.moveaxis(B, 2, 0))        # (32, m, q, *B)
        acc = prods.sum(axis=1)                           # (32, q, *B)
        outs.append(fr.reduce_overflowed(acc))            # (16, q, *B)
    return jnp.stack([jnp.moveaxis(o, 0, 1) for o in outs], axis=0)


def mat_add(A, B):
    return jnp.stack([jnp.stack([
        fr.add(A[i, j], B[i, j])
        for j in range(A.shape[1])]) for i in range(A.shape[0])])


def mat_transpose(A):
    return jnp.swapaxes(A, 0, 1)


def mat_hadamard(A, B):
    return jnp.stack([jnp.stack([
        fr.mul(A[i, j], B[i, j]) for j in range(A.shape[1])])
        for i in range(A.shape[0])])


# -- fixed-point ("float") ---------------------------------------------------

def cut_precision(x_bits_value, prec_old: int, prec_new: int):
    """floor(x / 2^(prec_old - prec_new)) on Fr limb values known to fit 64
    bits (CutPrecision analog, float.circom:126)."""
    shift = prec_old - prec_new
    # operate in limb space: shift right by `shift` bits
    full, off = divmod(shift, 16)
    limbs = x_bits_value
    if full:
        limbs = jnp.concatenate(
            [limbs[full:], jnp.zeros_like(limbs[:full])], axis=0)
    if off:
        lo = limbs >> off
        hi = jnp.concatenate([limbs[1:], jnp.zeros_like(limbs[:1])],
                             axis=0) << (16 - off)
        limbs = (lo | hi) & bn.MASK
    return limbs


def float_mult(a, b, n: int):
    """Fixed-point multiply with flooring: floor(a*b / 2^n)
    (FloatMult analog, float.circom:21). Values must stay below 2^(254-n)."""
    prod = fr.mul(a, b)
    return cut_precision(prod, 2 * n, n)
