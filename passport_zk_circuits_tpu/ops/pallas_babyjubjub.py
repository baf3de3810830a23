"""Fused Pallas BabyJubJub scalar-multiplication ladder.

The XLA ladder (ops/babyjubjub.scalar_mul) runs 254 lax.scan steps of a
unified extended-coordinate add + double — ~20 modmuls/step, each ~10 XLA
ops, all paying per-op issue overhead (~2 us here): ~100 ms/step of the
flagship. This kernel runs the ENTIRE ladder in ONE pallas_call with the
point state VMEM-resident, reusing the MXU modmul/addition building
blocks of ops/pallas_poseidon (values kept in the redundant [0, 2P)
domain, canonicalized at the end).

Semantics match ops/babyjubjub.scalar_mul exactly (LSB-first double-and-
add over 254 bits, extended twisted-Edwards add-2008-hwcd, identity
(0,1,1,0)) — the capability twin of BabyjubjubBase8Multiplication
(/root/reference/circuits/lib/circuits/babyjubjub/curve.circom:143-206)
and circomlib's BabyPbk. Returns extended (X, Y, Z, T); the caller does
the one affine inversion (fr.inv) outside the kernel.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import field as fr
from . import pallas_field as pf
from . import pallas_poseidon as ppk
from .babyjubjub import A as _A, D as _D

NL = fr.NLIMBS
_P2_EXT = ppk._P2 + (0,)    # 2P as 17+1... (17 limbs)


def _sub_red(a, b):
    """(a - b) with inputs < 2P -> output < 2P: compute (a + 2P) - b,
    then one conditional subtract of 2P. (2P < 2^256 fits 16 limbs.)"""
    s = ppk._carry16(a + pf._const_limbs(ppk._P2[:NL], a.shape[1:]),
                     NL + 1)
    d, _ = ppk._sub_limbs(s, jnp.concatenate(
        [b, jnp.zeros((1,) + b.shape[1:], jnp.uint32)], axis=0))
    d = ppk._cond_sub(d, ppk._P2)         # 17-limb 2P constant
    return d[:NL]


def _add_ext(p, q, c, a_t, d_t):
    """Unified extended-coordinate addition (add-2008-hwcd): 11 modmuls.
    a_t/d_t: curve constants as (16, B) tensors (< 2P)."""
    X1, Y1, Z1, T1 = p
    X2, Y2, Z2, T2 = q
    m = lambda x, y: ppk._modmul(x, y, c)
    Aa = m(X1, X2)
    Bb = m(Y1, Y2)
    Cc = m(m(T1, T2), d_t)
    Dd = m(Z1, Z2)
    E = _sub_red(_sub_red(m(ppk._add_red(X1, Y1), ppk._add_red(X2, Y2)),
                          Aa), Bb)
    F = _sub_red(Dd, Cc)
    G = ppk._add_red(Dd, Cc)
    H = _sub_red(Bb, m(Aa, a_t))
    return (m(E, F), m(G, H), m(F, G), m(E, H))


_MUL_KEYS = ("conv", "mu_m", "mod_m")     # only what _modmul needs in VMEM


def _ladder_kernel(nbits, bits_ref, bx_ref, by_ref, *rest):
    crefs = rest[:len(_MUL_KEYS)]
    ox, oy, oz, ot = rest[-4:]
    c = {k: r[:] for k, r in zip(_MUL_KEYS, crefs)}
    B = bx_ref.shape[1]

    a_t = pf._const_limbs(tuple(int(v) for v in fr.to_limbs(_A)), (B,))
    d_t = pf._const_limbs(tuple(int(v) for v in fr.to_limbs(_D)), (B,))
    zero = jnp.zeros((NL, B), jnp.uint32)
    one = pf._const_limbs((1,) + (0,) * (NL - 1), (B,))

    bx, by = bx_ref[:], by_ref[:]
    base = (bx, by, one, ppk._modmul(bx, by, c))
    acc = (zero, one, one, zero)

    def step(i, st):
        acc, base = st
        added = _add_ext(acc, base, c, a_t, d_t)
        bit = jnp.broadcast_to(bits_ref[pl.ds(i, 1), :], (NL, B)) != 0
        acc = tuple(jnp.where(bit, n, o) for n, o in zip(added, acc))
        base = _add_ext(base, base, c, a_t, d_t)
        return (acc, base)

    acc, _ = jax.lax.fori_loop(0, nbits, step, (acc, base))
    for ref, val in zip((ox, oy, oz, ot), acc):
        ref[:] = ppk._canon(val, c)


@jax.jit
def ladder(bits, base_x, base_y):
    """bits: (nbits, B) u32 in {0,1} (LSB first); base affine (16, B)
    canonical limbs. Returns extended (X, Y, Z, T), canonical (< P)."""
    nbits = bits.shape[0]
    B = base_x.shape[1]
    c = ppk._consts(3)          # only conv/mu_m/mod_m are used
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    sds = jax.ShapeDtypeStruct((NL, B), jnp.uint32)
    return pl.pallas_call(
        functools.partial(_ladder_kernel, nbits),
        out_shape=(sds, sds, sds, sds),
        in_specs=[vmem] * (3 + len(_MUL_KEYS)),
        out_specs=(vmem, vmem, vmem, vmem),
        compiler_params=ppk._params(),
        interpret=pf.interpret_mode(),
    )(jnp.asarray(bits, jnp.uint32),
      jnp.asarray(base_x, jnp.uint32),
      jnp.asarray(base_y, jnp.uint32),
      *[c[k] for k in _MUL_KEYS])
