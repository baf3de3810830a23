"""Fused Pallas RSA modexp: the whole fixed-exponent ladder in ONE kernel.

The XLA path (ops/bignum.mod_pow via blocked conv matmuls) issues ~150
ops per 128-limb modmul and pays per-op overhead 17 times over for
e=65537 — ~54 ms/step of the flagship (tools/profile_flagship.py). This
kernel keeps the 128-limb state, the per-instance modulus and its Barrett
mu VMEM-resident and runs every square/multiply in-kernel on the VPU.

Semantics match bn.mod_pow exactly (PowerMod analog,
/root/reference/circuits/lib/circuits/bigInt/bigInt.circom:280-340):
canonical (< n) inputs and outputs, Barrett with the per-instance
mu = floor(b^2k / n) the ingestion layer precomputes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_field as pf
from . import pallas_poseidon as ppk

MASK = 0xFFFF


def _school_mul(a, b):
    """Exact product of (n, B) x (m, B) normalized limb tensors ->
    (n+m, B) overflowed limbs (< 2^25 for n, m <= 256) — the generic-size
    variant of pallas_field.school_mul."""
    n, m = a.shape[0], b.shape[0]
    tot = n + m + 1
    out = jnp.zeros((tot,) + a.shape[1:], dtype=jnp.uint32)
    for i in range(n):
        p = a[i][None] * b
        out = out + pf._shift_rows(p & MASK, i, tot) \
                  + pf._shift_rows(p >> 16, i + 1, tot)
    return out[:n + m]


def _mod_mul_dyn(a, b, n_limbs, mu_limbs, k: int):
    """(a * b) mod n with per-instance (traced) modulus/mu — in-kernel
    Barrett mirroring bn.barrett_reduce: inputs/outputs canonical."""
    x = ppk._carry16(_school_mul(a, b), 2 * k)
    q1 = x[k - 1:]                                     # (k+1, B)
    q2 = ppk._carry16(_school_mul(q1, mu_limbs), 2 * k + 2)
    q3 = q2[k + 1:]                                    # (k+1, B)
    r2 = ppk._carry16(_school_mul(q3, n_limbs)[:k + 1], k + 1)
    r, _ = ppk._sub_limbs(x[:k + 1], r2)
    n_ext = jnp.concatenate(
        [n_limbs, jnp.zeros((1,) + n_limbs.shape[1:], jnp.uint32)], axis=0)
    for _ in range(2):
        d, borrow = ppk._sub_limbs(r, n_ext)
        r = jnp.where(borrow.astype(bool), r, d)
    return r[:k]


def _pow_kernel(exp, k, sig_ref, n_ref, mu_ref, out_ref):
    sig = sig_ref[:]
    n = n_ref[:]
    mu = mu_ref[:]
    bits = bin(exp)[2:]
    if len(bits) <= 6:
        # tiny exponents (e = 3): fully unrolled
        acc = sig
        for bit in bits[1:]:
            acc = _mod_mul_dyn(acc, acc, n, mu, k)
            if bit == "1":
                acc = _mod_mul_dyn(acc, sig, n, mu, k)
    elif (exp - 1) & (exp - 2) == 0:
        # 2^m + 1 (e = 65537): m squarings in a fori_loop (ONE square
        # body in the Mosaic kernel) + one multiply
        acc = jax.lax.fori_loop(
            0, len(bits) - 1, lambda i, x: _mod_mul_dyn(x, x, n, mu, k),
            sig)
        acc = _mod_mul_dyn(acc, sig, n, mu, k)
    else:
        # general fixed exponent (e = 37187): square always, multiply
        # under a per-step select — two bodies in one fori_loop.
        # NOTE: dynamic_slice on a value is interpret-mode-only (Mosaic
        # lacks it); ops/rsa only routes (3, 65537) to hardware.
        B = sig.shape[1]
        bit_rows = jnp.concatenate(
            [jnp.full((1, B), int(c), jnp.uint32) for c in bits[1:]],
            axis=0)

        def step(i, x):
            x = _mod_mul_dyn(x, x, n, mu, k)
            m = _mod_mul_dyn(x, sig, n, mu, k)
            bit = jnp.broadcast_to(
                jax.lax.dynamic_slice_in_dim(bit_rows, i, 1, 0),
                (k, B)) != 0
            return jnp.where(bit, m, x)

        acc = jax.lax.fori_loop(0, len(bits) - 1, step, sig)
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("exp",))
def pow_mod(sig, n_limbs, mu_limbs, exp: int):
    """sig^exp mod n, all (k, B) 16-bit limb tensors (mu: (k+1, B)).
    Whole ladder in one pallas_call."""
    sig = jnp.asarray(sig, jnp.uint32)
    k = sig.shape[0]
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_pow_kernel, exp, k),
        out_shape=jax.ShapeDtypeStruct(sig.shape, jnp.uint32),
        in_specs=[vmem, vmem, vmem],
        out_specs=vmem,
        compiler_params=ppk._params(),
        interpret=pf.interpret_mode(),
    )(sig, jnp.asarray(n_limbs, jnp.uint32),
      jnp.asarray(mu_limbs, jnp.uint32))
