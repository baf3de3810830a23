"""Pallas TPU kernels for BN254 Fr arithmetic — fused VMEM-resident hot loops.

The XLA formulation in ops/bignum.py builds every modmul from ~10 separate
ops (one-hot conv matmul + Barrett matmuls + carry lookaheads); for the
witness program's long sequential chains (80-level SMT climb, 254-step
BabyJubJub ladder, 65-round Poseidon permutations) the per-op overhead and
HBM round-trips dominate. These kernels keep the limb state in
VMEM/registers and run whole loops in-kernel on the VPU.

Building blocks (plain jnp, usable inside kernels and in interpret mode):

* ``school_mul(a, b)``      exact 16x16-limb schoolbook product, u32 lanes
* ``school_mul_static``     product by a compile-time constant (unrolled)
* ``barrett_static(t)``     t mod P for BN254 Fr, static Barrett constants
* ``modmul(a, b)``          fused (a*b) mod P

Semantics match ops/field.py exactly (same limb layout: (16, B) uint32,
16-bit little-endian limbs); tests assert bit-equality against the XLA
path, which itself is oracle-checked against Python ints (the reference's
BigMultModP semantics, /root/reference/circuits/lib/circuits/bigInt/
bigInt.circom:206-272).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import bignum as bn
from . import field as fr

MASK = 0xFFFF                        # Python int: folds to an immediate
NL = fr.NLIMBS                       # 16

_P_INT = fr.P
_P = tuple(int(v) for v in fr.P_LIMBS)            # 16 limbs
_MU = tuple(int(v) for v in fr.MU_LIMBS)          # 17 limbs


def interpret_mode() -> bool:
    """Pallas kernels compile only on TPU; CPU tests run interpreted."""
    return jax.default_backend() != "tpu"


def _verified_marker_path():
    import os
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), ".pallas_verified")


def use_pallas() -> bool:
    """Route hot ops through the fused Pallas kernels?

    PZK_PALLAS=1 forces on (incl. CPU interpret — only useful for parity
    tests; interpret mode is far slower than the XLA path), PZK_PALLAS=0
    forces off. Default: on real TPU only when the `.pallas_verified`
    marker exists at the repo root. The marker is written exclusively by
    `tools/verify_pallas_tpu.py`, which runs every fused kernel on the
    actual chip under a timeout and bit-checks it against the XLA path.

    Rationale: round 3 shipped kernels that passed CPU-interpret tests but
    failed Mosaic compilation on the real chip (`unsupported shape cast`),
    breaking the flagship on the only real hardware — and a Mosaic compile
    can also hang, so an in-process probe is not a safe gate. The default
    path therefore never routes through a kernel that has not been
    positively verified on this hardware. The marker is machine-local
    (gitignored) and records the device kind it was verified on; a
    different TPU generation does not inherit it."""
    import os
    env = os.environ.get("PZK_PALLAS")
    if env is not None:
        return env != "0"
    if jax.default_backend() != "tpu":
        return False
    try:
        with open(_verified_marker_path()) as f:
            marker = f.read()
    except OSError:
        return False
    # "verified <ts> on <device kind> by tools/verify_pallas_tpu.py"
    if " on " not in marker or " by " not in marker:
        return False
    kind = marker.split(" on ", 1)[1].split(" by ", 1)[0].strip()
    return kind == jax.devices()[0].device_kind


# ---------------------------------------------------------------------------
# jnp building blocks (kernel-safe: no host callbacks, static shapes)
# ---------------------------------------------------------------------------

def _shift_rows(x, start: int, total: int):
    """Place the rows of x at row offset `start` in a `total`-row tensor
    (zero elsewhere) — the kernel-safe substitute for .at[start:].add
    (Mosaic has no scatter-add)."""
    below = total - start - x.shape[0]
    pads = [(start, below)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pads)


def school_mul(a, b):
    """Exact product of two (16, B) normalized limb tensors -> (32, B)
    overflowed limbs (< 2^21). Unrolled schoolbook: 16 row-broadcast
    multiplies with lo/hi split accumulation — pure VPU u32 work."""
    nb = b.shape[0]
    tot = NL + nb + 1
    out = jnp.zeros((tot,) + a.shape[1:], dtype=jnp.uint32)
    for i in range(NL):
        p = a[i][None] * b                       # (nb, B) exact u32
        out = out + _shift_rows(p & MASK, i, tot) \
                  + _shift_rows(p >> 16, i + 1, tot)
    return out[:NL + nb]


def school_mul_static(a, c_limbs, n_out=None):
    """Exact product of (n, B) limbs by a static limb tuple. Unrolled over
    the nonzero constant limbs only."""
    n = a.shape[0]
    m = len(c_limbs)
    n_out = n_out or (n + m)
    tot = n + m + 1
    out = jnp.zeros((tot,) + a.shape[1:], dtype=jnp.uint32)
    for j, cj in enumerate(c_limbs):
        if not cj:
            continue
        p = a * jnp.uint32(cj)                   # (n, B) < 2^32 exact
        out = out + _shift_rows(p & MASK, j, tot) \
                  + _shift_rows(p >> 16, j + 1, tot)
    return out[:n_out]


def _const_limbs(limbs, bshape):
    """Static limb tuple -> (k, *bshape) u32 tensor from immediates only
    (Pallas kernels may not capture trace-time array constants)."""
    return jnp.stack([jnp.full(bshape, int(v), jnp.uint32) for v in limbs],
                     axis=0)


def _resolve_carry(g, p):
    """Kernel-safe bit-packed carry lookahead for ANY k, immediates only.
    Same math as ops/bignum._resolve_carry (carries of G + (G|P) ARE the
    lookahead recurrence for disjoint generate/propagate bits), processed in
    30-row chunks: each chunk packs its bits at positions 1..kk with the
    incoming chunk carry as a virtual generate bit at position 0, so the
    cross-chunk ripple threads through exactly. (A single u32 pack silently
    drops bits for k > 31 — a 2^-16-per-row soft error.)"""
    k = g.shape[0]
    CH = 30
    cin_rows = []
    carry = None                                   # (B,) u32 in {0,1}
    for s in range(0, k, CH):
        kk = min(k, s + CH) - s
        G = g[s] << 1
        Pk = p[s] << 1
        for i in range(1, kk):
            G = G | (g[s + i] << (i + 1))
            Pk = Pk | (p[s + i] << (i + 1))
        if carry is not None:
            G = G | carry                          # virtual generate @ bit 0
        Y = G | Pk
        S = G + Y
        cmask = S ^ G ^ Y
        # cin of row s+i = carry into packed bit i+1
        cin_rows.extend([(cmask >> (i + 1)) & 1 for i in range(kk)])
        carry = (S >> (kk + 1)) & 1
    return jnp.stack(cin_rows, axis=0), carry


def _carry16(t, k_out):
    """Carry-normalize overflowed limbs (< 2^31 headroom) to 16-bit limbs.
    Mirrors ops/bignum.carry_normalize's k<=31 path with unrolled packing."""
    m = t.shape[0]
    zero_row = jnp.zeros((1,) + t.shape[1:], jnp.uint32)
    r = t & MASK
    c = t >> 16
    w = r + jnp.concatenate([zero_row, c[:-1]], axis=0)
    carry_top = c[m - 1]        # NOT c[-1]: Mosaic lowers negative indexing
                                # through dynamic_slice, which it lacks
    l = w & MASK
    g = w >> 16                                   # in {0, 1}
    p = (l == MASK).astype(jnp.uint32)
    cin, carry_out = _resolve_carry(g, p)
    out = (l + cin) & MASK
    if k_out <= m:
        return out[:k_out]
    extra = [(carry_out + carry_top) & MASK]
    carry = (carry_out + carry_top) >> 16
    while len(extra) < k_out - m:
        extra.append(carry & MASK)
        carry = carry >> 16
    return jnp.concatenate([out, jnp.stack(extra, axis=0)], axis=0)


def _sub_limbs(a, b):
    """a - b over normalized limbs -> (diff, borrow_out)."""
    l = (a - b) & MASK
    g = (a < b).astype(jnp.uint32)
    p = (a == b).astype(jnp.uint32)
    bin_, borrow_out = _resolve_carry(g, p)
    return (l - bin_) & MASK, borrow_out


def barrett_static(t):
    """t (32, B) overflowed -> t mod P, (16, B) normalized. Static BN254
    Barrett: both constant products are unrolled schoolbook muls."""
    k = NL
    x = _carry16(t, 2 * k)
    q1 = x[k - 1:]                               # (17, B)
    q2 = _carry16(school_mul_static(q1, _MU), 2 * k + 2)
    q3 = q2[k + 1:]                              # (17, B)
    r2 = _carry16(school_mul_static(q3, _P, n_out=k + 1), k + 1)
    r, _ = _sub_limbs(x[:k + 1], r2)
    p_ext = _const_limbs(_P + (0,), r.shape[1:])
    d, borrow = _sub_limbs(r, p_ext)
    r = jnp.where(borrow.astype(bool), r, d)
    d, borrow = _sub_limbs(r, p_ext)
    r = jnp.where(borrow.astype(bool), r, d)
    return r[:k]


def modmul(a, b):
    """(a * b) mod P on (16, B) limbs — fused schoolbook + Barrett."""
    return barrett_static(school_mul(a, b))


def modsqr(a):
    return modmul(a, a)


def addmod(a, b):
    """(a + b) mod P, both < P."""
    s = _carry16(a + b, NL + 1)
    d, borrow = _sub_limbs(s, _const_limbs(_P + (0,), s.shape[1:]))
    return jnp.where(borrow.astype(bool), s, d)[:NL]


def submod(a, b):
    d, borrow = _sub_limbs(a, b)
    dp = _carry16(d + _const_limbs(_P, d.shape[1:]), NL)
    return jnp.where(borrow.astype(bool), dp, d)


# ---------------------------------------------------------------------------
# Single-mul pallas_call wrapper (microbench / parity tests)
# ---------------------------------------------------------------------------

def _mul_kernel(a_ref, b_ref, o_ref):
    o_ref[:] = modmul(a_ref[:], b_ref[:])


@functools.partial(jax.jit, static_argnames=())
def mul(a, b):
    """Pallas (a * b) mod P. a, b: (16, B) uint32 normalized."""
    a = jnp.asarray(a, jnp.uint32)
    b = jnp.broadcast_to(jnp.asarray(b, jnp.uint32), a.shape)
    return pl.pallas_call(
        _mul_kernel,
        out_shape=jax.ShapeDtypeStruct(a.shape, jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret_mode(),
    )(a, b)


def _mul_chain_kernel(n, a_ref, c_ref, o_ref):
    c = c_ref[:]
    o_ref[:] = jax.lax.fori_loop(
        0, n, lambda i, x: modmul(x, c), a_ref[:])


@functools.partial(jax.jit, static_argnames=("n",))
def mul_chain(a, c, n: int):
    """n sequential (x * c) mod P steps in ONE kernel, state VMEM-resident
    (micro-benchmark of the true in-kernel modmul cost; also the shape of
    the fused mod-pow ladder)."""
    a = jnp.asarray(a, jnp.uint32)
    c = jnp.broadcast_to(jnp.asarray(c, jnp.uint32), a.shape)
    return pl.pallas_call(
        functools.partial(_mul_chain_kernel, n),
        out_shape=jax.ShapeDtypeStruct(a.shape, jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret_mode(),
    )(a, c)
