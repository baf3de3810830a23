"""Generic multi-precision modular arithmetic over 16-bit limbs, batched for TPU.

Design (TPU-first, not a port of the reference's circom bignum):

* A k-limb big integer is a uint32 array of shape ``(k, *batch)`` — **limb-major**
  so the batch axis is minor-most and maps onto the 128-wide TPU vector lanes.
  Each limb holds 16 bits (little-endian base 2**16).
* All products of two 16-bit limbs fit exactly in uint32; accumulated
  convolution sums are kept exact by splitting every product into lo/hi 16-bit
  halves before accumulation (sums of <= 2**16 terms of 16-bit values < 2**32).
* Reduction is word-by-word Montgomery (REDC, W = 2**16) so the hot path
  (RSA modexp, ECDSA field ops, Poseidon rounds) is carry-cheap and fully
  vectorized over the batch.
* The modulus may be a static numpy array of shape (k,) (compile-time constant,
  e.g. a curve prime) or a traced array (k, *batch) (per-instance RSA moduli,
  mirroring the reference where the pubkey modulus is a circuit *input*:
  /root/reference/circuits/lib/circuits/bigInt/bigInt.circom:206 BigMultModP and
  signatures/rsa.circom:16 take the modulus as a signal).

Capability parity targets (semantics, not structure):
  BigMult/BigMod/BigMultModP/PowerMod/BigModInv/BigAdd/BigSub of
  /root/reference/circuits/lib/circuits/bigInt/bigInt.circom:41-393 and the
  witness-side helpers of bigIntFunc.circom:190-489 (long_div, mod_inv, ...).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

W = 16                      # bits per limb
BASE = 1 << W               # limb radix
MASK = BASE - 1

_u32 = jnp.uint32


# ---------------------------------------------------------------------------
# Host-side helpers (Python ints <-> limb arrays); used by ingestion/tests.
# ---------------------------------------------------------------------------

def nlimbs_for_bits(bits: int) -> int:
    return -(-bits // W)


def int_to_limbs(x: int, k: int) -> np.ndarray:
    """Python int -> (k,) uint32 limb array (little-endian base 2^16)."""
    if x < 0:
        raise ValueError("negative")
    out = np.zeros(k, dtype=np.uint32)
    for i in range(k):
        out[i] = x & MASK
        x >>= W
    if x:
        raise ValueError(f"{k} limbs too small")
    return out


def limbs_to_int(a) -> int:
    """(k,) limb array (any overflow state) -> Python int."""
    a = np.asarray(jax.device_get(a), dtype=np.uint64)
    return sum(int(v) << (W * i) for i, v in enumerate(a))


def ints_to_limbs_batch(xs, k: int) -> np.ndarray:
    """list of B ints -> (k, B) uint32 (limb-major batch layout)."""
    return np.stack([int_to_limbs(x, k) for x in xs], axis=-1)


def limbs_to_ints_batch(a) -> list:
    a = np.asarray(jax.device_get(a))
    flat = a.reshape(a.shape[0], -1)
    return [sum(int(flat[i, j]) << (W * i) for i in range(a.shape[0]))
            for j in range(flat.shape[1])]


def mont_consts(mod: int, k: int):
    """Host precompute of Montgomery constants for modulus `mod` with k limbs.

    Returns (n0, rr, r1): n0 = -mod^-1 mod 2^16 (int),
    rr = R^2 mod `mod` as (k,) limbs (R = 2^(16k)), r1 = R mod `mod` limbs.
    """
    if mod % 2 == 0:
        raise ValueError("Montgomery needs odd modulus")
    n0 = (-pow(mod, -1, BASE)) % BASE
    R = 1 << (W * k)
    return n0, int_to_limbs(R * R % mod, k), int_to_limbs(R % mod, k)


# ---------------------------------------------------------------------------
# Device-side core ops. All arrays uint32 shape (k, *batch), limbs normalized
# (< 2^16) at function boundaries unless stated otherwise.
# ---------------------------------------------------------------------------

def _as_u32(a):
    return jnp.asarray(a, dtype=_u32)


def _bcast_limbs(x, bshape):
    """Broadcast (k,) or (k, *b) limb array to (k, *bshape)."""
    x = _as_u32(x)
    k = x.shape[0]
    x = x.reshape(x.shape + (1,) * (1 + len(bshape) - x.ndim))
    return jnp.broadcast_to(x, (k,) + tuple(bshape))


def carry_normalize(t, k_out=None):
    """Propagate carries of an overflowed limb vector (limbs < 2^32).

    t: (m, *batch) uint32 with limb values possibly >= 2^16.
    Returns (k_out, *batch) normalized limbs (drops/keeps high limbs as sized).
    Sequential 1-step-per-limb scan; m is small & static so this unrolls.
    """
    t = _as_u32(t)
    m = t.shape[0]
    k_out = k_out or m
    carry = jnp.zeros(t.shape[1:], dtype=_u32)
    if m <= _UNROLL_MAX:
        outs = []
        for i in range(m):
            v = t[i] + carry
            outs.append(v & MASK)
            carry = v >> W
    else:
        def f(c, v):
            v = v + c
            return v >> W, v & MASK
        carry, normed = jax.lax.scan(f, carry, t)
        if m >= k_out:
            return normed[:k_out]
        outs = [normed[i] for i in range(m)]
    res = outs[:k_out]
    while len(res) < k_out:
        res.append(carry & MASK)
        carry = carry >> W
    return jnp.stack(res, axis=0)


_UNROLL_MAX = 32  # above this limb count, loops go through lax to bound graphs


def poly_mul(a, b):
    """Exact product of two limb vectors (schoolbook convolution).

    a: (n, *B), b: (m, *B) normalized -> (n+m, *B) *overflowed* limbs
    (each < n*2^16 + n so < 2^32 for n <= 2^15). Value = sum limb_i 2^(16 i).
    """
    a, b = _as_u32(a), _as_u32(b)
    n, m = a.shape[0], b.shape[0]
    bshape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    a, b = _bcast_limbs(a, bshape), _bcast_limbs(b, bshape)
    out = jnp.zeros((n + m,) + bshape, dtype=_u32)
    if n <= _UNROLL_MAX:
        for i in range(n):
            p = a[i] * b                   # (m, *B) exact in uint32
            out = out.at[i:i + m].add(p & MASK)
            out = out.at[i + 1:i + m + 1].add(p >> W)
        return out

    def body(i, out):
        p = jax.lax.dynamic_index_in_dim(a, i, axis=0, keepdims=False) * b
        upd = jnp.concatenate([p & MASK, jnp.zeros((1,) + bshape, _u32)], 0)
        upd = upd.at[1:].add(p >> W)
        win = jax.lax.dynamic_slice_in_dim(out, i, m + 1, axis=0)
        return jax.lax.dynamic_update_slice_in_dim(out, win + upd, i, axis=0)

    return jax.lax.fori_loop(0, n, body, out)


def mont_redc(t, mod_limbs, n0):
    """Word-by-word Montgomery reduction: t * R^-1 mod `mod` (R = 2^(16 k)).

    t: (2k, *B) overflowed limbs (< ~2^25 each), the product a*b.
    mod_limbs: (k,) static numpy or (k, *B) traced, normalized.
    n0: int or (*B,) array: -mod^-1 mod 2^16.
    Returns (k, *B) normalized, value < mod (full conditional subtract).
    """
    t = _as_u32(t)
    mod_limbs = _as_u32(mod_limbs)
    k = mod_limbs.shape[0]
    bshape = jnp.broadcast_shapes(t.shape[1:], mod_limbs.shape[1:])
    t = _bcast_limbs(t, bshape)
    mod_limbs = _bcast_limbs(mod_limbs, bshape)
    n0 = jnp.asarray(n0, dtype=_u32)

    def step(t, i, dynamic):
        """One REDC word-iteration updating positions i..i+k of t."""
        if dynamic:
            win = jax.lax.dynamic_slice_in_dim(t, i, k + 1, axis=0)
        else:
            win = t[i:i + k + 1]
        c = win[0] >> W
        tl = win[0] & MASK
        m = (tl * n0) & MASK                     # (*B,)
        prod = m * mod_limbs                     # (k, *B) exact uint32
        upd = jnp.concatenate(
            [prod & MASK, jnp.zeros((1,) + bshape, _u32)], 0)
        upd = upd.at[1:].add(prod >> W)
        upd = upd.at[0].add(tl - win[0])         # clears high bits of pos i
        upd = upd.at[1].add(c)
        win = win + upd
        # pos i is now ≡ 0 mod 2^16: push its remaining carry up and zero it
        win = win.at[1].add(win[0] >> W).at[0].set(0)
        if dynamic:
            return jax.lax.dynamic_update_slice_in_dim(t, win, i, axis=0)
        return t.at[i:i + k + 1].set(win)

    if k <= _UNROLL_MAX:
        for i in range(k):
            t = step(t, i, dynamic=False)
    else:
        t = jax.lax.fori_loop(0, k, lambda i, t: step(t, i, dynamic=True), t)
    # T/R < 2*mod can exceed R when mod fills all 16k bits (e.g. RSA-2048),
    # so keep one extra carry limb through the conditional subtract.
    res = carry_normalize(t[k:], k_out=k + 1)
    mod_ext = jnp.concatenate(
        [mod_limbs, jnp.zeros((1,) + bshape, _u32)], axis=0)
    return cond_sub_mod(res, mod_ext)[:k]


def sub_limbs(a, b):
    """a - b with borrow chain. Returns (diff (k,*B) normalized, borrow (*B,) 0/1)."""
    a, b = _as_u32(a), _as_u32(b)
    k = a.shape[0]
    bshape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    a, b = _bcast_limbs(a, bshape), _bcast_limbs(b, bshape)
    borrow = jnp.zeros(bshape, dtype=_u32)
    if k <= _UNROLL_MAX:
        outs = []
        for i in range(k):
            v = a[i] + BASE - b[i] - borrow
            outs.append(v & MASK)
            borrow = 1 - (v >> W)
        return jnp.stack(outs, axis=0), borrow

    def f(bor, ab):
        v = ab[0] + BASE - ab[1] - bor
        return 1 - (v >> W), v & MASK
    borrow, outs = jax.lax.scan(f, borrow, jnp.stack([a, b], axis=1))
    return outs, borrow


def cond_sub_mod(a, mod_limbs):
    """a - mod if a >= mod else a (a < 2*mod, normalized)."""
    d, borrow = sub_limbs(a, _as_u32(mod_limbs))
    return jnp.where(borrow.astype(bool), a, d)


def add_mod(a, b, mod_limbs):
    """(a + b) mod m for normalized a, b < m."""
    a, b = _as_u32(a), _as_u32(b)
    s = carry_normalize(a + b, k_out=a.shape[0] + 1)
    d, borrow = sub_limbs(s, jnp.pad(_as_u32(mod_limbs), [(0, 1)] + [(0, 0)] * (mod_limbs.ndim - 1)))
    return jnp.where(borrow.astype(bool), s, d)[:a.shape[0]]


def sub_mod(a, b, mod_limbs):
    """(a - b) mod m for normalized a, b < m."""
    d, borrow = sub_limbs(a, b)
    dp = carry_normalize(d + _bcast_limbs(mod_limbs, d.shape[1:]),
                         k_out=d.shape[0])
    return jnp.where(borrow.astype(bool), dp, d)


def mont_mul(a, b, mod_limbs, n0):
    """Montgomery product: a*b*R^-1 mod m (inputs/outputs normalized, < m)."""
    return mont_redc(poly_mul(a, b), mod_limbs, n0)


def mont_sqr(a, mod_limbs, n0):
    return mont_mul(a, a, mod_limbs, n0)


def to_mont(a, mod_limbs, n0, rr):
    """Enter Montgomery domain: a*R mod m (rr = R^2 mod m)."""
    return mont_mul(a, _as_u32(rr), mod_limbs, n0)


def from_mont(a, mod_limbs, n0):
    """Leave Montgomery domain: a*R^-1 mod m (REDC of a zero-extended)."""
    a = _as_u32(a)
    k = a.shape[0]
    t = jnp.concatenate([a, jnp.zeros_like(a)], axis=0)
    return mont_redc(t, mod_limbs, n0)


def mont_pow(a_mont, exp: int, mod_limbs, n0, one_mont=None):
    """Fixed (compile-time) exponent power in Montgomery domain.

    Square-and-multiply over the static bits of `exp` — the analog of the
    reference's PowerMod with exp_to_bits schedule
    (/root/reference/circuits/lib/circuits/bigInt/bigInt.circom:280-340,
    bigIntFunc.circom:590). exp=65537 -> 16 squarings + 1 multiply.
    """
    if exp < 0:
        raise ValueError("negative exponent")
    if exp == 0:
        if one_mont is None:
            raise ValueError("exp=0 needs one_mont")
        return jnp.broadcast_to(_bcast_limbs(one_mont, a_mont.shape[1:]),
                                a_mont.shape)
    bits = bin(exp)[2:]
    if len(bits) <= 24:
        # short exponents (65537, 3, 37187): static square-and-multiply,
        # skipping multiplies on zero bits — 16+1 mults for 65537.
        acc = a_mont
        for bit in bits[1:]:
            acc = mont_sqr(acc, mod_limbs, n0)
            if bit == "1":
                acc = mont_mul(acc, a_mont, mod_limbs, n0)
        return acc
    # long exponents (Fermat inversion, curve-order scalars): lax.scan ladder
    # so the compiled graph holds ONE square+multiply body, not thousands.
    bit_arr = jnp.asarray(np.array([b == "1" for b in bits[1:]], dtype=bool))

    def stepfn(acc, bit):
        acc = mont_sqr(acc, mod_limbs, n0)
        acc = jnp.where(bit, mont_mul(acc, a_mont, mod_limbs, n0), acc)
        return acc, None

    acc, _ = jax.lax.scan(stepfn, a_mont, bit_arr)
    return acc


def mod_inv_static(a_mont, mod_int: int, mod_limbs, n0):
    """Modular inverse via Fermat for a *static prime* modulus, in Montgomery
    domain (mirror of BigModInv semantics, bigInt.circom:344 — the reference
    computes the witness with mod_inv and constrains in*out==1)."""
    return mont_pow(a_mont, mod_int - 2, mod_limbs, n0)


def is_zero(a):
    """Exact zero test of normalized limbs -> bool (*B,)."""
    return jnp.all(_as_u32(a) == 0, axis=0)


def eq(a, b):
    return jnp.all(_as_u32(a) == _as_u32(b), axis=0)


def lt(a, b):
    """a < b for normalized limb vectors -> bool (*B,)."""
    _, borrow = sub_limbs(a, b)
    return borrow.astype(bool)
