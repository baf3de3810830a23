"""Generic multi-precision modular arithmetic over 16-bit limbs, batched for TPU.

Design (TPU-first, not a port of the reference's circom bignum):

* A k-limb big integer is a uint32 array of shape ``(k, *batch)`` — **limb-major**
  so the batch axis is minor-most and maps onto the 128-wide TPU vector lanes.
  Each limb holds 16 bits (little-endian base 2**16).
* Limb products are exact in uint32; convolution sums stay exact by splitting
  every product into lo/hi 16-bit halves whose diagonal sums are reduced with
  an MXU-friendly one-hot f32 matmul (all values < 2^24, exactly representable).
* Modular reduction is **Barrett** (mu = floor(b^2k / m) precomputed host-side,
  per-instance for RSA moduli) — chosen over word-serial Montgomery REDC
  because it is built from the same batched convolutions (parallel, tiny XLA
  graphs) instead of a k-step sequential update loop.
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

import functools

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
    try:
        raw = x.to_bytes(2 * k, "little")
    except OverflowError:
        raise ValueError(f"{k} limbs too small")
    return np.frombuffer(raw, dtype="<u2").astype(np.uint32)


def limbs_to_int(a) -> int:
    """(k,) limb array (normalized) -> Python int."""
    a = np.asarray(jax.device_get(a))
    if (a <= MASK).all():
        return int.from_bytes(a.astype("<u2").tobytes(), "little")
    return sum(int(v) << (W * i) for i, v in enumerate(a.astype(np.uint64)))


def ints_to_limbs_batch(xs, k: int) -> np.ndarray:
    """list of B ints -> (k, B) uint32 (limb-major batch layout)."""
    return np.stack([int_to_limbs(x, k) for x in xs], axis=-1)


def limbs_to_ints_batch(a) -> list:
    a = np.asarray(jax.device_get(a))
    flat = a.reshape(a.shape[0], -1)
    if (flat <= MASK).all():
        cols = np.ascontiguousarray(flat.T).astype("<u2")
        return [int.from_bytes(row.tobytes(), "little") for row in cols]
    return [sum(int(flat[i, j]) << (W * i) for i in range(a.shape[0]))
            for j in range(flat.shape[1])]


def barrett_mu(mod: int, k: int) -> np.ndarray:
    """Host precompute of the Barrett constant mu = floor(b^2k / mod) as
    (k+1,) limbs. Requires b^(k-1) <= mod < b^k (modulus sized to its limb
    count) so mu fits in k+1 limbs."""
    if not (1 << (W * (k - 1))) <= mod < (1 << (W * k)):
        raise ValueError("modulus must be sized to its limb count")
    return int_to_limbs((1 << (W * 2 * k)) // mod, k + 1)


def barrett_mu_batch(mods, k: int) -> np.ndarray:
    return np.stack([barrett_mu(m, k) for m in mods], axis=-1)


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


def _resolve_carry(g, p):
    """Carry-lookahead: given per-limb generate/propagate bits (disjoint,
    in {0,1}, shape (k, *B)), return (cin (k, *B), carry_out (*B,)) where
    cin_i = g_{i-1} | (p_{i-1} & cin_{i-1}), cin_0 = 0.

    k <= 31: bit-packed into one uint32 lane per batch element; the carries
    of the integer addition G + (G|P) are exactly the lookahead recurrence
    (maj(g, g|p, c) = g | (p & c) for disjoint g, p), so the whole ripple
    collapses to ~10 flat vector ops — no sequential chain, no scan.
    Larger k: log-depth Kogge-Stone on (g, p) pairs."""
    k = g.shape[0]
    bshape = g.shape[1:]
    if k <= 31:
        pw = np.uint32(1) << np.arange(k, dtype=np.uint32)
        pw = pw.reshape((k,) + (1,) * len(bshape))
        G = (g * pw).sum(axis=0, dtype=_u32)
        P = (p * pw).sum(axis=0, dtype=_u32)
        Y = G | P
        S = G + Y
        cmask = S ^ G ^ Y
        shifts = np.arange(k, dtype=np.uint32).reshape(
            (k,) + (1,) * len(bshape))
        cin = (jnp.broadcast_to(cmask, (k,) + cmask.shape) >> shifts) & 1
        return cin, (S >> k) & 1

    def combine(lo, hi):
        gl, pl = lo
        gh, ph = hi
        return gh | (ph & gl), ph & pl
    G, _ = jax.lax.associative_scan(combine, (g, p), axis=0)
    zero_row = jnp.zeros((1,) + bshape, dtype=_u32)
    cin = jnp.concatenate([zero_row, G[:-1]], axis=0)
    return cin, G[-1]


def carry_normalize(t, k_out=None):
    """Propagate carries of an overflowed limb vector (limbs < 2^32).

    t: (m, *batch) uint32 with limb values possibly >= 2^16.
    Returns (k_out, *batch) normalized limbs. High limbs beyond k_out are
    dropped (callers guarantee they carry no value when that matters).

    Constant-depth: one local split pass leaves per-limb carries in {0,1};
    the remaining ripple is resolved with a log-depth carry-lookahead scan.
    """
    t = _as_u32(t)
    m = t.shape[0]
    k_out = k_out or m
    zero_row = jnp.zeros((1,) + t.shape[1:], dtype=_u32)
    # pass 1: local split; w < 2^17 - 1 afterwards
    r = t & MASK
    c = t >> W
    w = r + jnp.concatenate([zero_row, c[:-1]], axis=0)
    carry_top = c[-1]                         # carry out of the top limb
    # pass 2: 0/1 carries via carry-lookahead
    l = w & MASK
    g = w >> W                                # in {0, 1}
    p = (l == MASK).astype(_u32)
    cin, carry_out = _resolve_carry(g, p)
    out = (l + cin) & MASK
    if k_out <= m:
        return out[:k_out]
    # extend with the top carries (each < 2^16: carry_out in {0,1},
    # carry_top only when the caller sized the input with real headroom)
    extra = [(carry_out + carry_top) & MASK]
    carry = (carry_out + carry_top) >> W
    while len(extra) < k_out - m:
        extra.append(carry & MASK)
        carry = carry >> W
    return jnp.concatenate([out, jnp.stack(extra, axis=0)], axis=0)


@functools.lru_cache(maxsize=None)
def _conv_matrix(n: int, m: int):
    """One-hot (n+m, 2*n*m) f32 matrix: the left half sums low product
    halves onto diagonal i+j, the right half sums high halves onto i+j+1 —
    one matmul computes the whole exact convolution. Contraction of
    integer-valued f32 < 2^24 is exact."""
    D = np.zeros((n + m, 2 * n * m), np.float32)
    for i in range(n):
        for j in range(m):
            D[i + j, i * m + j] = 1.0
            D[i + j + 1, n * m + i * m + j] = 1.0
    return D  # numpy on purpose: caching a jnp array can leak tracers


def _poly_mul_direct(a, b):
    """Exact convolution via outer product + one one-hot matmul (n, m <= 32).

    a: (n, *B), b: (m, *B) normalized -> (n+m, *B) overflowed limbs < 2^22.
    """
    n, m = a.shape[0], b.shape[0]
    prod = a[:, None] * b[None, :]                    # (n, m, *B) exact
    bshape = prod.shape[2:]
    flat = prod.reshape(n * m, -1)
    halves = jnp.concatenate([flat & MASK, flat >> W], axis=0)
    out = jax.lax.dot(_conv_matrix(n, m), halves.astype(jnp.float32),
                      precision=jax.lax.Precision.HIGHEST)
    return out.astype(_u32).reshape((n + m,) + bshape)


_BLOCK = 16


def poly_mul(a, b):
    """Exact product of two limb vectors (batched convolution).

    a: (n, *B), b: (m, *B) normalized -> (n+m, *B) *overflowed* limbs
    (< 2^26). Small sizes use one outer-product matmul; large sizes are
    blocked into 16-limb chunks whose chunk-products use the same matmul,
    keeping graphs tiny and f32 sums exact for any RSA size.
    """
    a, b = _as_u32(a), _as_u32(b)
    n, m = a.shape[0], b.shape[0]
    bshape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    a, b = _bcast_limbs(a, bshape), _bcast_limbs(b, bshape)
    if n <= 2 * _BLOCK and m <= 2 * _BLOCK:
        return _poly_mul_direct(a, b)

    def pad_blocks(x):
        k = x.shape[0]
        kb = -(-k // _BLOCK)
        x = jnp.pad(x, [(0, kb * _BLOCK - k)] + [(0, 0)] * (x.ndim - 1))
        # limb i = 16u + L -> [L, u]: block u on a batch-like axis
        return x.reshape((kb, _BLOCK) + bshape).swapaxes(0, 1), kb

    ab, ka = pad_blocks(a)                      # (16, ka, *B)
    bb, kb = pad_blocks(b)
    # all ka*kb chunk products in one shot: (32, ka, kb, *B), entries < 2^22
    prods = _poly_mul_direct(ab[:, :, None], bb[:, None, :])
    # block-level convolution (uint32; sums < 2^22 * 16 = 2^26)
    bc = jnp.zeros((2 * _BLOCK, ka + kb) + bshape, dtype=_u32)
    for u in range(ka):
        bc = bc.at[:, u:u + kb].add(prods[:, u])
    # expand overlapping 32-limb blocks at stride 16 into flat limbs
    out = jnp.zeros(((ka + kb + 1) * _BLOCK,) + bshape, dtype=_u32)
    for d in range(ka + kb):
        out = out.at[d * _BLOCK:(d + 2) * _BLOCK].add(bc[:, d])
    return out[:n + m]

@functools.lru_cache(maxsize=None)
def _static_byte_matrix(c_bytes: tuple, n_limbs: int):
    """(2n + len(c), 2n) f32 matrix with M[i+j, i] = c_bytes[j]: one matmul
    against a byte-split operand computes the full product by a *static*
    constant. Terms are byte*byte < 2^16 with <= 2n per diagonal, so f32
    accumulation is exact."""
    nb = 2 * n_limbs
    mb = len(c_bytes)
    M = np.zeros((nb + mb, nb), np.float32)
    for j, cb in enumerate(c_bytes):
        if cb:
            idx = np.arange(nb)
            M[idx + j, idx] = float(cb)
    return M


def poly_mul_static(a, c_limbs) -> jnp.ndarray:
    """Exact product of a (n, *B) normalized limb vector by a *compile-time*
    constant (m,) limb array. Returns (n+m, *B) overflowed limbs (< 2^30).

    One static-matrix MXU matmul instead of the generic outer-product
    convolution — ~10x fewer FLOPs; used for the Barrett mu/mod products of
    every static-prime reduction (Fr, curve fields)."""
    a = _as_u32(a)
    n = a.shape[0]
    c_limbs = np.asarray(c_limbs, dtype=np.uint32)
    assert c_limbs.ndim == 1
    m = c_limbs.shape[0]
    c_int = sum(int(v) << (W * i) for i, v in enumerate(c_limbs))
    c_bytes = tuple(c_int.to_bytes(2 * m, "little"))
    M = _static_byte_matrix(c_bytes, n)
    bshape = a.shape[1:]
    # byte split, interleaved little-endian: (2n, *B)
    a8 = jnp.stack([a & 0xFF, a >> 8], axis=1).reshape((2 * n,) + bshape)
    flat = a8.reshape(2 * n, -1).astype(jnp.float32)
    c8 = jax.lax.dot(M, flat, precision=jax.lax.Precision.HIGHEST)
    c8 = c8.astype(_u32).reshape((2 * (n + m),) + bshape)
    # recombine base-2^8 diagonal sums into 16-bit-limb positions (u32 exact)
    return c8[0::2] + (c8[1::2] << 8)


@functools.lru_cache(maxsize=None)
def _linmap_matrix(consts_bytes: bytes, m: int, t_in: int, t_out: int,
                   n: int):
    """Block matrix (t_out*(2n+2m), t_in*2n) for a whole static linear map
    sum_j C[j][i] * x_j: block (i, j) is the byte conv matrix of C[j][i]."""
    consts = np.frombuffer(consts_bytes, dtype=np.uint32).reshape(
        m, t_in, t_out)
    rb, cb = 2 * (n + m), 2 * n
    M = np.zeros((t_out * rb, t_in * cb), np.float32)
    for i in range(t_out):
        for j in range(t_in):
            c_int = sum(int(v) << (W * l) for l, v in enumerate(consts[:, j, i]))
            blk = _static_byte_matrix(tuple(c_int.to_bytes(2 * m, "little")), n)
            M[i * rb:(i + 1) * rb, j * cb:(j + 1) * cb] = blk
    return M


def linmap_matrix(consts: np.ndarray, n: int) -> np.ndarray:
    """Public builder: (m, t_in, t_out) constants -> the byte-block matrix
    for `linmap_apply` against n-limb operands. Checks f32 exactness:
    per-diagonal accumulation is t_in * min(2n, 2m) byte products, which
    must stay < 2^24 (t_in <= 8 at n = m = 16)."""
    consts = np.ascontiguousarray(consts, dtype=np.uint32)
    m, t_in, t_out = consts.shape
    assert t_in * min(2 * n, 2 * m) * 65025 < (1 << 24), "f32 exactness"
    return _linmap_matrix(consts.tobytes(), m, t_in, t_out, n)


def linmap_apply(M, state, m: int) -> jnp.ndarray:
    """Apply a byte-block linear-map matrix (static numpy or traced, e.g.
    scanned per-round; entries < 256) of shape (t_out*2(n+m), t_in*2n) to
    state (n, t_in, *B). Returns (n+m, t_out, *B) overflowed limbs."""
    state = _as_u32(state)
    n, t_in = state.shape[0], state.shape[1]
    t_out = M.shape[0] // (2 * (n + m))
    bshape = state.shape[2:]
    s8 = jnp.stack([state & 0xFF, state >> 8], axis=1)      # (n, 2, t_in, *B)
    s8 = s8.reshape((2 * n, t_in) + bshape)
    s8 = jnp.moveaxis(s8, 1, 0).reshape(t_in * 2 * n, -1).astype(jnp.float32)
    c8 = jax.lax.dot(jnp.asarray(M, dtype=jnp.float32), s8,
                     precision=jax.lax.Precision.HIGHEST)
    c8 = c8.astype(_u32).reshape((t_out, 2 * (n + m)) + bshape)
    out = c8[:, 0::2] + (c8[:, 1::2] << 8)                  # (t_out, n+m, *B)
    return jnp.moveaxis(out, 0, 1)


def linmap_static(consts: np.ndarray, state) -> jnp.ndarray:
    """Whole static linear map over limb vectors in ONE MXU matmul.

    consts: (m, t_in, t_out) numpy compile-time constants (limb axis first);
    state: (n, t_in, *B) normalized limbs.
    Returns out[:, i] = sum_j consts[:, j, i] * state[:, j] as
    (n+m, t_out, *B) *overflowed* limbs (follow with a Barrett reduction)."""
    consts = np.ascontiguousarray(consts, dtype=np.uint32)
    return linmap_apply(linmap_matrix(consts, state.shape[0]), state,
                        consts.shape[0])


def sub_limbs(a, b):
    """a - b over normalized limbs. Returns (diff (k, *B) normalized,
    borrow_out (*B,) 0/1). Borrow resolution is log-depth carry-lookahead
    (generate = a_i < b_i, propagate = a_i == b_i)."""
    a, b = _as_u32(a), _as_u32(b)
    bshape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    a, b = _bcast_limbs(a, bshape), _bcast_limbs(b, bshape)
    l = (a - b) & MASK                     # uint32 wraparound is exact
    g = (a < b).astype(_u32)
    p = (a == b).astype(_u32)
    bin_, borrow_out = _resolve_carry(g, p)
    out = (l - bin_) & MASK
    return out, borrow_out


def cond_sub_mod(a, mod_limbs):
    """a - mod if a >= mod else a (for a < 2*mod, normalized)."""
    d, borrow = sub_limbs(a, _as_u32(mod_limbs))
    return jnp.where(borrow.astype(bool), a, d)


def add_mod(a, b, mod_limbs):
    """(a + b) mod m for normalized a, b < m."""
    a, b = _as_u32(a), _as_u32(b)
    s = carry_normalize(a + b, k_out=a.shape[0] + 1)
    mod_ext = _as_u32(mod_limbs)
    mod_ext = jnp.pad(mod_ext, [(0, 1)] + [(0, 0)] * (mod_ext.ndim - 1))
    d, borrow = sub_limbs(s, mod_ext)
    return jnp.where(borrow.astype(bool), s, d)[:a.shape[0]]


def sub_mod(a, b, mod_limbs):
    """(a - b) mod m for normalized a, b < m."""
    d, borrow = sub_limbs(a, b)
    dp = carry_normalize(d + _bcast_limbs(mod_limbs, d.shape[1:]),
                         k_out=d.shape[0])
    return jnp.where(borrow.astype(bool), dp, d)


def barrett_reduce(t, mod_limbs, mu_limbs):
    """Barrett reduction: t mod m for t < b^2k (overflowed limbs accepted).

    t: (2k, *B) possibly-overflowed limbs; mod_limbs: (k,) or (k, *B);
    mu_limbs: (k+1,) or (k+1, *B) = floor(b^2k / m) from `barrett_mu`.
    Returns (k, *B) normalized, < m. The quotient estimate is off by at most
    2, fixed with two conditional subtracts.
    """
    static = (isinstance(mod_limbs, np.ndarray) and mod_limbs.ndim == 1
              and isinstance(mu_limbs, np.ndarray) and mu_limbs.ndim == 1)
    t = _as_u32(t)
    mod_limbs = _as_u32(mod_limbs) if not static else mod_limbs
    k = mod_limbs.shape[0]
    bshape = jnp.broadcast_shapes(t.shape[1:],
                                  mod_limbs.shape[1:] if not static else ())
    x = carry_normalize(_bcast_limbs(t, bshape), k_out=2 * k)
    q1 = x[k - 1:]                                   # floor(x / b^(k-1)), k+1
    if static:
        # compile-time modulus (Fr, curve primes): both Barrett constant
        # products collapse to one static-matrix matmul each
        q2 = carry_normalize(poly_mul_static(q1, mu_limbs), k_out=2 * k + 2)
        q3 = q2[k + 1:]
        r2 = carry_normalize(poly_mul_static(q3, mod_limbs)[:k + 1],
                             k_out=k + 1)
    else:
        q2 = carry_normalize(poly_mul(q1, mu_limbs), k_out=2 * k + 2)
        q3 = q2[k + 1:]                              # k+1 limbs
        r2 = carry_normalize(poly_mul(q3, mod_limbs)[:k + 1], k_out=k + 1)
    mod_limbs = _as_u32(mod_limbs)
    r, _ = sub_limbs(x[:k + 1], r2)                  # mod b^(k+1)
    mod_ext = jnp.pad(_bcast_limbs(mod_limbs, bshape),
                      [(0, 1)] + [(0, 0)] * len(bshape))
    r = cond_sub_mod(r, mod_ext)
    r = cond_sub_mod(r, mod_ext)
    return r[:k]


def mod_mul(a, b, mod_limbs, mu_limbs):
    """(a * b) mod m for normalized a, b < m."""
    return barrett_reduce(poly_mul(a, b), mod_limbs, mu_limbs)


def mod_sqr(a, mod_limbs, mu_limbs):
    return mod_mul(a, a, mod_limbs, mu_limbs)


def mod_pow(a, exp: int, mod_limbs, mu_limbs, one=None):
    """Fixed (compile-time) exponent power — the analog of the reference's
    PowerMod with its exp_to_bits schedule
    (/root/reference/circuits/lib/circuits/bigInt/bigInt.circom:280-340,
    bigIntFunc.circom:590). exp=65537 -> 16 squarings + 1 multiply; long
    exponents (Fermat inversion, scalar mults) run a lax.scan ladder so the
    compiled graph holds ONE square+multiply body.
    """
    if exp < 0:
        raise ValueError("negative exponent")
    if exp == 0:
        if one is None:
            one = int_to_limbs(1, mod_limbs.shape[0])
        return jnp.broadcast_to(_bcast_limbs(one, a.shape[1:]), a.shape)
    bits = bin(exp)[2:]
    if len(bits) <= 24:
        acc = a
        for bit in bits[1:]:
            acc = mod_sqr(acc, mod_limbs, mu_limbs)
            if bit == "1":
                acc = mod_mul(acc, a, mod_limbs, mu_limbs)
        return acc
    bit_arr = jnp.asarray(np.array([c == "1" for c in bits[1:]], dtype=bool))

    def stepfn(acc, bit):
        acc = mod_sqr(acc, mod_limbs, mu_limbs)
        acc = jnp.where(bit, mod_mul(acc, a, mod_limbs, mu_limbs), acc)
        return acc, None

    acc, _ = jax.lax.scan(stepfn, a, bit_arr)
    return acc


def mod_inv_prime(a, mod_int: int, mod_limbs, mu_limbs):
    """Modular inverse via Fermat for a *static prime* modulus (mirror of
    BigModInv semantics, bigInt.circom:344 — the reference computes the
    witness with mod_inv and constrains in*out==1). inv(0) = 0."""
    return mod_pow(a, mod_int - 2, mod_limbs, mu_limbs)


def is_zero(a):
    """Exact zero test of normalized limbs -> bool (*B,)."""
    return jnp.all(_as_u32(a) == 0, axis=0)


def eq(a, b):
    return jnp.all(_as_u32(a) == _as_u32(b), axis=0)


def lt(a, b):
    """a < b for normalized limb vectors -> bool (*B,)."""
    _, borrow = sub_limbs(a, b)
    return borrow.astype(bool)
