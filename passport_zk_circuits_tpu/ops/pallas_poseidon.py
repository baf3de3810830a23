"""Fused Pallas Poseidon kernels — permutation and whole-SMT-climb.

Measured execution model of this environment (tools/microbench_kernel.py):
every XLA op costs ~2 us of issue overhead, every pallas_call has a fixed
~8 ms invocation cost, and *in-kernel* ops cost ~65-150 ns with cost flat
in tensor width (up to ~256K elements). The XLA Poseidon (ops/poseidon.py,
~45 ops/round) therefore runs one t=3 permutation in ~6.5 ms and the
80-level SMT climb in ~520 ms/step; in-kernel ops are ~25x cheaper — but
only when whole loops share ONE pallas_call.

So this module provides:
  * ``poseidon_ex``  — one permutation per pallas_call (t = 2..8; t = 9
    would break the f32-exactness bound of the static MDS byte matmul,
    bn.linmap_matrix's t_in*min(2n,2m)*65025 < 2^24 assert — same cap as
    the XLA path's linmap_static)
  * ``smt_climb``    — the ENTIRE N-level climb (N inlined t=3
    permutations under an in-kernel fori_loop) in one pallas_call

Semantics are identical to ops/poseidon.poseidon_ex / ops/smt.verify
(circomlib schedule; reference /root/reference/circuits/lib/circuits/
hasher/poseidon/poseidon.circom:80-211 and merkleTree/SMTVerifier.circom).
Outputs are canonical (< P) and bit-equal to the XLA path, which is
oracle-tested against test/poseidon.js vectors.

Internal representation: 16x16-bit little-endian limbs, values kept in the
redundant range [0, 2P) between operations (one conditional subtract by 2P
per reduction instead of two by P; multiplication and addition are
congruence-compatible), canonicalized once at the end. Limb-product
convolutions and the static Barrett/MDS products ride the MXU as f32
matmuls (integer-valued < 2^24 at HIGHEST precision — exact). Round
constants that are indexed by a loop counter live in VMEM refs and are
sliced with pl.ds (Mosaic has no value-level dynamic_slice).
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
from . import poseidon as pos
from . import pallas_field as pf

NL = fr.NLIMBS                 # 16
MASK = 0xFFFF

_F32 = jnp.float32
_HI = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# Host-side constant packs (per t), all passed to the kernel as inputs
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _conv_mtx() -> np.ndarray:
    """(32, 512) one-hot conv matrix for 16x16-limb products (f32-exact)."""
    return bn._conv_matrix(NL, NL)


@functools.lru_cache(maxsize=None)
def _barrett_mtxs():
    """Byte matrices for the two static Barrett products: x Mu and x P
    (17-limb operands)."""
    mu_int = sum(int(v) << (16 * i) for i, v in enumerate(fr.MU_LIMBS))
    mu_m = bn._static_byte_matrix(tuple(mu_int.to_bytes(34, "little")), 17)
    mod_m = bn._static_byte_matrix(tuple(fr.P.to_bytes(32, "little")), 17)
    return mu_m, mod_m                     # (68, 34), (66, 34)


_P2 = tuple(int(v) for v in bn.int_to_limbs(2 * fr.P, 17))   # 2P, 17 limbs


@functools.lru_cache(maxsize=None)
def _consts(t: int):
    """Kernel-input constant pack for width t (numpy, f32/u32)."""
    c = pos._consts(t)
    nP = c["cp"].shape[0]

    def linmat(consts_l_tin_tout):
        return bn.linmap_matrix(np.ascontiguousarray(consts_l_tin_tout), NL)

    s0mat = np.concatenate(
        [linmat(c["s0"][r][:, :, None]) for r in range(nP)], axis=0)
    s1mat = np.concatenate(
        [linmat(c["s1"][r][:, None, :]) for r in range(nP)], axis=0)
    ark = c["ark"].transpose(0, 2, 1).reshape(5 * t * NL, 1)
    ark2 = c["ark2"].transpose(0, 2, 1).reshape(3 * t * NL, 1)
    cp = c["cp"].reshape(nP * NL, 1)
    return {
        "nP": nP,
        "conv": _conv_mtx().astype(np.float32),
        "mu_m": _barrett_mtxs()[0].astype(np.float32),
        "mod_m": _barrett_mtxs()[1].astype(np.float32),
        "m_mat": linmat(c["m"]).astype(np.float32),      # (t*64, t*32)
        "p_mat": linmat(c["p"]).astype(np.float32),
        "s0mat": s0mat.astype(np.float32),               # (nP*64, t*32)
        "s1mat": s1mat.astype(np.float32),               # (nP*(t-1)*64, 32)
        "ark": np.ascontiguousarray(ark, np.uint32),
        "ark2": np.ascontiguousarray(ark2, np.uint32),
        "cp": np.ascontiguousarray(cp, np.uint32),
    }


# constants loaded as values vs. kept as refs (loop-indexed)
_VAL_KEYS = ("conv", "mu_m", "mod_m", "m_mat", "p_mat", "ark", "ark2")
_REF_KEYS = ("cp", "s0mat", "s1mat")
_CONST_KEYS = _VAL_KEYS + _REF_KEYS


# ---------------------------------------------------------------------------
# In-kernel field helpers (jnp on values; kernel-safe, vectorized op counts)
# ---------------------------------------------------------------------------

def _iota_rows(k, shape):
    return jax.lax.broadcasted_iota(jnp.uint32, (k,) + tuple(shape[1:]), 0)


def _resolve_carry_v(g, p):
    """Vectorized carry lookahead (any k): row-packed via iota weights,
    ~12 ops per 30-row chunk. Same recurrence as ops/bignum._resolve_carry,
    with the incoming chunk carry as a virtual generate bit at packed
    position 0 so the cross-chunk ripple threads exactly."""
    k = g.shape[0]
    CH = 30
    cins = []
    carry = None
    for s in range(0, k, CH):
        kk = min(k, s + CH) - s
        gi, pi = g[s:s + kk], p[s:s + kk]
        sh = _iota_rows(kk, gi.shape) + 1
        # Mosaic lacks unsigned reductions; sum in i32 (values < 2^31)
        G = jnp.sum((gi << sh).astype(jnp.int32),
                    axis=0).astype(jnp.uint32)
        Pk = jnp.sum((pi << sh).astype(jnp.int32),
                     axis=0).astype(jnp.uint32)
        if carry is not None:
            G = G | carry
        Y = G | Pk
        S = G + Y
        cmask = (S ^ G ^ Y)[None]
        cins.append((jnp.broadcast_to(cmask, gi.shape) >> sh) & 1)
        carry = (S >> (kk + 1)) & 1
    cin = cins[0] if len(cins) == 1 else jnp.concatenate(cins, axis=0)
    return cin, carry


def _carry16(t, k_out):
    """Carry-normalize overflowed limbs (< 2^31) to 16-bit limbs."""
    m = t.shape[0]
    zero_row = jnp.zeros((1,) + t.shape[1:], jnp.uint32)
    r = t & MASK
    c = t >> 16
    w = r + jnp.concatenate([zero_row, c[:m - 1]], axis=0)
    carry_top = c[m - 1]
    l = w & MASK
    g = w >> 16
    p = (l == MASK).astype(jnp.uint32)
    cin, carry_out = _resolve_carry_v(g, p)
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
    l = (a - b) & MASK
    g = (a < b).astype(jnp.uint32)
    p = (a == b).astype(jnp.uint32)
    bin_, borrow_out = _resolve_carry_v(g, p)
    return (l - bin_) & MASK, borrow_out


def _cond_sub(r, const_limbs):
    """r - C if r >= C else r (per batch element)."""
    d, borrow = _sub_limbs(r, pf._const_limbs(const_limbs, r.shape[1:]))
    return jnp.where(borrow.astype(bool), r, d)


def _bytes_of(x):
    """(n, *B) 16-bit limbs -> (2n, *B) interleaved lo/hi bytes as f32.
    (Mosaic has no u32->f32 cast; hop through i32 — values < 2^31, exact.)"""
    n = x.shape[0]
    b = jnp.stack([x & 0xFF, x >> 8], axis=1)
    return b.reshape((2 * n,) + x.shape[1:]).astype(jnp.int32).astype(_F32)


def _limbs_of(c8):
    """(2n, *B) f32 byte-diagonal sums -> (n, *B) u32 overflowed limbs."""
    u = c8.astype(jnp.int32).astype(jnp.uint32)
    u = u.reshape((c8.shape[0] // 2, 2) + c8.shape[1:])
    return u[:, 0] + (u[:, 1] << 8)


def _dot(m, x):
    """m @ x over x's leading axis. Rank-3 x (rows, t, B) is unrolled into
    t rank-2 dots: Mosaic rejects reshapes that merge the minor (lane) dim
    — the exact `unsupported shape cast` that broke round 3 on the chip
    (verified by tools/probe_mosaic.py: reshape_merge_major on the leading
    dims passes, flattening (t, B) -> (t*B,) does not)."""
    if x.ndim == 2:
        return jax.lax.dot(m, x, precision=_HI)
    assert x.ndim == 3
    cols = [jax.lax.dot(m, x[:, j], precision=_HI)
            for j in range(x.shape[1])]
    return jnp.stack(cols, axis=1)


def _barrett2p(t32, c):
    """(32, *B) overflowed -> (16, *B) in [0, 2P). One cond-sub by 2P.

    For inputs x < 4P^2 (products of [0,2P) values) the Barrett quotient
    estimate is off by at most 2, so x - q3*P < 3P; one conditional
    subtract of 2P brings it under 2P (3P < 2^256 fits 16 limbs)."""
    x = _carry16(t32, 2 * NL)
    q1 = x[NL - 1:]
    q2 = _carry16(_limbs_of(_dot(c["mu_m"], _bytes_of(q1))), 2 * NL + 2)
    q3 = q2[NL + 1:]
    r2 = _carry16(_limbs_of(_dot(c["mod_m"], _bytes_of(q3)))[:NL + 1],
                  NL + 1)
    r, _ = _sub_limbs(x[:NL + 1], r2)          # < 3P (17 limbs)
    r = _cond_sub(r, _P2)                      # < 2P
    return r[:NL]


def _canon(x16, c):
    """[0, 2P) 16-limb values -> canonical < P (two cond-subs by P)."""
    ext = jnp.concatenate(
        [x16, jnp.zeros((1,) + x16.shape[1:], jnp.uint32)], axis=0)
    ext = _cond_sub(ext, pf._P + (0,))
    ext = _cond_sub(ext, pf._P + (0,))
    return ext[:NL]


def _modmul(a, b, c):
    """(a*b) mod-ish P on (16, *B) limbs: inputs < 2P, output < 2P.
    *B may be multi-dim (e.g. (t, B)) — one whole-tensor op chain."""
    p = a[:, None] * b[None]                       # (16, 16, *B) exact u32
    lo = (p & MASK).reshape((256,) + p.shape[2:])
    hi = (p >> 16).reshape((256,) + p.shape[2:])
    halves = jnp.concatenate([lo, hi], axis=0)     # (512, *B)
    t32 = _dot(c["conv"], halves.astype(jnp.int32).astype(_F32))
    return _barrett2p(t32.astype(jnp.int32).astype(jnp.uint32), c)


def _sigma(x, c):
    """x^5 (congruence-preserving, [0,2P) in/out)."""
    x2 = _modmul(x, x, c)
    x4 = _modmul(x2, x2, c)
    return _modmul(x4, x, c)


def _add_red(a, b):
    """a + b with one cond-sub by 2P: inputs < 2P -> output < 2P."""
    n = a.shape[0]
    s = _carry16(a + b, n + 1)
    s = _cond_sub(s, _P2 + (0,) * (n + 1 - len(_P2)))
    return s[:n]


# ---------------------------------------------------------------------------
# The shared permutation body (state: (16, t, B) u32, values < 2P)
# ---------------------------------------------------------------------------

def _state_bytes_cols(st):
    """(16, t, B) -> (t*32, B) byte rows in linmap column order."""
    t, B = st.shape[1], st.shape[2]
    return jnp.moveaxis(_bytes_of(st), 1, 0).reshape(t * 32, B)


def _mix_with(mat, state, c, tout):
    """MDS linear layer via one static byte matmul: (16, t, B) ->
    (16, tout, B), outputs < 2P."""
    B = state.shape[2]
    c8 = jax.lax.dot(mat, _state_bytes_cols(state), precision=_HI)
    limb = _limbs_of(c8.reshape(tout, 64, B).swapaxes(0, 1))   # (32,tout,B)
    return _barrett2p(limb, c)


def _pose_body(state, c, refs, t: int, nP: int, n_outs: int):
    """Full PoseidonEx permutation on (16, t, B) state; constants partly
    values (c) and partly refs (refs: cp/s0mat/s1mat, pl.ds-indexed in the
    partial-round loop). Returns (16, n_outs, B), canonical (< P)."""
    B = state.shape[2]

    def ark_cols(arr, r):
        col = arr[r * t * NL:(r + 1) * t * NL]
        return jnp.broadcast_to(col.reshape(t, NL, 1).swapaxes(0, 1),
                                (NL, t, B))

    state = _add_red(state, ark_cols(c["ark"], 0))

    def full_round(rcols, st, mat):
        st = _sigma(st, c)
        st = _add_red(st, rcols)
        return _mix_with(mat, st, c, t)

    for r in range(3):
        state = full_round(ark_cols(c["ark"], r + 1), state, c["m_mat"])
    state = full_round(ark_cols(c["ark"], 4), state, c["p_mat"])

    cp_ref, s0_ref, s1_ref = refs["cp"], refs["s0mat"], refs["s1mat"]

    def partial(r, st):
        x0 = _sigma(st[:, 0], c)
        cp = jnp.broadcast_to(cp_ref[pl.ds(r * NL, NL), :], (NL, B))
        x0 = _add_red(x0, cp)
        st = jnp.concatenate([x0[:, None], st[:, 1:]], axis=1)
        s0m = s0_ref[pl.ds(r * 64, 64), :]
        new0 = _barrett2p(
            _limbs_of(jax.lax.dot(s0m, _state_bytes_cols(st),
                                  precision=_HI)), c)
        s1m = s1_ref[pl.ds(r * (t - 1) * 64, (t - 1) * 64), :]
        c8 = jax.lax.dot(s1m, _bytes_of(x0), precision=_HI)
        prod = _barrett2p(
            _limbs_of(c8.reshape(t - 1, 64, B).swapaxes(0, 1)), c)
        rest = _add_red(st[:, 1:], prod)
        return jnp.concatenate([new0[:, None], rest], axis=1)

    state = jax.lax.fori_loop(0, nP, partial, state)

    for r in range(3):
        state = full_round(ark_cols(c["ark2"], r), state, c["m_mat"])

    state = _sigma(state, c)
    out = _mix_with(c["m_mat"], state, c, t)[:, :n_outs]
    # canonicalize column-wise: flattening (n_outs, B) would merge the
    # minor dim (Mosaic-unsupported); n_outs is tiny and static.
    cols = [_canon(out[:, j], c) for j in range(n_outs)]
    return jnp.stack(cols, axis=1)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _split_consts(crefs):
    d = dict(zip(_CONST_KEYS, crefs))
    vals = {k: d[k][:] for k in _VAL_KEYS}
    refs = {k: d[k] for k in _REF_KEYS}
    return vals, refs


def _pose_kernel(t, nP, n_outs, st_ref, *rest):
    crefs, out_ref = rest[:-1], rest[-1]
    c, refs = _split_consts(crefs)
    B = st_ref.shape[1]
    state = st_ref[:].reshape(t, NL, B).swapaxes(0, 1)     # (16, t, B)
    out = _pose_body(state, c, refs, t, nP, n_outs)
    out_ref[:] = out.swapaxes(0, 1).reshape(n_outs * NL, B)


# The big unrolled permutation bodies need more scoped VMEM than Mosaic's
# conservative 16 MB default (t=5 at B=256 wants 19.2 MB of stack); v5e
# has 128 MB of VMEM per core.
_VMEM_LIMIT = 100 * 1024 * 1024


def _params():
    if pf.interpret_mode():
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


@functools.partial(jax.jit, static_argnames=("t", "n_outs"))
def _permute(state, t: int, n_outs: int):
    c = _consts(t)
    B = state.shape[1]
    kern = functools.partial(_pose_kernel, t, c["nP"], n_outs)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n_outs * NL, B), jnp.uint32),
        in_specs=[vmem] * (1 + len(_CONST_KEYS)),
        out_specs=vmem,
        compiler_params=_params(),
        interpret=pf.interpret_mode(),
    )(state, *[c[k] for k in _CONST_KEYS])


def _smt_kernel(n_levels, nP, sibs_ref, lr_ref, top_ref, inew_ref,
                leaf_ref, *rest):
    crefs3 = rest[:len(_CONST_KEYS)]
    out_ref = rest[-1]
    c, refs = _split_consts(crefs3)
    B = leaf_ref.shape[1]
    leaf = leaf_ref[:]

    def level(i, child):
        sib = sibs_ref[pl.ds(i * NL, NL), :]               # (16, B)
        lr = jnp.broadcast_to(lr_ref[pl.ds(i, 1), :], (NL, B)) != 0
        L = jnp.where(lr, sib, child)
        R = jnp.where(lr, child, sib)
        st = jnp.stack(
            [jnp.zeros((NL, B), jnp.uint32), L, R], axis=1)  # (16, 3, B)
        h = _pose_body(st, c, refs, 3, nP, 1)[:, 0]
        top = jnp.broadcast_to(top_ref[pl.ds(i, 1), :], (NL, B)) != 0
        inew = jnp.broadcast_to(inew_ref[pl.ds(i, 1), :], (NL, B)) != 0
        return jnp.where(top, h,
                         jnp.where(inew, leaf, jnp.zeros_like(h)))

    out_ref[:] = jax.lax.fori_loop(0, n_levels, level,
                                   jnp.zeros((NL, B), jnp.uint32))


@jax.jit
def smt_climb(siblings_flip, lrbits_flip, top_flip, inew_flip, key, value):
    """Whole SMT root climb in ONE pallas_call (plus one t=4 permutation
    call for the leaf hash — keeping the t=4 constant pack and body OUT of
    the climb kernel stays under the 16 MB scoped-VMEM limit; the fused
    both-in-one variant OOMs Mosaic's stack allocator at 18.4 MB on v5e).

    siblings_flip: (N*16, B) — deepest level first, 16 limb rows per level;
    lrbits/top/inew_flip: (N, B) u32 flags (deepest first); key/value:
    (16, B) canonical. Returns the computed root (16, B), canonical.
    Mirrors the leaf hash + per-level select semantics of ops/smt.verify
    (SMTVerifier.circom:10-21, 109-175)."""
    n_levels = lrbits_flip.shape[0]
    c3 = _consts(3)
    B = key.shape[1]
    one = jnp.zeros((NL, B), jnp.uint32).at[0].set(1)
    # leaf = Poseidon3(key, value, 1)  (SMTHash1, SMTVerifier.circom:10-21)
    leaf = poseidon_ex(jnp.stack([key, value, one], axis=1), 1)[:, 0]
    kern = functools.partial(_smt_kernel, n_levels, c3["nP"])
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((NL, B), jnp.uint32),
        in_specs=[vmem] * (5 + len(_CONST_KEYS)),
        out_specs=vmem,
        compiler_params=_params(),
        interpret=pf.interpret_mode(),
    )(jnp.asarray(siblings_flip, jnp.uint32),
      jnp.asarray(lrbits_flip, jnp.uint32),
      jnp.asarray(top_flip, jnp.uint32),
      jnp.asarray(inew_flip, jnp.uint32),
      leaf,
      *[c3[k] for k in _CONST_KEYS])


# ---------------------------------------------------------------------------
# Public API — drop-in for ops/poseidon.poseidon_ex / poseidon
# ---------------------------------------------------------------------------

def poseidon_ex(inputs, n_outs: int = 1, initial_state=None):
    """Pallas PoseidonEx. inputs: (16, n, B) or list of (16, B) limb
    tensors; returns (16, n_outs, B) — same contract as
    ops/poseidon.poseidon_ex."""
    if isinstance(inputs, (list, tuple)):
        inputs = jnp.stack(inputs, axis=1)
    inputs = jnp.asarray(inputs, jnp.uint32)
    n = inputs.shape[1]
    t = n + 1
    B = inputs.shape[2:]
    if len(B) != 1:
        flat = inputs.reshape(NL, n, -1)
        out = poseidon_ex(flat, n_outs, None if initial_state is None
                          else jnp.asarray(initial_state).reshape(NL, -1))
        return out.reshape((NL, n_outs) + B)
    if initial_state is None:
        init = jnp.zeros((NL,) + B, dtype=jnp.uint32)
    else:
        init = jnp.asarray(initial_state, jnp.uint32)
    st = jnp.concatenate([init] + [inputs[:, j] for j in range(n)], axis=0)
    out = _permute(st, t, n_outs)
    return jnp.stack([out[16 * i:16 * (i + 1)] for i in range(n_outs)],
                     axis=1)


def poseidon(inputs):
    return poseidon_ex(inputs, 1)[:, 0]
