"""Fused Pallas Poseidon permutation — the witness program's hottest kernel.

The XLA Poseidon (ops/poseidon.py) is bit-exact but issues ~45 separate ops
per round; in this environment each XLA op costs ~2 us of issue overhead, so
one t=3 permutation (65 rounds) takes ~6.5 ms at batch 1024 and the 80-level
SMT climb ~520 ms/step (measured, tools/profile_flagship.py). This kernel
runs the WHOLE permutation in one Pallas call: limb state stays in
VMEM/registers, the limb-product convolutions and the static Barrett/MDS
products ride the MXU via f32 matmuls (integer-valued, < 2^24, exact), and
the round loops are in-kernel ``fori_loop``s.

Semantics are identical to ops/poseidon.poseidon_ex (circomlib schedule,
reference: /root/reference/circuits/lib/circuits/hasher/poseidon/
poseidon.circom:80-211); outputs are canonical (< P) and bit-equal to the
XLA path, which is oracle-tested against test/poseidon.js vectors.

Layout: state is a (t*16, B) uint32 tensor — element j occupies rows
[16j, 16j+16) (16-bit little-endian limbs). B should be a multiple of 128.
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
    """Byte matrices for the two static Barrett products: x Mu (17-limb
    operand) and x P (17-limb operand)."""
    mu_int = sum(int(v) << (16 * i) for i, v in enumerate(fr.MU_LIMBS))
    p_int = fr.P
    mu_m = bn._static_byte_matrix(tuple(mu_int.to_bytes(34, "little")), 17)
    mod_m = bn._static_byte_matrix(tuple(p_int.to_bytes(32, "little")), 17)
    return mu_m, mod_m                     # (68, 34), (66, 34)


def _limbs_int(arr16) -> int:
    return sum(int(v) << (16 * i) for i, v in enumerate(arr16))


@functools.lru_cache(maxsize=None)
def _consts(t: int):
    """Kernel-input constant pack for width t (numpy, f32/u32)."""
    c = pos._consts(t)
    nP = c["cp"].shape[0]

    def linmat(consts_l_tin_tout):
        return bn.linmap_matrix(np.ascontiguousarray(consts_l_tin_tout), NL)

    m_mat = linmat(c["m"])                               # (t*64, t*32)
    p_mat = linmat(c["p"])
    # s0 row maps, one (64, t*32) block per partial round -> (nP*64, t*32)
    s0mat = np.concatenate(
        [linmat(c["s0"][r][:, :, None]) for r in range(nP)], axis=0)
    # s1 static-constant products, one ((t-1)*64, 32) block per round
    s1mat = np.concatenate(
        [linmat(c["s1"][r][:, None, :]) for r in range(nP)], axis=0)
    # round constants as (rounds*t*16, 1) u32 column vectors
    ark = c["ark"].transpose(0, 2, 1).reshape(5 * t * NL, 1)      # (5*t*16,1)
    ark2 = c["ark2"].transpose(0, 2, 1).reshape(3 * t * NL, 1)
    cp = c["cp"].reshape(nP * NL, 1)
    return {
        "nP": nP,
        "conv": _conv_mtx().astype(np.float32),
        "mu_m": _barrett_mtxs()[0].astype(np.float32),
        "mod_m": _barrett_mtxs()[1].astype(np.float32),
        "m_mat": m_mat.astype(np.float32),
        "p_mat": p_mat.astype(np.float32),
        "s0mat": s0mat.astype(np.float32),
        "s1mat": s1mat.astype(np.float32),
        "ark": np.ascontiguousarray(ark, np.uint32),
        "ark2": np.ascontiguousarray(ark2, np.uint32),
        "cp": np.ascontiguousarray(cp, np.uint32),
    }


# ---------------------------------------------------------------------------
# In-kernel field helpers (jnp on values; exact, kernel-safe)
# ---------------------------------------------------------------------------

def _bytes_of(x):
    """(n, B) 16-bit limbs -> (2n, B) interleaved lo/hi bytes as f32."""
    n = x.shape[0]
    b = jnp.stack([x & 0xFF, x >> 8], axis=1)         # (n, 2, B)
    return b.reshape(2 * n, x.shape[1]).astype(_F32)


def _limbs_of(c8):
    """(2n, B) f32 byte-diagonal sums -> (n, B) u32 overflowed limbs."""
    n2 = c8.shape[0]
    u = c8.astype(jnp.uint32).reshape(n2 // 2, 2, c8.shape[1])
    return u[:, 0] + (u[:, 1] << 8)


def _barrett(t32, mu_m, mod_m):
    """(32, B) overflowed -> (16, B) canonical (< P). MXU static products."""
    x = pf._carry16(t32, 2 * NL)
    q1 = x[NL - 1:]                                    # (17, B)
    q2 = _limbs_of(jax.lax.dot(mu_m, _bytes_of(q1), precision=_HI))
    q2 = pf._carry16(q2, 2 * NL + 2)
    q3 = q2[NL + 1:]                                   # (17, B)
    r2 = _limbs_of(jax.lax.dot(mod_m, _bytes_of(q3), precision=_HI))[:NL + 1]
    r2 = pf._carry16(r2, NL + 1)
    r, _ = pf._sub_limbs(x[:NL + 1], r2)
    p_ext = pf._const_limbs(pf._P + (0,), r.shape[1:])
    d, borrow = pf._sub_limbs(r, p_ext)
    r = jnp.where(borrow.astype(bool), r, d)
    d, borrow = pf._sub_limbs(r, p_ext)
    r = jnp.where(borrow.astype(bool), r, d)
    return r[:NL]


def _modmul(a, b, conv, mu_m, mod_m):
    """(a*b) mod P on (16, B) normalized limbs; conv product on the MXU."""
    rows = [a[i][None] * b for i in range(NL)]         # 16 x (16, B)
    prod = jnp.concatenate(rows, axis=0)               # (256, B)
    halves = jnp.concatenate([prod & MASK, prod >> 16], axis=0)
    t32 = jax.lax.dot(conv, halves.astype(_F32),
                      precision=_HI).astype(jnp.uint32)
    return _barrett(t32, mu_m, mod_m)


def _sigma(x, conv, mu_m, mod_m):
    """x^5 mod P."""
    x2 = _modmul(x, x, conv, mu_m, mod_m)
    x4 = _modmul(x2, x2, conv, mu_m, mod_m)
    return _modmul(x4, x, conv, mu_m, mod_m)


def _addmod(a, b):
    """(a + b) mod P for canonical a, b (< P). Keeping every intermediate
    canonical bounds limb growth across the 57-round partial chain (a lazy
    add would accumulate up to ~57P and overflow the 16-limb window)."""
    n = a.shape[0]
    out = []
    for j in range(n // NL):
        s = pf._carry16(a[NL * j:NL * (j + 1)] + b[NL * j:NL * (j + 1)],
                        NL + 1)
        p_ext = pf._const_limbs(pf._P + (0,), s.shape[1:])
        d, borrow = pf._sub_limbs(s, p_ext)
        out.append(jnp.where(borrow.astype(bool), s, d)[:NL])
    return jnp.concatenate(out, axis=0) if len(out) > 1 else out[0]


# ---------------------------------------------------------------------------
# The permutation kernel
# ---------------------------------------------------------------------------

def _pose_kernel(t: int, nP: int, n_outs: int,
                 st_ref, conv_ref, mu_ref, mod_ref, mmat_ref, pmat_ref,
                 s0_ref, s1_ref, ark_ref, ark2_ref, cp_ref, out_ref):
    B = st_ref.shape[1]
    conv = conv_ref[:]
    mu_m = mu_ref[:]
    mod_m = mod_ref[:]

    def blocks(st):
        return [st[16 * j:16 * (j + 1)] for j in range(t)]

    def cat(bs):
        return jnp.concatenate(bs, axis=0)

    def ark_col(ref, r):
        # (t*16, 1) slice at round r, broadcast over B
        col = ref[pl.ds(r * t * NL, t * NL), :]        # (t*16, 1)
        return jnp.broadcast_to(col, (t * NL, B))

    def mix_with(mat, st, tout):
        byts = cat([_bytes_of(s) for s in blocks(st)])           # (t*32, B)
        c8 = jax.lax.dot(mat, byts, precision=_HI)               # (tout*64, B)
        outs = []
        for i in range(tout):
            limb = _limbs_of(c8[64 * i:64 * (i + 1)])            # (32, B)
            outs.append(_barrett(limb, mu_m, mod_m))
        return cat(outs)

    def full_round_nomix(st, ark):
        st = cat([_sigma(s, conv, mu_m, mod_m) for s in blocks(st)])
        return _addmod(st, ark)

    state = st_ref[:]
    # initial ark (round constants C[0..t))
    state = _addmod(state, ark_col(ark_ref, 0))

    # first-half full rounds: 3 with M, then 1 with P
    for r in range(3):
        state = full_round_nomix(state, ark_col(ark_ref, r + 1))
        state = mix_with(mmat_ref[:], state, t)
    state = full_round_nomix(state, ark_col(ark_ref, 4))
    state = mix_with(pmat_ref[:], state, t)

    # partial rounds under fori_loop; per-round constants via ref slices
    def partial(r, st):
        x0 = _sigma(st[:NL], conv, mu_m, mod_m)
        cp = jnp.broadcast_to(cp_ref[pl.ds(r * NL, NL), :], (NL, B))
        x0 = _addmod(x0, cp)
        st = jnp.concatenate([x0, st[NL:]], axis=0)
        # new0 = <s0 row, state>
        s0m = s0_ref[pl.ds(r * 64, 64), :]                       # (64, t*32)
        byts = cat([_bytes_of(s) for s in blocks(st)])
        new0 = _barrett(_limbs_of(jax.lax.dot(s0m, byts, precision=_HI)),
                        mu_m, mod_m)
        # rest_j += s1[r][j] * x0
        s1m = s1_ref[pl.ds(r * (t - 1) * 64, (t - 1) * 64), :]   # ((t-1)*64,32)
        c8 = jax.lax.dot(s1m, _bytes_of(x0), precision=_HI)
        rest = []
        for j in range(t - 1):
            prodj = _barrett(_limbs_of(c8[64 * j:64 * (j + 1)]), mu_m, mod_m)
            rest.append(_addmod(st[NL * (j + 1):NL * (j + 2)], prodj))
        return jnp.concatenate([new0] + rest, axis=0)

    state = jax.lax.fori_loop(0, nP, partial, state)

    # second-half full rounds (3, with M)
    for r in range(3):
        state = full_round_nomix(state, ark_col(ark2_ref, r))
        state = mix_with(mmat_ref[:], state, t)

    # final half-round: sigma + truncated mix
    state = cat([_sigma(s, conv, mu_m, mod_m) for s in blocks(state)])
    out_ref[:] = mix_with(mmat_ref[:], state, t)[:n_outs * NL]


@functools.partial(jax.jit, static_argnames=("t", "n_outs"))
def _permute(state, t: int, n_outs: int):
    c = _consts(t)
    B = state.shape[1]
    kern = functools.partial(_pose_kernel, t, c["nP"], n_outs)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n_outs * NL, B), jnp.uint32),
        in_specs=[vmem] * 11,
        out_specs=vmem,
        interpret=pf.interpret_mode(),
    )(state, c["conv"], c["mu_m"], c["mod_m"], c["m_mat"], c["p_mat"],
      c["s0mat"], c["s1mat"], c["ark"], c["ark2"], c["cp"])


# ---------------------------------------------------------------------------
# Public API — drop-in for ops/poseidon.poseidon_ex / poseidon
# ---------------------------------------------------------------------------

def poseidon_ex(inputs, n_outs: int = 1, initial_state=None):
    """Pallas PoseidonEx. inputs: (16, n, B) or list of (16, B) limb
    tensors; returns (16, n_outs, B) — same contract as
    ops/poseidon.poseidon_ex."""
    if isinstance(inputs, (list, tuple)):
        inputs = jnp.stack(inputs, axis=1)
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
        init = jnp.asarray(initial_state)
    # (16, t, B) -> (t*16, B) row-block layout
    st = jnp.concatenate([init] + [inputs[:, j] for j in range(n)], axis=0)
    out = _permute(st, t, n_outs)
    return jnp.stack([out[16 * i:16 * (i + 1)] for i in range(n_outs)],
                     axis=1)


def poseidon(inputs):
    return poseidon_ex(inputs, 1)[:, 0]
