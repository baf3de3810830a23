"""Batched Poseidon2 permutation (BN254, T=3) + sponge + Merkle tree.

Capability twin of /root/reference/circuits/lib/circuits/hasher/poseidon2/:
poseidon2Perm.circom (InternalRound :12-83, ExternalRound :88-146,
LinearLayer :151-158, Permutation :162-220, Compression :225-235),
poseidon2Sponge.circom (PoseidonSponge :28-105 with 10* padding and
CIV = 2^64 + 256*T + RATE, Poseidon2SpongeHashRate1 :115), and
poseidon2Merkle.circom (PoseidonMerkle :11).

Round constants extracted as data to utils/constants/poseidon2_bn254_t3.npz.
External/internal round groups run under ``lax.scan``.
"""

from __future__ import annotations

import functools
import pathlib

import numpy as np
import jax
import jax.numpy as jnp

from . import field as fr

_NPZ = pathlib.Path(__file__).parent.parent / "utils" / "constants" / \
    "poseidon2_bn254_t3.npz"

T = 3
N_EXT = 8
N_INT = 56


@functools.lru_cache(maxsize=None)
def _consts():
    d = np.load(_NPZ)
    return {"internal": np.ascontiguousarray(d["internal"], np.uint32),
            "external": np.ascontiguousarray(d["external"], np.uint32)}


def _sigma(x):
    x2 = fr.sqr(x)
    x4 = fr.sqr(x2)
    return fr.mul(x4, x)


def _linear_layer(s0, s1, s2):
    """circulant(2,1,1): out[i] = in[i] + (in0+in1+in2)."""
    tot = fr.add(fr.add(s0, s1), s2)
    return fr.add(s0, tot), fr.add(s1, tot), fr.add(s2, tot)


def _bc(c16, shape):
    return jnp.broadcast_to(
        jnp.asarray(c16).reshape((fr.NLIMBS,) + (1,) * (len(shape))),
        (fr.NLIMBS,) + shape)


def permutation(s0, s1, s2):
    """Poseidon2 permutation, T=3. Inputs/outputs (16, *B) standard-domain."""
    c = _consts()
    bshape = s0.shape[1:]
    s0, s1, s2 = _linear_layer(s0, s1, s2)

    # constants arrive per scan step as (3, 16); index as cc[j] (16,)
    ext_c = jnp.asarray(c["external"])              # (8, 3, 16)

    def ext_body(state, cc):
        a, b, d = state
        a = _sigma(fr.add(a, _bc(cc[0], bshape)))
        b = _sigma(fr.add(b, _bc(cc[1], bshape)))
        d = _sigma(fr.add(d, _bc(cc[2], bshape)))
        return _linear_layer(a, b, d), None

    def int_body(state, cc):
        a, b, d = state
        s = _sigma(fr.add(a, _bc(cc, bshape)))
        # internal matrix [[2,1,1],[1,2,1],[1,1,3]]
        bd = fr.add(b, d)
        a2 = fr.add(fr.add(s, s), bd)
        b2 = fr.add(fr.add(s, b), fr.add(b, d))
        d2 = fr.add(fr.add(s, b), fr.add(fr.add(d, d), d))
        return (a2, b2, d2), None

    state = (s0, s1, s2)
    state, _ = jax.lax.scan(ext_body, state, ext_c[:4])
    state, _ = jax.lax.scan(int_body, state, jnp.asarray(c["internal"]))
    state, _ = jax.lax.scan(ext_body, state, ext_c[4:])
    return state


def compression(a, b):
    """2 -> 1 compression (Compression, poseidon2Perm.circom:225)."""
    zero = jnp.zeros_like(a)
    out0, _, _ = permutation(a, b, zero)
    return out0


def sponge_hash(inputs, capacity: int = 2):
    """Poseidon2Hash analog (hash.circom:136, Poseidon2SpongeHashRate1 with
    RATE = T - capacity). inputs: list of (16, *B) or (16, n, *B); returns
    (16, *B)."""
    if not isinstance(inputs, (list, tuple)):
        inputs = [inputs[:, i] for i in range(inputs.shape[1])]
    rate = T - capacity
    bshape = inputs[0].shape[1:]
    n = len(inputs)
    n_blocks = ((n + 1) + (rate - 1)) // rate
    padded = list(inputs) + [fr.const(1, bshape)]
    while len(padded) < n_blocks * rate:
        padded.append(fr.const(0, bshape))

    civ = (1 << 64) + 256 * T + rate
    state = [fr.const(0, bshape), fr.const(0, bshape), fr.const(civ, bshape)]
    for m in range(n_blocks):
        for i in range(rate):
            state[i] = fr.add(state[i], padded[m * rate + i])
        state = list(permutation(*state))
    return state[0]


def merkle_root(leaves):
    """PoseidonMerkle analog: (16, 2^L, *B) leaves -> (16, *B) root via
    Compression at each level."""
    n = leaves.shape[1]
    assert n & (n - 1) == 0, "leaf count must be a power of two"
    level = leaves
    while level.shape[1] > 1:
        a = level[:, 0::2]
        b = level[:, 1::2]
        zero = jnp.zeros_like(a)
        out0, _, _ = permutation(a, b, zero)
        level = out0
    return level[:, 0]
