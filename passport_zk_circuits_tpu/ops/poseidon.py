"""Batched circomlib-compatible Poseidon over BN254 Fr, TPU-native.

Replaces the reference's Poseidon circuit family
(/root/reference/circuits/lib/circuits/hasher/poseidon/poseidon.circom:10-226:
Sigma/Ark/Mix/MixLast/MixS + PoseidonEx round schedule, constants from
poseidonConstants.circom = test/poseidon_constants.js). Semantics are
identical (optimized C/M/P/S schedule, 8 full + nP partial rounds); the
execution model is redesigned for XLA:

* state is a (16, t, B) uint32 limb tensor; the MDS mix computes ALL t*t
  limb-products with one batched convolution, accumulates lazily in uint32,
  and performs a single Barrett reduction per round (t reductions fused);
* the uniform round groups (3 first-half full rounds, nP partial rounds,
  3 second-half full rounds) run under ``lax.scan`` with stacked per-round
  constants, so the compiled graph holds one body per group.
"""

from __future__ import annotations

import functools
import pathlib

import numpy as np
import jax
import jax.numpy as jnp

from . import field as fr
from . import bignum as bn

N_ROUNDS_P = [56, 57, 56, 60, 60, 63, 64, 63, 60, 66, 60, 65, 70, 60, 64, 68]

_NPZ = pathlib.Path(__file__).parent.parent / "utils" / "constants" / \
    "poseidon_bn254.npz"


@functools.lru_cache(maxsize=None)
def _consts(t: int):
    """Constant tensors for width t (plain limb form, limb axis first).

      ark:  (5, 16, t)    initial ark + first-half round constants
      ark2: (3, 16, t)    second-half round constants
      cp:   (nP, 16)      partial-round constants
      m:    (16, t, t)    [l, j, i] = limb l of M[j][i]
      p:    (16, t, t)    same for the P matrix
      s0:   (nP, 16, t)   MixS row constants
      s1:   (nP, 16, t-1) MixS column constants
    """
    data = np.load(_NPZ)
    nP = N_ROUNDS_P[t - 2]
    C = data[f"C_{t}"]                                  # (nC, 16)
    S = data[f"S_{t}"]
    M = data[f"M_{t}"].reshape(t, t, 16)
    Pm = data[f"P_{t}"].reshape(t, t, 16)
    out = {
        "ark": C[:5 * t].reshape(5, t, 16).transpose(0, 2, 1),
        "cp": C[5 * t:5 * t + nP],
        "ark2": C[5 * t + nP:5 * t + nP + 3 * t].reshape(3, t, 16)
                .transpose(0, 2, 1),
        "m": M.transpose(2, 0, 1),
        "p": Pm.transpose(2, 0, 1),
        "s0": S.reshape(nP, 2 * t - 1, 16)[:, :t].transpose(0, 2, 1),
        "s1": S.reshape(nP, 2 * t - 1, 16)[:, t:].transpose(0, 2, 1),
    }
    # numpy on purpose: caching jnp arrays could leak tracers when first
    # materialized under a trace; np.uint32 copies are free to close over.
    out = {k: np.ascontiguousarray(v, dtype=np.uint32) for k, v in out.items()}
    if t <= 8:
        # per-round MixS row-map matrices, scanned through the partial rounds
        out["s0mat"] = np.stack([
            bn.linmap_matrix(out["s0"][r][:, :, None], fr.NLIMBS)
            for r in range(nP)])                     # (nP, 2*32, t*32) f32
    return out


def _sigma(x):
    """x^5 (3 modular muls); x: (16, ..., B)."""
    x2 = fr.sqr(x)
    x4 = fr.sqr(x2)
    return fr.mul(x4, x)


def _mix(rows, state):
    """out[:, i] = sum_j rows[:, j, i] * state[:, j].

    rows: (16, t, t_out) static; state: (16, t, B) -> (16, t_out, B).
    t <= 8: the whole MDS map is ONE static byte-matrix MXU matmul
    (bn.linmap_static) followed by a single Barrett reduction; larger t
    falls back to the generic convolution + lazy uint32 accumulation."""
    if isinstance(rows, np.ndarray) and state.shape[1] <= 8:
        return fr.reduce_overflowed(bn.linmap_static(rows, state))
    prods = bn.poly_mul(rows[..., None], state[:, :, None])  # (32,t,t_out,B)
    return fr.reduce_overflowed(prods.sum(axis=1))


def _bc(c, shape):
    """Broadcast a (16,) constant against (16, *shape)."""
    return jnp.broadcast_to(
        c.reshape((fr.NLIMBS,) + (1,) * (len(shape))), (fr.NLIMBS,) + shape)


def poseidon_ex(inputs, n_outs: int = 1, initial_state=None):
    """Batched PoseidonEx. inputs: (16, n, B) or list of (16, B) limbs;
    returns (16, n_outs, B).

    Mirrors PoseidonEx semantics (hasher/poseidon/poseidon.circom:80-211,
    test/poseidon.js:52-132)."""
    if isinstance(inputs, (list, tuple)):
        inputs = jnp.stack(inputs, axis=1)
    n = inputs.shape[1]
    t = n + 1
    if not (2 <= t <= 17):
        raise ValueError("poseidon supports 1..16 inputs")
    from . import pallas_field as pf
    if t <= 8 and pf.use_pallas():
        # one fused VMEM-resident permutation per call — the XLA graph
        # below issues ~45 ops/round and is issue-overhead-bound on this
        # environment (see ops/pallas_poseidon module docstring)
        from . import pallas_poseidon as ppk
        return ppk.poseidon_ex(inputs, n_outs, initial_state)
    c = _consts(t)
    B = inputs.shape[2:]

    if initial_state is None:
        init = jnp.zeros((fr.NLIMBS, 1) + B, dtype=jnp.uint32)
    else:
        init = jnp.asarray(initial_state)[:, None]
    state = jnp.concatenate([jnp.broadcast_to(init, (fr.NLIMBS, 1) + B),
                             inputs], axis=1)        # (16, t, B)

    state = fr.add(state, _bc_cols(c["ark"][0], state.shape))

    def full_round(state, ark_c, rows):
        state = _sigma(state)
        state = fr.add(state, _bc_cols(ark_c, state.shape))
        return _mix(rows, state)

    state, _ = jax.lax.scan(
        lambda s, a: (full_round(s, a, c["m"]), None), state, c["ark"][1:4])
    state = full_round(state, c["ark"][4], c["p"])

    use_mat = "s0mat" in c

    def partial(state, xs):
        if use_mat:
            cp, s0mat, s1 = xs                       # s0mat: (64, t*32)
        else:
            cp, s0mat, s1 = xs                       # s0mat = s0: (16, t)
        x0 = _sigma(state[:, 0])                     # (16, B)
        x0 = fr.add(x0, _bc(cp, x0.shape[1:]))
        state = state.at[:, 0].set(x0)
        if use_mat:
            # per-round MixS row map as one byte-matrix matmul
            new0 = fr.reduce_overflowed(
                bn.linmap_apply(s0mat, state, fr.NLIMBS)[:, 0])
        else:
            prods = bn.poly_mul(s0mat[:, :, None], state)   # (32, t, B)
            new0 = fr.reduce_overflowed(prods.sum(axis=1))
        rest = fr.add(state[:, 1:], fr.mul(s1[:, :, None], x0[:, None]))
        return jnp.concatenate([new0[:, None], rest], axis=1), None

    state, _ = jax.lax.scan(
        partial, state,
        (c["cp"], c["s0mat"] if use_mat else c["s0"], c["s1"]))

    state, _ = jax.lax.scan(
        lambda s, a: (full_round(s, a, c["m"]), None), state, c["ark2"])
    state = _sigma(state)
    return _mix(c["m"][:, :, :n_outs], state)


def _bc_cols(cols, shape):
    """Broadcast a (16, t) constant against (16, t, *B)."""
    return jnp.broadcast_to(
        cols.reshape(cols.shape + (1,) * (len(shape) - 2)), shape)


def poseidon(inputs):
    """circomlib-compatible Poseidon hash: (16, n, B) or list of (16, B)
    -> (16, B). PoseidonHash analog (hasher/hash.circom:119)."""
    return poseidon_ex(inputs, 1)[:, 0]
