"""Fused Pallas SHA-256/224: all blocks of a padded message in ONE kernel.

The XLA scan (ops/sha2._sha256_block) issues ~14 ops per round and pays
per-op overhead across 64 rounds x blocks x 4 blobs — ~27 ms of the
flagship step (tools/profile_flagship.py). Here the whole compression
(message schedule + 64 rounds + Davies-Meyer add, per block) is unrolled
inside one kernel; SHA is pure u32 VPU word arithmetic, so the state
lives entirely in registers/VMEM.

Semantics match ops/sha2.sha256_chunks / sha224_chunks exactly
(Sha256HashChunks, /root/reference/circuits/lib/circuits/hasher/sha2/
sha256/sha256HashChunks.circom:8; hashlib-oracle-tested).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_field as pf
from . import pallas_poseidon as ppk
from .sha2 import _H224, _H256, _K256


def _rotr(x, n):
    return (x >> n) | (x << (32 - n))


def _block(state, w):
    """state: list of 8 (1, B) u32; w: list of 16 (1, B) u32 words."""
    w = list(w)
    for i in range(16, 64):
        s0 = _rotr(w[i - 15], 7) ^ _rotr(w[i - 15], 18) ^ (w[i - 15] >> 3)
        s1 = _rotr(w[i - 2], 17) ^ _rotr(w[i - 2], 19) ^ (w[i - 2] >> 10)
        w.append(w[i - 16] + s0 + w[i - 7] + s1)
    a, b, c, d, e, f, g, h = state
    for i in range(64):
        S1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = h + S1 + ch + jnp.uint32(int(_K256[i])) + w[i]
        S0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = S0 + maj
        a, b, c, d, e, f, g, h = t1 + t2, a, b, c, d + t1, e, f, g
    return [x + y for x, y in zip(state, (a, b, c, d, e, f, g, h))]


def _sha_kernel(nb, iv, msg_ref, out_ref):
    B = msg_ref.shape[1]
    state = [jnp.full((1, B), int(v), jnp.uint32) for v in iv]
    for blk in range(nb):
        w = [msg_ref[blk * 16 + i:blk * 16 + i + 1, :] for i in range(16)]
        state = _block(state, w)
    out_ref[:] = jnp.concatenate(state, axis=0)


@functools.partial(jax.jit, static_argnames=("algo",))
def sha2_32_chunks(msg, algo: int = 256):
    """Batched SHA-256/224 of pre-padded big-endian words.
    msg: (16*nb, B) uint32 -> (8 or 7, B)."""
    msg = jnp.asarray(msg, jnp.uint32)
    nb = msg.shape[0] // 16
    B = msg.shape[1]
    iv = tuple(int(v) for v in (_H256 if algo == 256 else _H224))
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_sha_kernel, nb, iv),
        out_shape=jax.ShapeDtypeStruct((8, B), jnp.uint32),
        in_specs=[vmem],
        out_specs=vmem,
        compiler_params=ppk._params(),
        interpret=pf.interpret_mode(),
    )(msg)
    return out[:8] if algo == 256 else out[:7]
