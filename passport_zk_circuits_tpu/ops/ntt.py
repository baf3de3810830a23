"""Batched radix-2 NTT over BN254 Fr — Groth16-prover groundwork.

The reference delegates proving to snarkjs (circuits/scripts/prove.sh); the
prover's hot loops are NTTs over Fr and multi-scalar multiplications (see
ops/msm.py). This module provides the batched, TPU-shaped NTT: values
(16, n, *B) limb tensors, log2(n) unrolled stages of vectorized
butterflies, twiddles precomputed host-side.

BN254 Fr has 2-adicity 28 (p - 1 = 2^28 * odd); the primitive root is
derived from the multiplicative generator 5 and proof-checked at import.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from . import field as fr

TWO_ADICITY = 28
_GEN = 5

assert (fr.P - 1) % (1 << TWO_ADICITY) == 0


@functools.lru_cache(maxsize=None)
def root_of_unity(log_n: int) -> int:
    """2^log_n-th primitive root of unity (proof-checked)."""
    assert log_n <= TWO_ADICITY
    w = pow(_GEN, (fr.P - 1) >> log_n, fr.P)
    assert pow(w, 1 << log_n, fr.P) == 1
    if log_n > 0:
        assert pow(w, 1 << (log_n - 1), fr.P) != 1
    return w


@functools.lru_cache(maxsize=None)
def _twiddles(log_n: int, inverse: bool):
    """Per-stage twiddle limb tables: stage s has 2^s butterfly twiddles."""
    n = 1 << log_n
    w = root_of_unity(log_n)
    if inverse:
        w = pow(w, fr.P - 2, fr.P)
    stages = []
    for s in range(1, log_n + 1):
        m = 1 << s
        wm = pow(w, n // m, fr.P)
        tw = [pow(wm, j, fr.P) for j in range(m // 2)]
        stages.append(np.stack([fr.to_limbs(t) for t in tw]).T)  # (16, m/2)
    return stages


@functools.lru_cache(maxsize=None)
def _bit_reverse(log_n: int):
    n = 1 << log_n
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for i in range(n):
        r = 0
        v = i
        for _ in range(log_n):
            r = (r << 1) | (v & 1)
            v >>= 1
        rev[i] = r
    return rev


def _transform(a, inverse: bool, twiddles=None, rev=None):
    """a: (16, n, *B) -> (16, n, *B). Iterative Cooley-Tukey.

    `twiddles`/`rev` may be passed as runtime operands (tuple of per-stage
    (16, m/2) arrays + the bit-reverse index vector): at large n the baked
    constants alone are ~64B*n of HLO, which overflows the remote
    compiler's request limit (HTTP 413 at n = 2^21 over the axon tunnel).
    When omitted, they are embedded as constants (fine for small n)."""
    n = a.shape[1]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    a = a[:, _bit_reverse(log_n) if rev is None else rev]
    stages = _twiddles(log_n, inverse) if twiddles is None else twiddles
    bshape = a.shape[2:]
    for s in range(1, log_n + 1):
        m = 1 << s
        half = m // 2
        grp = a.reshape((fr.NLIMBS, n // m, m) + bshape)
        lo = grp[:, :, :half]
        hi = grp[:, :, half:]
        tw = jnp.reshape(stages[s - 1],
                         (fr.NLIMBS, 1, half) + (1,) * len(bshape))
        t = fr.mul(jnp.broadcast_to(tw, hi.shape), hi)
        a = jnp.concatenate([fr.add(lo, t), fr.sub(lo, t)], axis=2)
        a = a.reshape((fr.NLIMBS, n) + bshape)
    return a


def ntt(a, twiddles=None, rev=None):
    """Forward NTT of (16, n, *B) Fr limbs (n a power of two <= 2^28)."""
    return _transform(a, inverse=False, twiddles=twiddles, rev=rev)


def intt(a, twiddles=None, rev=None):
    """Inverse NTT (scaled by n^-1)."""
    n = a.shape[1]
    out = _transform(a, inverse=True, twiddles=twiddles, rev=rev)
    n_inv = fr.to_limbs(pow(n, fr.P - 2, fr.P))
    scale = jnp.broadcast_to(
        jnp.asarray(n_inv).reshape((fr.NLIMBS,) + (1,) * (out.ndim - 1)),
        out.shape)
    return fr.mul(out, scale)


def poly_mul_ntt(a, b):
    """Cyclic polynomial product of two (16, n, *B) coefficient tensors."""
    return intt(fr.mul(ntt(a), ntt(b)))
