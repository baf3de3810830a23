"""Groth16 zkSNARK over BN254 — setup / prove / verify.

Replaces the reference's snarkjs pipeline
(/root/reference/circuits/scripts/export-keys.sh:27-31 groth16 setup,
prove.sh:25-27 groth16 prove, verify.sh:19-21 groth16 verify) with an
in-framework implementation over our R1CS (`r1cs.system.ConstraintSystem`).

Division of labor:
  * `setup`   — host-side (Python ints). Samples toxic waste from a seeded
    DRBG (TEST/DEV ONLY — a production ceremony must replace this), builds
    the QAP by evaluating Lagrange bases at tau, and emits the proving key
    both as ints (G2 pieces) and as device limb tensors (G1 query tables
    for the MSMs).
  * `prove`   — the hot path, on device: Az/Bz/Cz via the batched sparse
    matvec, h(X) = (AzBz-Cz)/Z via coset NTT over Fr (ops/ntt), the
    A/B1/K/H multi-scalar multiplications via ops/msm on bn254_g1, and
    pi_B via a G2 MSM over the [v_j(tau)]G2 query (ops/g2) — the
    production key shape; no toxic-waste-derived scalars ride in the PK.
    Handles a BATCH of witnesses at once (one proof per batch lane),
    sharing the MSM window tables across lanes.
  * `verify`  — host-side pairing product (groth16/pairing.py):
    e(A,B) = e(alpha,beta) e(sum_pub, gamma) e(C, delta).

QAP domain: size m = next power of two >= n_constraints, multiplicative
subgroup of Fr (2-adicity 28, ops/ntt.root_of_unity). Public wires are
0..n_public (wire 0 is the constant 1, as in circom/snarkjs).
"""

from __future__ import annotations

import dataclasses
import functools
import random
from typing import List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import bignum as bn
from ..ops import field as fr
from ..ops import g2 as _g2
from ..ops import ntt as _ntt
from ..ops import msm as _msm
from ..ops.weierstrass import ctx as _wctx
from ..r1cs.system import ConstraintSystem, _sparse_matvec
from . import pairing as pr

_COSET_G = 5            # Fr multiplicative generator (ops/ntt._GEN)


# -- key / proof containers ---------------------------------------------------

@dataclasses.dataclass
class ProvingKey:
    n_public: int                       # public wires are 1..n_public
    domain_size: int
    alpha1: tuple                       # int affine G1 points (x, y)
    beta1: tuple
    delta1: tuple
    beta2: tuple                        # FQ2 affine G2 points
    delta2: tuple
    a_query: np.ndarray                 # (2, k, n_vars) G1 affine limb tensors
    b1_query: np.ndarray
    k_query: np.ndarray                 # (2, k, n_vars - n_public - 1)
    h_query: np.ndarray                 # (2, k, m - 1)
    b2_query: np.ndarray                # (2, k, 2, n_vars) [v_j(tau)]G2 —
    #   the production key shape (snarkjs zkey B2 section analog,
    #   export-keys.sh:27-31); pi_B is a G2 MSM over these points, so the
    #   key never exposes the v_j(tau) scalars themselves
    a_inf: np.ndarray                   # bool masks: query point is infinity
    b1_inf: np.ndarray
    k_inf: np.ndarray
    b2_inf: np.ndarray


@dataclasses.dataclass
class VerifyingKey:
    n_public: int
    alpha1: tuple
    beta2: tuple
    gamma2: tuple
    delta2: tuple
    ic: list                            # n_public + 1 int affine G1 points


@dataclasses.dataclass
class Proof:
    a: tuple                            # int affine G1
    b: tuple                            # FQ2 affine G2
    c: tuple                            # int affine G1


# -- host EC helpers (ints / FQ-objects via groth16.pairing) ------------------

_Q = 21888242871839275222246405745257275088696311157297823662689037894645226208583


def _g1_mul_point(base, k: int):
    """[k]base with plain-int Jacobian arithmetic (one final inversion) —
    ~100x faster than the generic field-tower path in groth16/pairing,
    which matters for the host-side setup loops (ic + small queries) and
    the small-MSM host fallback."""
    k %= fr.P
    if k == 0 or base is None:
        return None
    q = _Q
    X, Y, Z = base[0], base[1], 1
    RX = RY = None
    RZ = 0
    for bit in bin(k)[2:]:
        if RZ:                             # R = 2R (Jacobian, a = 0)
            A = RX * RX % q
            Bb = RY * RY % q
            Cc = Bb * Bb % q
            D = 2 * ((RX + Bb) ** 2 - A - Cc) % q
            E = 3 * A % q
            F = E * E % q
            X3 = (F - 2 * D) % q
            RY, RZ = (E * (D - X3) - 8 * Cc) % q, 2 * RY * RZ % q
            RX = X3
        if bit == "1":
            if not RZ:
                RX, RY, RZ = X, Y, Z
            else:                          # R = R + G (mixed add, Z2 = 1)
                Z1Z1 = RZ * RZ % q
                U2 = X * Z1Z1 % q
                S2 = Y * RZ % q * Z1Z1 % q
                H = (U2 - RX) % q
                R = (S2 - RY) % q
                if H == 0:
                    if R != 0:
                        RZ = 0
                        continue
                    A = RX * RX % q        # doubling fallback
                    Bb = RY * RY % q
                    Cc = Bb * Bb % q
                    D = 2 * ((RX + Bb) ** 2 - A - Cc) % q
                    E = 3 * A % q
                    F = E * E % q
                    X3 = (F - 2 * D) % q
                    RY, RZ = (E * (D - X3) - 8 * Cc) % q, 2 * RY * RZ % q
                    RX = X3
                    continue
                HH = H * H % q
                HHH = H * HH % q
                V = RX * HH % q
                X3 = (R * R - HHH - 2 * V) % q
                RY = (R * (V - X3) - RY * HHH) % q
                RZ = RZ * H % q
                RX = X3
    if not RZ:
        return None
    zi = pow(RZ, q - 2, q)
    zi2 = zi * zi % q
    return (RX * zi2 % q, RY * zi2 % q * zi % q)


def _g1_mul(k: int):
    return _g1_mul_point((1, 2), k)        # G1 generator (1, 2)


def _g1_wrap(pt):
    return None if pt is None else (pr.FQ1([pt[0]]), pr.FQ1([pt[1]]))


def _g1_unwrap(pt):
    return None if pt is None else (pt[0].coeffs[0], pt[1].coeffs[0])


def _g1_points_to_limbs(points) -> Tuple[np.ndarray, np.ndarray]:
    """Affine int points (None = infinity, stored as (0,0)) -> limb tensor
    (2, k, N) + infinity mask. The MSM path zeroes infinity scalars instead
    (scalar 0 -> jacobian infinity), so (0,0) placeholders never enter adds."""
    c = _wctx("bn254_g1")
    n = len(points)
    xs = np.zeros((c.k, n), np.uint32)
    ys = np.zeros((c.k, n), np.uint32)
    inf = np.zeros(n, bool)
    for i, pt in enumerate(points):
        if pt is None:
            inf[i] = True
        else:
            xs[:, i] = bn.int_to_limbs(pt[0], c.k)
            ys[:, i] = bn.int_to_limbs(pt[1], c.k)
    return np.stack([xs, ys]), inf


# -- setup --------------------------------------------------------------------

def _batch_inverse(xs: List[int]) -> List[int]:
    """Montgomery batch inversion: one Fermat pow for the whole list."""
    pref = [1] * (len(xs) + 1)
    for i, x in enumerate(xs):
        pref[i + 1] = pref[i] * x % fr.P
    inv_all = pow(pref[-1], fr.P - 2, fr.P)
    out = [0] * len(xs)
    for i in range(len(xs) - 1, -1, -1):
        out[i] = pref[i] * inv_all % fr.P
        inv_all = inv_all * xs[i] % fr.P
    return out


def _lagrange_at_tau(m: int, tau: int) -> List[int]:
    """L_i(tau) for the size-m subgroup: L_i(tau) = w^i (tau^m - 1)/(m (tau - w^i))."""
    w = _ntt.root_of_unity(m.bit_length() - 1)
    zh = (pow(tau, m, fr.P) - 1) % fr.P
    if zh == 0:
        raise ValueError("tau landed in the domain; re-seed")
    wis = [1] * m
    for i in range(1, m):
        wis[i] = wis[i - 1] * w % fr.P
    denom_inv = _batch_inverse([(tau - wi) % fr.P for wi in wis])
    m_inv = pow(m, fr.P - 2, fr.P)
    scale = zh * m_inv % fr.P
    return [wi * scale % fr.P * di % fr.P
            for wi, di in zip(wis, denom_inv)]


_FB_CHUNK = 8192


def _g1_mul_many(scalars: List[int]) -> Tuple[np.ndarray, np.ndarray]:
    """[s]G1 for a list of Fr scalars -> ((2, k, N) affine limb tensor,
    infinity mask). Small lists run host-side; large ones ride the batched
    device fixed-base ladder (ops/weierstrass.fixed_base_mul, the stride-8
    analog of the reference's ec/powers tables) — this is what makes
    setup feasible at the flagship's ~512k-wire scale (the host loop is
    ~ms per point; the device path is ~us)."""
    n = len(scalars)
    scalars = [s % fr.P for s in scalars]
    # On CPU backends the batched ladder's one-hot table selects are slower
    # than host EC mults until well past this size; on TPU they win almost
    # immediately.
    host_cutoff = 512 if jax.default_backend() == "tpu" else 20000
    if n <= host_cutoff:
        pts = [_g1_mul(s) for s in scalars]
        return _g1_points_to_limbs(pts)
    c = _wctx("bn254_g1")
    inf = np.array([s == 0 for s in scalars], dtype=bool)
    xs = np.zeros((c.k, n), np.uint32)
    ys = np.zeros((c.k, n), np.uint32)

    from ..ops import weierstrass as wst

    @jax.jit
    def fb(sl):
        return wst.to_affine(c, wst.fixed_base_mul(c, sl))

    for lo in range(0, n, _FB_CHUNK):
        hi = min(n, lo + _FB_CHUNK)
        chunk = scalars[lo:hi] + [0] * (_FB_CHUNK - (hi - lo))
        sl = bn.ints_to_limbs_batch(chunk, c.kn)
        x, y = fb(jnp.asarray(sl))
        xs[:, lo:hi] = np.asarray(x)[:, :hi - lo]
        ys[:, lo:hi] = np.asarray(y)[:, :hi - lo]
    return np.stack([xs, ys]), inf


def _g2_mul_many(scalars: List[int]) -> Tuple[np.ndarray, np.ndarray]:
    """[s]G2 for a list of Fr scalars -> ((2, k, 2, N) FQ2 affine limb
    tensor, infinity mask) — the b2_query builder. Small lists run on the
    host (pairing affine ops); large ones ride the batched device stride-8
    fixed-base ladder over the twist (ops/g2.fixed_base_mul)."""
    n = len(scalars)
    scalars = [s % fr.P for s in scalars]
    host_cutoff = 256 if jax.default_backend() == "tpu" else 20000
    if n <= host_cutoff:
        return _g2.points_to_limbs([pr.ec_mul(pr.G2, s) for s in scalars])
    inf = np.array([s == 0 for s in scalars], dtype=bool)
    out = np.zeros((2, _g2.K, 2, n), np.uint32)

    @jax.jit
    def fb(sl):
        return _g2.to_affine(_g2.fixed_base_mul(sl))

    for lo in range(0, n, _FB_CHUNK):
        hi = min(n, lo + _FB_CHUNK)
        chunk = scalars[lo:hi] + [0] * (_FB_CHUNK - (hi - lo))
        sl = bn.ints_to_limbs_batch(chunk, _g2.KN)
        x, y = fb(jnp.asarray(sl))
        out[0, :, :, lo:hi] = np.asarray(x)[:, :, :hi - lo]
        out[1, :, :, lo:hi] = np.asarray(y)[:, :, :hi - lo]
    return out, inf


def setup(cs: ConstraintSystem, n_public: int, seed: int = 0):
    """Build (ProvingKey, VerifyingKey). Toxic waste from `seed` — dev only."""
    rng = random.Random(("groth16-setup", seed).__repr__())
    tau, alpha, beta, gamma, delta = (rng.randrange(1, fr.P) for _ in range(5))

    m = 1 << max(1, (cs.n_constraints - 1).bit_length())
    lag = _lagrange_at_tau(m, tau)

    nv = cs.n_vars
    u = [0] * nv
    v = [0] * nv
    w_ = [0] * nv
    for (acc, mat) in ((u, cs.a), (v, cs.b), (w_, cs.c)):
        for row, col, coeff in mat:
            acc[col] = (acc[col] + coeff * lag[row]) % fr.P

    gamma_inv = pow(gamma, fr.P - 2, fr.P)
    delta_inv = pow(delta, fr.P - 2, fr.P)
    zh = (pow(tau, m, fr.P) - 1) % fr.P

    k_scalars = [(beta * u[j] + alpha * v[j] + w_[j]) % fr.P * delta_inv % fr.P
                 for j in range(n_public + 1, nv)]
    tau_pows = [1] * (m - 1)
    for i in range(1, m - 1):
        tau_pows[i] = tau_pows[i - 1] * tau % fr.P
    zd = zh * delta_inv % fr.P
    a_q, a_inf = _g1_mul_many(u)
    b1_q, b1_inf = _g1_mul_many(v)
    k_q, k_inf = _g1_mul_many(k_scalars)
    h_q, h_inf = _g1_mul_many([t * zd % fr.P for t in tau_pows])
    b2_q, b2_inf = _g2_mul_many(v)
    assert not h_inf.any()
    ic = [_g1_mul((beta * u[j] + alpha * v[j] + w_[j]) % fr.P
                  * gamma_inv % fr.P) for j in range(n_public + 1)]

    pk = ProvingKey(
        n_public=n_public, domain_size=m,
        alpha1=_g1_mul(alpha), beta1=_g1_mul(beta), delta1=_g1_mul(delta),
        beta2=pr.ec_mul(pr.G2, beta), delta2=pr.ec_mul(pr.G2, delta),
        a_query=a_q, b1_query=b1_q, k_query=k_q, h_query=h_q,
        b2_query=b2_q, a_inf=a_inf, b1_inf=b1_inf, k_inf=k_inf,
        b2_inf=b2_inf)
    vk = VerifyingKey(
        n_public=n_public, alpha1=pk.alpha1, beta2=pk.beta2,
        gamma2=pr.ec_mul(pr.G2, gamma), delta2=pk.delta2, ic=ic)
    return pk, vk


# -- prover -------------------------------------------------------------------

def _coset_scale(m: int, inverse: bool) -> np.ndarray:
    g = pow(_COSET_G, fr.P - 2, fr.P) if inverse else _COSET_G
    return fr.batch_to_limbs([pow(g, i, fr.P) for i in range(m)])  # (16, m)


# Row-chunk size for Az/Bz/Cz evaluation: the flagship lowering is ~515k
# constraints / ~2.2M nnz, whose one-shot product tensors would not fit
# HBM. Chunks are bucket-padded so ONE compiled matvec serves every chunk,
# and all matrix data travels as runtime arguments — baking 2.2M triplets
# into the HLO as constants exceeds the remote compiler's request limit
# (HTTP 413 on the tunnel) and bloats the cache.
_H_CHUNK = 131072


@functools.lru_cache(maxsize=8)
def _matvec_fn(n_rows: int):
    return jax.jit(lambda rows, cols, coeffs, w: _sparse_matvec(
        rows, cols, coeffs, w, n_rows))


@functools.lru_cache(maxsize=8)
def _h_from_evals_fn(m: int):
    zh_inv = pow((pow(_COSET_G, m, fr.P) - 1) % fr.P, fr.P - 2, fr.P)

    # twiddles/bit-reverse ride as runtime operands: baked in as constants
    # they are ~64B*m of HLO, which overflows the remote compiler's
    # request body limit at m = 2^21 (HTTP 413 over the axon tunnel)
    @jax.jit
    def fn(az, bz, cz, shift, unshift, tw_f, tw_i, rev):
        def to_coset_evals(e):
            coeffs = _ntt.intt(e, twiddles=tw_i, rev=rev)
            return _ntt.ntt(fr.mul(coeffs,
                                   jnp.broadcast_to(shift, coeffs.shape)),
                            twiddles=tw_f, rev=rev)

        ac, bc, cc_ = map(to_coset_evals, (az, bz, cz))
        num = fr.sub(fr.mul(ac, bc), cc_)
        h_ev = fr.mul(num, fr.const(zh_inv, num.shape[1:]))
        h = fr.mul(_ntt.intt(h_ev, twiddles=tw_i, rev=rev),
                   jnp.broadcast_to(unshift, h_ev.shape))
        return h[:, :m - 1]

    return fn


def _chunked_triplets(cs: ConstraintSystem):
    """Per-matrix lists of bucket-padded (rows, cols, coeffs) chunk arrays,
    cached on the instance as DEVICE arrays: the triplets are per-circuit
    constants (~0.5 GB at the ECDSA config's 7M nnz) and re-uploading them
    over the device tunnel on every prove call dominated h(X) wall time.
    Padding entries have coeff 0 (they contribute nothing to any row)."""
    prep = getattr(cs, "_g16_h_prep", None)
    if prep is not None:
        return prep
    n_con = cs.n_constraints
    out = []
    for rows, cols, coeffs in cs.matrices():
        chunks = []
        for lo in range(0, n_con, _H_CHUNK):
            hi = min(n_con, lo + _H_CHUNK)
            msk = (rows >= lo) & (rows < hi)
            r, c, v = rows[msk] - lo, cols[msk], coeffs[msk]
            bucket = max(8, 1 << (max(1, len(r)) - 1).bit_length())
            pad = bucket - len(r)
            r = np.pad(r, (0, pad))
            c = np.pad(c, (0, pad))
            v = np.pad(v, ((0, pad), (0, 0)))
            chunks.append((jnp.asarray(r), jnp.asarray(c), jnp.asarray(v)))
        out.append(chunks)
    cs._g16_h_prep = out
    return out


# Above this domain size the fused 3-transform h program exceeds HBM
# (each 16-limb product stage materializes a (256, m) temp; the fused
# graph keeps several alive — 18.5G > 15.75G at m=2^21). The split path
# runs one transform per program so XLA can retire each stage's temps.
_H_SPLIT_DOMAIN = 1 << 20


@functools.lru_cache(maxsize=8)
def _intt_fn():
    return jax.jit(lambda e, tw, rev: _ntt.intt(e, twiddles=tw, rev=rev))


@functools.lru_cache(maxsize=8)
def _coset_ntt_fn():
    return jax.jit(lambda c, shift, tw, rev: _ntt.ntt(
        fr.mul(c, jnp.broadcast_to(shift, c.shape)),
        twiddles=tw, rev=rev))


@functools.lru_cache(maxsize=8)
def _h_combine_fn(m: int):
    zh_inv = pow((pow(_COSET_G, m, fr.P) - 1) % fr.P, fr.P - 2, fr.P)

    @jax.jit
    def fn(ac, bc, cc_):
        num = fr.sub(fr.mul(ac, bc), cc_)
        return fr.mul(num, fr.const(zh_inv, num.shape[1:]))

    return fn


@functools.lru_cache(maxsize=8)
def _h_final_fn(m: int):
    @jax.jit
    def fn(h_ev, unshift, tw, rev):
        return fr.mul(_ntt.intt(h_ev, twiddles=tw, rev=rev),
                      jnp.broadcast_to(unshift, h_ev.shape))[:, :m - 1]

    return fn


def h_coefficients(cs: ConstraintSystem, witness):
    """Device computation of h(X) = (Az*Bz - Cz)/Z coefficients.

    witness: (n_vars, 16, B) Fr limbs. Returns (16, m-1, B)."""
    n_con = cs.n_constraints
    m = 1 << max(1, (n_con - 1).bit_length())
    witness = jnp.asarray(witness)
    bshape = witness.shape[2:]
    evs = []
    for chunks in _chunked_triplets(cs):
        parts = []
        for lo, (r, c, v) in zip(range(0, n_con, _H_CHUNK), chunks):
            n_rows = min(n_con, lo + _H_CHUNK) - lo
            e = _matvec_fn(_H_CHUNK if n_con > _H_CHUNK else n_con)(
                r, c, v, witness)
            parts.append(e[:n_rows])
        e = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
        e = jnp.moveaxis(e, 0, 1)                       # (16, n_con, *B)
        pad = [(0, 0)] * e.ndim
        pad[1] = (0, m - n_con)
        evs.append(jnp.pad(e, pad))
    shift = jnp.asarray(_coset_scale(m, False)[:, :, None])
    unshift = jnp.asarray(_coset_scale(m, True)[:, :, None])
    log_m = m.bit_length() - 1
    tw_f = tuple(jnp.asarray(s) for s in _ntt._twiddles(log_m, False))
    tw_i = tuple(jnp.asarray(s) for s in _ntt._twiddles(log_m, True))
    rev = jnp.asarray(_ntt._bit_reverse(log_m))
    if m < _H_SPLIT_DOMAIN:
        return _h_from_evals_fn(m)(*evs, shift, unshift, tw_f, tw_i, rev)
    coset = []
    for e in evs:
        c = _intt_fn()(e, tw_i, rev)
        coset.append(_coset_ntt_fn()(c, shift, tw_f, rev))
        del c
    h_ev = _h_combine_fn(m)(*coset)
    del coset
    return _h_final_fn(m)(h_ev, unshift, tw_i, rev)


_msm_jit = jax.jit(_msm.msm_affine, static_argnames=("curve",))


_MSM_CHUNK = 65536
_MSM_CHUNK_G2 = 16384                   # FQ2 coords double the footprint


def _g1_add_int(p, q):
    """Host affine addition over plain ints (None = infinity)."""
    if p is None:
        return q
    if q is None:
        return p
    x1, y1 = p
    x2, y2 = q
    if x1 == x2:
        if (y1 + y2) % _Q == 0:
            return None
        lam = 3 * x1 * x1 % _Q * pow(2 * y1, _Q - 2, _Q) % _Q
    else:
        lam = (y2 - y1) * pow(x2 - x1, _Q - 2, _Q) % _Q
    x3 = (lam * lam - x1 - x2) % _Q
    return (x3, (lam * (x1 - x3) - y1) % _Q)


_MSM_HOST_CUTOFF = 512


def _msm_lanes_host(query: np.ndarray, scalars: np.ndarray, nb: int,
                    g2f: bool) -> list:
    """Host-int MSM for small queries (one windowed mult + add per point
    per lane)."""
    n = query.shape[-1]
    out = []
    for lane in range(nb):
        ks = [bn.limbs_to_int(scalars[:, lane, j]) for j in range(n)]
        acc = None
        for j, k in enumerate(ks):
            if k == 0:
                continue
            if g2f:
                pt = _g2.limbs_to_point(query[0][..., j], query[1][..., j])
                acc = pr.ec_add(acc, pr.ec_mul(pt, k))
            else:
                xi = bn.limbs_to_int(query[0][:, j])
                yi = bn.limbs_to_int(query[1][:, j])
                if xi or yi:
                    acc = _g1_add_int(acc, _g1_mul_point((xi, yi), k))
        out.append(acc)
    return out


def _msm_lanes(query: np.ndarray, inf_mask, scalars: np.ndarray,
               curve: str = "bn254_g1", dev_cache: dict = None,
               cache_key: str = "") -> list:
    """Device MSM of a query table against per-lane scalars.

    query: (2, k, N) G1 / (2, k, 2, N) G2 affine limbs;
    scalars: (16, B, N) Fr limbs (B proof lanes sharing the table — the
    per-point window tables are built ONCE and reused by every lane).
    N chunks are bucket-padded to powers of two so query sizes reuse
    compiled MSM executables (one huge program OOMs the compile helper at
    the flagship's 2^19 lanes); chunk partials combine host-side.
    `dev_cache` (keyed per proving key) keeps the padded query chunks
    device-resident across prove calls — re-uploading the multi-hundred-MB
    query tables over the device tunnel otherwise dominates wall time.
    Returns one host affine point per lane (ints for G1, pairing FQ2
    points for G2; None = infinity)."""
    g2f = curve == "bn254_g2"
    n = query.shape[-1]
    nb = scalars.shape[1]
    if n == 0:
        return [None] * nb
    s = scalars
    if inf_mask is not None and inf_mask.any():
        s = scalars.copy()
        s[:, :, inf_mask] = 0
    if n <= _MSM_HOST_CUTOFF:
        # tiny MSMs (demo/test circuits): host ints beat compiling a
        # device program — an XLA build of the windowed-MSM graph costs
        # minutes while a few hundred host mults cost milliseconds
        return _msm_lanes_host(query, s, nb, g2f)
    chunk = _MSM_CHUNK_G2 if g2f else _MSM_CHUNK
    per_lane = [None] * nb
    for lo in range(0, n, chunk):
        hi = min(n, lo + chunk)
        sc = s[..., lo:hi]
        w = hi - lo
        bucket = max(8, 1 << (w - 1).bit_length())
        if bucket != w:
            sc = np.pad(sc, [(0, 0)] * (sc.ndim - 1) + [(0, bucket - w)])
        ck = (cache_key, lo)
        if dev_cache is not None and ck in dev_cache:
            qx, qy = dev_cache[ck]
        else:
            q = query[..., lo:hi]
            if bucket != w:
                q = np.pad(q, [(0, 0)] * (q.ndim - 1) + [(0, bucket - w)])
            qx, qy = jnp.asarray(q[0]), jnp.asarray(q[1])
            if dev_cache is not None:
                dev_cache[ck] = (qx, qy)
        x, y = _msm_jit(qx, qy, jnp.asarray(sc), curve=curve)
        x, y = np.asarray(x), np.asarray(y)            # (k[,2], B)
        for lane in range(nb):
            if g2f:
                pt = _g2.limbs_to_point(x[..., lane], y[..., lane])
                per_lane[lane] = pr.ec_add(per_lane[lane], pt)
            else:
                xi = bn.limbs_to_int(x[:, lane])
                yi = bn.limbs_to_int(y[:, lane])
                pt = None if xi == 0 and yi == 0 else (xi, yi)
                per_lane[lane] = _g1_add_int(per_lane[lane], pt)
    return per_lane


def prove(pk: ProvingKey, cs: ConstraintSystem, witness, seed: int = 1):
    """Groth16 prove over a batched witness (n_vars, 16, B) -> [Proof]*B.

    All four G1 MSMs and the pi_B G2 MSM run lane-batched on device; the
    host only combines chunk partials and applies the r/s blinding."""
    witness = np.asarray(witness)
    nv, _, batch = witness.shape
    rng = random.Random(("groth16-prove", seed).__repr__())

    import os
    import time as _time
    trace = os.environ.get("PZK_G16_TRACE") == "1"

    def _t(label, fn):
        t0 = _time.time()
        out = fn()
        if trace:
            print(f"  [g16] {label:10s} {_time.time() - t0:8.1f}s",
                  flush=True)
        return out

    if not hasattr(pk, "_dev_cache"):
        pk._dev_cache = {}
    dc = pk._dev_cache

    h = _t("h(X)", lambda: np.asarray(
        h_coefficients(cs, jnp.asarray(witness))))            # (16, m-1, B)
    w_s = np.ascontiguousarray(witness.transpose(1, 2, 0))    # (16, B, nv)

    a_sums = _t("msm A", lambda: _msm_lanes(
        pk.a_query, pk.a_inf, w_s, dev_cache=dc, cache_key="a"))
    b1_sums = _t("msm B1", lambda: _msm_lanes(
        pk.b1_query, pk.b1_inf, w_s, dev_cache=dc, cache_key="b1"))
    k_sums = _t("msm K", lambda: _msm_lanes(
        pk.k_query, pk.k_inf,
        np.ascontiguousarray(w_s[:, :, pk.n_public + 1:]),
        dev_cache=dc, cache_key="k"))
    h_sums = _t("msm H", lambda: _msm_lanes(
        pk.h_query, None, np.ascontiguousarray(h.transpose(0, 2, 1)),
        dev_cache=dc, cache_key="h"))
    b2_sums = _t("msm B2(G2)", lambda: _msm_lanes(
        pk.b2_query, pk.b2_inf, w_s, curve="bn254_g2",
        dev_cache=dc, cache_key="b2"))

    proofs = []
    for lane in range(batch):
        r_rand = rng.randrange(fr.P)
        s_rand = rng.randrange(fr.P)

        # pi_A = alpha + sum w_j u_j(tau) + r delta
        pi_a = pr.ec_add(pr.ec_add(_g1_wrap(pk.alpha1),
                                   _g1_wrap(a_sums[lane])),
                         pr.ec_mul(_g1_wrap(pk.delta1), r_rand))
        # pi_B (G2) = beta + sum w_j [v_j(tau)]G2 + s delta
        pi_b2 = pr.ec_add(pk.beta2, pr.ec_mul(pk.delta2, s_rand))
        pi_b2 = pr.ec_add(pi_b2, b2_sums[lane])
        # pi_B in G1 (for pi_C)
        pi_b1 = pr.ec_add(pr.ec_add(_g1_wrap(pk.beta1),
                                    _g1_wrap(b1_sums[lane])),
                          pr.ec_mul(_g1_wrap(pk.delta1), s_rand))
        # pi_C = K + H + s pi_A + r pi_B1 - r s delta
        pi_c = pr.ec_add(_g1_wrap(k_sums[lane]), _g1_wrap(h_sums[lane]))
        pi_c = pr.ec_add(pi_c, pr.ec_mul(pi_a, s_rand))
        pi_c = pr.ec_add(pi_c, pr.ec_mul(pi_b1, r_rand))
        pi_c = pr.ec_add(pi_c, pr.ec_mul(_g1_wrap(pk.delta1),
                                         (-r_rand * s_rand) % fr.P))
        proofs.append(Proof(a=_g1_unwrap(pi_a), b=pi_b2, c=_g1_unwrap(pi_c)))
    return proofs


# -- verifier -----------------------------------------------------------------

def verify(vk: VerifyingKey, proof: Proof, public_inputs: Sequence[int]) -> bool:
    """e(A, B) == e(alpha, beta) e(IC(pub), gamma) e(C, delta)."""
    if len(public_inputs) != vk.n_public:
        return False
    ic = _g1_wrap(vk.ic[0])
    for j, x in enumerate(public_inputs, start=1):
        ic = pr.ec_add(ic, pr.ec_mul(_g1_wrap(vk.ic[j]), x % fr.P))

    a_pt = _g1_wrap(proof.a)
    c_pt = _g1_wrap(proof.c)
    if not (pr.on_curve(a_pt, pr.B1) and pr.on_curve(c_pt, pr.B1)
            and pr.on_curve(proof.b, pr.B2)):
        return False

    f = pr.miller_loop(pr.twist(proof.b), pr.cast_g1(a_pt))
    f = f * pr.miller_loop(pr.twist(vk.beta2),
                           pr.cast_g1(pr.ec_neg(_g1_wrap(vk.alpha1))))
    f = f * pr.miller_loop(pr.twist(vk.gamma2), pr.cast_g1(pr.ec_neg(ic)))
    f = f * pr.miller_loop(pr.twist(vk.delta2), pr.cast_g1(pr.ec_neg(c_pt)))
    return pr.final_exponentiate(f) == pr.FQ12.one()
