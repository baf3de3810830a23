"""Batched SHA-1 / SHA-2 family over pre-padded message blocks, TPU-native.

Capability twin of the reference's bit-level hash circuits
(/root/reference/circuits/lib/circuits/hasher/sha2/* ``Sha{224,256,384,512}
HashChunks``, hasher/sha1/* ``Sha1HashChunks``, dispatch facade
hasher/hash.circom:32 ``ShaHashChunks(BLOCK_NUM, ALGO)``). The reference
unrolls every boolean gate as an R1CS constraint; here each instance's
message words live on TPU lanes (batch minor-most) and the compression is
plain uint32 word arithmetic under ``lax.scan`` — one round body per
algorithm in the compiled graph.

Message padding stays host-side (ingest/), mirroring the reference's
off-circuit padding (test/process_passport.js:11-91); `pad_message` below is
the host helper.

Layouts:
  * 32-bit algorithms (SHA-1/224/256): message (16*nb, *B) uint32, big-endian
    words; digest (n_words, *B).
  * 64-bit algorithms (SHA-384/512): 64-bit words as hi/lo uint32 pairs with
    a trailing pair axis folded into the word axis: (16*nb, 2, *B).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import jax
import jax.numpy as jnp

_u32 = jnp.uint32


# ---------------------------------------------------------------------------
# Host-side: padding + byte <-> word-array conversion
# ---------------------------------------------------------------------------

def pad_message(data: bytes, block_bits: int) -> bytes:
    """MD-style padding (SHA-1/2): 0x80, zeros, 64/128-bit big-endian length.
    block_bits: 512 (SHA-1/224/256) or 1024 (SHA-384/512).
    Mirrors process_passport.js:11-91 `padding`."""
    L = len(data) * 8
    lenfield = 8 if block_bits == 512 else 16
    data = data + b"\x80"
    while (len(data) + lenfield) % (block_bits // 8) != 0:
        data += b"\x00"
    return data + L.to_bytes(lenfield, "big")


def bytes_to_words32(data: bytes) -> np.ndarray:
    """Padded bytes -> (n_words,) uint32 big-endian words."""
    assert len(data) % 4 == 0
    return np.frombuffer(data, dtype=">u4").astype(np.uint32)


def bytes_to_words64(data: bytes) -> np.ndarray:
    """Padded bytes -> (n_words, 2) uint32 (hi, lo) big-endian 64-bit words."""
    assert len(data) % 8 == 0
    w = np.frombuffer(data, dtype=">u8")
    return np.stack([(w >> 32).astype(np.uint32),
                     (w & 0xFFFFFFFF).astype(np.uint32)], axis=1)


def digest_to_bytes32(digest: np.ndarray) -> bytes:
    """(n_words,) uint32 -> big-endian bytes (single instance)."""
    return b"".join(struct.pack(">I", int(x)) for x in np.asarray(digest))


def digest_to_bytes64(digest: np.ndarray) -> bytes:
    d = np.asarray(digest)
    return b"".join(struct.pack(">II", int(hi), int(lo)) for hi, lo in d)


# ---------------------------------------------------------------------------
# 32-bit core (SHA-1, SHA-224, SHA-256)
# ---------------------------------------------------------------------------

def _rotr(x, n):
    return (x >> n) | (x << (32 - n))


def _rotl(x, n):
    return (x << n) | (x >> (32 - n))


# FIPS 180-4 constants (fractional parts of cube roots of primes 2..311)
_K256 = np.array([int(k, 16) for k in """
428a2f98 71374491 b5c0fbcf e9b5dba5 3956c25b 59f111f1 923f82a4 ab1c5ed5
d807aa98 12835b01 243185be 550c7dc3 72be5d74 80deb1fe 9bdc06a7 c19bf174
e49b69c1 efbe4786 0fc19dc6 240ca1cc 2de92c6f 4a7484aa 5cb0a9dc 76f988da
983e5152 a831c66d b00327c8 bf597fc7 c6e00bf3 d5a79147 06ca6351 14292967
27b70a85 2e1b2138 4d2c6dfc 53380d13 650a7354 766a0abb 81c2c92e 92722c85
a2bfe8a1 a81a664b c24b8b70 c76c51a3 d192e819 d6990624 f40e3585 106aa070
19a4c116 1e376c08 2748774c 34b0bcb5 391c0cb3 4ed8aa4a 5b9cca4f 682e6ff3
748f82ee 78a5636f 84c87814 8cc70208 90befffa a4506ceb bef9a3f7 c67178f2
""".split()], dtype=np.uint32)

_H256 = np.array([0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
                  0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19],
                 dtype=np.uint32)
_H224 = np.array([0xc1059ed8, 0x367cd507, 0x3070dd17, 0xf70e5939,
                  0xffc00b31, 0x68581511, 0x64f98fa7, 0xbefa4fa4],
                 dtype=np.uint32)


def _sha256_block(state, block):
    """state: (8, *B); block: (16, *B) -> new state."""
    # message schedule: scan carrying a 16-word window
    def sched(win, _):
        s0 = _rotr(win[1], 7) ^ _rotr(win[1], 18) ^ (win[1] >> 3)
        s1 = _rotr(win[14], 17) ^ _rotr(win[14], 19) ^ (win[14] >> 10)
        w = win[0] + s0 + win[9] + s1
        return jnp.concatenate([win[1:], w[None]], axis=0), w

    _, w_ext = jax.lax.scan(sched, block, None, length=48)
    W = jnp.concatenate([block, w_ext], axis=0)            # (64, *B)

    def round_(s, xs):
        w, k = xs
        a, b, c, d, e, f, g, h = (s[i] for i in range(8))
        S1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = h + S1 + ch + k + w
        S0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = S0 + maj
        return jnp.stack([t1 + t2, a, b, c, d + t1, e, f, g]), None

    out, _ = jax.lax.scan(round_, state, (W, jnp.asarray(_K256)))
    return state + out


def _sha2_32(msg, iv, out_words):
    """Shared SHA-224/256 driver. msg: (16*nb, *B) uint32.
    On verified TPU all blocks run as ONE fused Pallas kernel."""
    msg = jnp.asarray(msg, dtype=_u32)
    from . import pallas_field as pf
    if msg.ndim == 2 and pf.use_pallas():
        from . import pallas_sha2
        return pallas_sha2.sha2_32_chunks(msg, 256 if out_words == 8
                                          else 224)
    nb = msg.shape[0] // 16
    blocks = msg.reshape((nb, 16) + msg.shape[1:])
    state = jnp.broadcast_to(
        jnp.asarray(iv).reshape((8,) + (1,) * (msg.ndim - 1)),
        (8,) + msg.shape[1:])

    def body(state, block):
        return _sha256_block(state, block), None

    state, _ = jax.lax.scan(body, state, blocks)
    return state[:out_words]


def sha256_chunks(msg):
    """Batched SHA-256 of pre-padded words. msg: (16*nb, *B) -> (8, *B).
    Sha256HashChunks analog (hasher/sha2/sha256/sha256HashChunks.circom:8)."""
    return _sha2_32(msg, _H256, 8)


def sha224_chunks(msg):
    """Sha224HashChunks analog."""
    return _sha2_32(msg, _H224, 7)


# ---------------------------------------------------------------------------
# SHA-1
# ---------------------------------------------------------------------------

_H1 = np.array([0x67452301, 0xEFCDAB89, 0x98BADCFE, 0x10325476, 0xC3D2E1F0],
               dtype=np.uint32)
_K1 = np.array([0x5A827999, 0x6ED9EBA1, 0x8F1BBCDC, 0xCA62C1D6],
               dtype=np.uint32)


def _sha1_block(state, block):
    def sched(win, _):
        w = _rotl(win[13] ^ win[8] ^ win[2] ^ win[0], 1)
        return jnp.concatenate([win[1:], w[None]], axis=0), w

    _, w_ext = jax.lax.scan(sched, block, None, length=64)
    W = jnp.concatenate([block, w_ext], axis=0)            # (80, *B)
    stage = jnp.repeat(jnp.arange(4, dtype=jnp.int32), 20)

    def round_(s, xs):
        w, st = xs
        a, b, c, d, e = (s[i] for i in range(5))
        f_ch = (b & c) | (~b & d)
        f_par = b ^ c ^ d
        f_maj = (b & c) | (b & d) | (c & d)
        f = jnp.where(st == 0, f_ch,
                      jnp.where(st == 1, f_par,
                                jnp.where(st == 2, f_maj, f_par)))
        k = jnp.asarray(_K1)[st]
        t = _rotl(a, 5) + f + e + k + w
        return jnp.stack([t, a, _rotl(b, 30), c, d]), None

    out, _ = jax.lax.scan(round_, state, (W, stage))
    return state + out


def sha1_chunks(msg):
    """Batched SHA-1. msg: (16*nb, *B) -> (5, *B).
    Sha1HashChunks analog (hasher/sha1/sha1.circom:7)."""
    msg = jnp.asarray(msg, dtype=_u32)
    nb = msg.shape[0] // 16
    blocks = msg.reshape((nb, 16) + msg.shape[1:])
    state = jnp.broadcast_to(
        jnp.asarray(_H1).reshape((5,) + (1,) * (msg.ndim - 1)),
        (5,) + msg.shape[1:])
    state, _ = jax.lax.scan(lambda s, b: (_sha1_block(s, b), None),
                            state, blocks)
    return state


# ---------------------------------------------------------------------------
# 64-bit core (SHA-384, SHA-512) — 64-bit words as (hi, lo) uint32 pairs
# ---------------------------------------------------------------------------

def _u64(hi, lo):
    return jnp.stack([hi, lo], axis=0)


def _add64(x, y):
    lo = x[1] + y[1]
    carry = (lo < x[1]).astype(_u32)
    return _u64(x[0] + y[0] + carry, lo)


def _xor64(x, y):
    return x ^ y


def _and64(x, y):
    return x & y


def _not64(x):
    return ~x


def _rotr64(x, n):
    hi, lo = x[0], x[1]
    if n == 32:
        return _u64(lo, hi)
    if n > 32:
        n -= 32
        hi, lo = lo, hi
    return _u64((hi >> n) | (lo << (32 - n)), (lo >> n) | (hi << (32 - n)))


def _shr64(x, n):
    hi, lo = x[0], x[1]
    if n >= 32:
        return _u64(jnp.zeros_like(hi), hi >> (n - 32))
    return _u64(hi >> n, (lo >> n) | (hi << (32 - n)))


def _k512_words():
    # fractional parts of cube roots of the first 80 primes (FIPS 180-4)
    ks, p, count = [], 2, 0
    primes = []
    while count < 80:
        if all(p % q for q in primes):
            primes.append(p)
            count += 1
        p += 1
    import math
    for q in primes:
        frac = math.floor((q ** (1.0 / 3) % 1) * (1 << 64))
        ks.append(frac)
    return ks


# high-precision cube-root constants (computed exactly via integer nth-root)
def _k512_exact():
    ks = []
    p, primes = 2, []
    while len(primes) < 80:
        if all(p % q for q in primes):
            primes.append(p)
        p += 1
    for q in primes:
        # floor(cbrt(q) * 2^64) mod 2^64, via integer cube root of q * 2^192
        n = q << 192
        x = int(round(n ** (1 / 3)))
        while x * x * x > n:
            x -= 1
        while (x + 1) ** 3 <= n:
            x += 1
        ks.append(x & 0xFFFFFFFFFFFFFFFF)
    return ks


_K512 = np.array([[k >> 32, k & 0xFFFFFFFF] for k in _k512_exact()],
                 dtype=np.uint32)

_H512 = np.array([[0x6a09e667, 0xf3bcc908], [0xbb67ae85, 0x84caa73b],
                  [0x3c6ef372, 0xfe94f82b], [0xa54ff53a, 0x5f1d36f1],
                  [0x510e527f, 0xade682d1], [0x9b05688c, 0x2b3e6c1f],
                  [0x1f83d9ab, 0xfb41bd6b], [0x5be0cd19, 0x137e2179]],
                 dtype=np.uint32)
_H384 = np.array([[0xcbbb9d5d, 0xc1059ed8], [0x629a292a, 0x367cd507],
                  [0x9159015a, 0x3070dd17], [0x152fecd8, 0xf70e5939],
                  [0x67332667, 0xffc00b31], [0x8eb44a87, 0x68581511],
                  [0xdb0c2e0d, 0x64f98fa7], [0x47b5481d, 0xbefa4fa4]],
                 dtype=np.uint32)


def _sha512_block(state, block):
    """state: (8, 2, *B); block: (16, 2, *B)."""
    def sched(win, _):
        w1, w14 = win[1], win[14]
        s0 = _xor64(_xor64(_rotr64(w1, 1), _rotr64(w1, 8)), _shr64(w1, 7))
        s1 = _xor64(_xor64(_rotr64(w14, 19), _rotr64(w14, 61)),
                    _shr64(w14, 6))
        w = _add64(_add64(win[0], s0), _add64(win[9], s1))
        return jnp.concatenate([win[1:], w[None]], axis=0), w

    _, w_ext = jax.lax.scan(sched, block, None, length=64)
    W = jnp.concatenate([block, w_ext], axis=0)            # (80, 2, *B)

    def round_(s, xs):
        w, k = xs
        a, b, c, d, e, f, g, h = (s[i] for i in range(8))
        S1 = _xor64(_xor64(_rotr64(e, 14), _rotr64(e, 18)), _rotr64(e, 41))
        ch = _xor64(_and64(e, f), _and64(_not64(e), g))
        t1 = _add64(_add64(h, S1), _add64(ch, _add64(k, w)))
        S0 = _xor64(_xor64(_rotr64(a, 28), _rotr64(a, 34)), _rotr64(a, 39))
        maj = _xor64(_xor64(_and64(a, b), _and64(a, c)), _and64(b, c))
        t2 = _add64(S0, maj)
        return jnp.stack([_add64(t1, t2), a, b, c, _add64(d, t1),
                          e, f, g]), None

    k_bcast = jnp.asarray(_K512).reshape(
        (80, 2) + (1,) * (state.ndim - 2))
    k_bcast = jnp.broadcast_to(k_bcast, (80, 2) + state.shape[2:])
    out, _ = jax.lax.scan(round_, state, (W, k_bcast))
    # final add per word
    lo = state[:, 1] + out[:, 1]
    carry = (lo < state[:, 1]).astype(_u32)
    return jnp.stack([state[:, 0] + out[:, 0] + carry, lo], axis=1)


def _sha2_64(msg, iv, out_words):
    msg = jnp.asarray(msg, dtype=_u32)
    nb = msg.shape[0] // 16
    blocks = msg.reshape((nb, 16, 2) + msg.shape[2:])
    state = jnp.broadcast_to(
        jnp.asarray(iv).reshape((8, 2) + (1,) * (msg.ndim - 2)),
        (8, 2) + msg.shape[2:])
    state, _ = jax.lax.scan(lambda s, b: (_sha512_block(s, b), None),
                            state, blocks)
    return state[:out_words]


def sha512_chunks(msg):
    """Batched SHA-512. msg: (16*nb, 2, *B) -> (8, 2, *B).
    Sha512HashChunks analog (hasher/sha2/sha512/)."""
    return _sha2_64(msg, _H512, 8)


def sha384_chunks(msg):
    """Sha384HashChunks analog: SHA-512 core, H384 IV, 6-word digest."""
    return _sha2_64(msg, _H384, 6)


# ---------------------------------------------------------------------------
# Dispatch facade — ShaHashChunks(BLOCK_NUM, ALGO) analog (hash.circom:32)
# ---------------------------------------------------------------------------

ALGO_BITS = {160: 512, 224: 512, 256: 512, 384: 1024, 512: 1024}
DIGEST_WORDS = {160: 5, 224: 7, 256: 8, 384: 6, 512: 8}


def sha_hash_chunks(msg, algo: int):
    """algo in {160 (SHA-1), 224, 256, 384, 512}; msg pre-padded words."""
    if algo == 160:
        return sha1_chunks(msg)
    if algo == 224:
        return sha224_chunks(msg)
    if algo == 256:
        return sha256_chunks(msg)
    if algo == 384:
        return sha384_chunks(msg)
    if algo == 512:
        return sha512_chunks(msg)
    raise ValueError(f"unsupported SHA algo {algo}")


def sha_hash_bytes_host(data: bytes, algo: int) -> bytes:
    """Host oracle via hashlib (test/ingest use)."""
    name = {160: "sha1", 224: "sha224", 256: "sha256",
            384: "sha384", 512: "sha512"}[algo]
    return hashlib.new(name, data).digest()


# ---------------------------------------------------------------------------
# In-graph hashing of composed byte streams — ShaHashBits analog
# (hash.circom:70: static-length input, padding applied in-circuit). Used
# when the message is *computed* on device (MGF1 counters, EM bytes, ...).
# ---------------------------------------------------------------------------

def pad_byte_rows(byte_rows, block_bits: int):
    """MD-pad a static-length list of per-byte rows ((*B,) tensors or int
    constants)."""
    L = len(byte_rows) * 8
    lenfield = 8 if block_bits == 512 else 16
    rows = list(byte_rows) + [0x80]
    while (len(rows) + lenfield) % (block_bits // 8) != 0:
        rows.append(0)
    rows += list(L.to_bytes(lenfield, "big"))
    return rows


def byte_rows_to_words(byte_rows, bshape):
    """4-byte big-endian packing of per-byte rows -> list of (*B,) words."""
    words = []
    for w in range(len(byte_rows) // 4):
        acc = jnp.zeros(bshape, dtype=_u32)
        for t in range(4):
            b = byte_rows[4 * w + t]
            if isinstance(b, int):
                acc = acc + jnp.uint32(b << (8 * (3 - t)))
            else:
                acc = acc + (b << (8 * (3 - t)))
        words.append(acc)
    return words


def sha_hash_byte_rows(byte_rows, algo: int, bshape):
    """Digest of a static-length byte-row stream, returned as byte rows."""
    msg = pad_byte_rows(byte_rows, ALGO_BITS[algo])
    words = jnp.stack(byte_rows_to_words(msg, bshape), axis=0)
    if algo in (384, 512):
        words = words.reshape((words.shape[0] // 2, 2) + bshape)
    dw = sha_hash_chunks(words, algo)
    if algo in (384, 512):
        dw = dw.reshape((dw.shape[0] * 2,) + bshape)
    return [(dw[j // 4] >> (8 * (3 - j % 4))) & 0xFF
            for j in range(dw.shape[0] * 4)]
