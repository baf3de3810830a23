"""Batched Keccak-f[1600] permutation, Keccak-256 / SHA3-256 and the
Ethereum address derivation.

Capability twin of /root/reference/circuits/lib/circuits/hasher/sha3/keccak/
(keccak.circom:6-222 Pad/KeccakfRound/Absorb/Squeeze/Keccakf/Keccak +
permutations.circom theta/rho/pi/chi/iota) and eth/eth.circom:7-45
(GetEthAddrFromPubKey = keccak256(pubkey_bytes)[12:]).

64-bit lanes are (hi, lo) uint32 pairs; state (5, 5, 2, *B) indexed [x][y].
Round constants and rotation offsets are generated programmatically (LFSR /
triangular-number walk) rather than transcribed.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

_u32 = jnp.uint32


def _round_constants():
    """24 iota constants via the standard LFSR (FIPS 202 Algorithm 5)."""
    rcs = []
    R = 1
    for _ in range(24):
        rc = 0
        for j in range(7):
            if R & 1:
                rc |= 1 << ((1 << j) - 1)
            R = ((R << 1) ^ (0x71 if R & 0x80 else 0)) & 0xFF
        rcs.append(rc)
    return rcs


def _rho_offsets():
    """Rotation offsets via the (t+1)(t+2)/2 walk (FIPS 202 §3.2.2)."""
    offs = np.zeros((5, 5), dtype=np.int32)
    x, y = 1, 0
    for t in range(24):
        offs[x][y] = ((t + 1) * (t + 2) // 2) % 64
        x, y = y, (2 * x + 3 * y) % 5
    return offs


_RC = _round_constants()
_RHO = _rho_offsets()
_RC_PAIRS = np.array([[rc >> 32, rc & 0xFFFFFFFF] for rc in _RC],
                     dtype=np.uint32)


def _rotl64(lane, n):
    """lane: (2, *B) (hi, lo); static rotation left by n."""
    hi, lo = lane[0], lane[1]
    n %= 64
    if n == 0:
        return lane
    if n == 32:
        return jnp.stack([lo, hi])
    if n > 32:
        hi, lo = lo, hi
        n -= 32
    return jnp.stack([(hi << n) | (lo >> (32 - n)),
                      (lo << n) | (hi >> (32 - n))])


def keccak_f(state):
    """state: (5, 5, 2, *B) uint32, [x][y] lane order -> permuted state."""

    def round_(st, rc):
        # theta
        C = st[:, 0]
        for y in range(1, 5):
            C = C ^ st[:, y]                        # (5, 2, *B)
        D = []
        for x in range(5):
            D.append(C[(x - 1) % 5] ^ _rotl64(C[(x + 1) % 5], 1))
        st = jnp.stack([st[x] ^ D[x][None] for x in range(5)])
        # rho + pi
        B = [[None] * 5 for _ in range(5)]
        for x in range(5):
            for y in range(5):
                B[y][(2 * x + 3 * y) % 5] = _rotl64(st[x, y], int(_RHO[x][y]))
        # chi
        rows = []
        for x in range(5):
            cols = []
            for y in range(5):
                cols.append(B[x][y] ^ (~B[(x + 1) % 5][y] & B[(x + 2) % 5][y]))
            rows.append(jnp.stack(cols))
        st = jnp.stack(rows)
        # iota
        bshape = st.shape[3:]
        rc_lane = jnp.broadcast_to(rc.reshape((2,) + (1,) * len(bshape)),
                                   (2,) + bshape)
        st = st.at[0, 0].set(st[0, 0] ^ rc_lane)
        return st, None

    state, _ = jax.lax.scan(round_, state, jnp.asarray(_RC_PAIRS))
    return state


# ---------------------------------------------------------------------------
# Keccak-256 / SHA3-256 over byte tensors
# ---------------------------------------------------------------------------

RATE_BYTES = 136   # 1088-bit rate for 256-bit output


def pad_keccak(data_len: int, sha3: bool = False):
    """Host: returns the padded length and the padding byte positions for a
    static message length (Pad analog, keccak.circom:6-36). Domain byte:
    0x01 legacy Keccak, 0x06 SHA-3."""
    n_blocks = data_len // RATE_BYTES + 1
    padded_len = n_blocks * RATE_BYTES
    first = 0x06 if sha3 else 0x01
    return padded_len, first


def keccak256_bytes(byte_rows, sha3: bool = False, bshape=None):
    """Batched Keccak-256. byte_rows: list of n per-byte (*B,) uint32
    tensors or int constants (static length). Returns 32 byte tensors.
    `bshape` is required when every row is a constant (e.g. empty input)."""
    if bshape is None:
        for b in byte_rows:
            if not isinstance(b, int):
                bshape = b.shape
                break
    if bshape is None:
        bshape = ()
    n = len(byte_rows)
    padded_len, first = pad_keccak(n, sha3)
    rows = [jnp.broadcast_to(jnp.asarray(b, dtype=_u32), bshape)
            if isinstance(b, int) else b for b in byte_rows]
    pad = [0] * (padded_len - n)
    pad[0] |= first
    pad[-1] |= 0x80
    rows = rows + [jnp.broadcast_to(jnp.asarray(v, dtype=_u32), bshape)
                   for v in pad]

    state = jnp.zeros((5, 5, 2) + bshape, dtype=_u32)
    n_blocks = padded_len // RATE_BYTES
    for blk in range(n_blocks):
        block = rows[blk * RATE_BYTES:(blk + 1) * RATE_BYTES]
        # little-endian lanes: lane i = bytes 8i..8i+7; lane i -> (x,y) with
        # x = i % 5, y = i // 5
        upd = state
        for i in range(RATE_BYTES // 8):
            bs = block[8 * i:8 * i + 8]
            lo = bs[0] | (bs[1] << 8) | (bs[2] << 16) | (bs[3] << 24)
            hi = bs[4] | (bs[5] << 8) | (bs[6] << 16) | (bs[7] << 24)
            x, y = i % 5, i // 5
            upd = upd.at[x, y, 0].set(upd[x, y, 0] ^ hi)
            upd = upd.at[x, y, 1].set(upd[x, y, 1] ^ lo)
        state = keccak_f(upd)

    out = []
    for i in range(4):                      # 32 bytes = 4 lanes
        x, y = i % 5, i // 5
        hi, lo = state[x, y, 0], state[x, y, 1]
        for b in range(4):
            out.append((lo >> (8 * b)) & 0xFF)
        for b in range(4):
            out.append((hi >> (8 * b)) & 0xFF)
    return out


def eth_address_from_pubkey(pk_bytes64):
    """GetEthAddrFromPubKey analog (eth/eth.circom:7-45): keccak256 of the
    64-byte uncompressed pubkey, low 20 bytes. pk_bytes64: list of 64
    per-byte tensors. Returns 20 byte tensors."""
    digest = keccak256_bytes(pk_bytes64)
    return digest[12:]
