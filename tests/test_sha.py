"""SHA family bit-exactness vs hashlib (the oracle), batched multi-block."""
import hashlib
import random

import jax
import numpy as np
import pytest

from passport_zk_circuits_tpu.ops import sha2


pytestmark = pytest.mark.slow  # big-graph compile tier (SURVEY §4 budget)

rng = random.Random(7)


def _batch_words32(datas):
    ws = [sha2.bytes_to_words32(d) for d in datas]
    return np.stack(ws, axis=-1)                      # (n_words, B)


def _batch_words64(datas):
    ws = [sha2.bytes_to_words64(d) for d in datas]
    return np.stack(ws, axis=-1)                      # (n_words, 2, B)


@pytest.mark.parametrize("algo,name", [(160, "sha1"), (224, "sha224"),
                                       (256, "sha256"), (384, "sha384"),
                                       (512, "sha512")])
def test_sha_vs_hashlib(algo, name):
    B = 4
    blen = 64 if algo in (160, 224, 256) else 128
    # same padded length across batch (static shapes): 3 blocks worth of data
    msgs = [bytes(rng.randrange(256) for _ in range(2 * blen + 17))
            for _ in range(B)]
    padded = [sha2.pad_message(m, sha2.ALGO_BITS[algo]) for m in msgs]
    assert all(len(p) == len(padded[0]) for p in padded)
    if algo in (160, 224, 256):
        words = _batch_words32(padded)
    else:
        words = _batch_words64(padded)
    out = jax.jit(lambda w: sha2.sha_hash_chunks(w, algo))(words)
    out = np.asarray(jax.device_get(out))
    for j, m in enumerate(msgs):
        want = hashlib.new(name, m).digest()
        if algo in (160, 224, 256):
            got = sha2.digest_to_bytes32(out[:, j])
        else:
            got = sha2.digest_to_bytes64(out[:, :, j])
        assert got == want, f"{name} mismatch at batch {j}"


def test_sha256_empty_and_single_block():
    for m in [b"", b"abc", b"a" * 55, b"a" * 56, b"a" * 64]:
        padded = sha2.pad_message(m, 512)
        words = _batch_words32([padded])
        out = np.asarray(jax.device_get(sha2.sha256_chunks(words)))
        assert sha2.digest_to_bytes32(out[:, 0]) == hashlib.sha256(m).digest()


def test_sha512_boundary_lengths():
    for n in [0, 111, 112, 128]:
        m = b"x" * n
        padded = sha2.pad_message(m, 1024)
        words = _batch_words64([padded])
        out = np.asarray(jax.device_get(sha2.sha512_chunks(words)))
        assert sha2.digest_to_bytes64(out[:, :, 0]) == hashlib.sha512(m).digest()
