"""RSA PKCS#1 v1.5 verification vs pure-Python keygen/sign oracles."""
import hashlib
import random

import jax
import numpy as np
import pytest

from passport_zk_circuits_tpu.ops import bignum as bn
from passport_zk_circuits_tpu.ops import rsa
from passport_zk_circuits_tpu.ops import sha2
from passport_zk_circuits_tpu.utils.rsa_keygen import gen_rsa_key

rng = random.Random(77)
_KEYS = {}


def _key(bits, exp=65537):
    if (bits, exp) not in _KEYS:
        _KEYS[(bits, exp)] = gen_rsa_key(bits, rng, exp)
    return _KEYS[(bits, exp)]


@pytest.mark.parametrize("key_bits,hash_len,exp", [
    (2048, 256, 65537),   # SIG_ALGO 1 (flagship; stays in the fast tier)
    pytest.param(2048, 160, 65537, marks=pytest.mark.slow),  # SIG_ALGO 3
    pytest.param(3072, 160, 37187, marks=pytest.mark.slow),  # SIG_ALGO 4
])
def test_verify_pkcs1v15(key_bits, hash_len, exp):
    B = 2
    n, e, d = _key(key_bits, exp)
    k = key_bits // 16
    msgs = [bytes(rng.randrange(256) for _ in range(50)) for _ in range(B)]
    name = {160: "sha1", 256: "sha256"}[hash_len]
    digests = [hashlib.new(name, m).digest() for m in msgs]
    sigs = [rsa.sign_pkcs1v15(dg, d, n, key_bits) for dg in digests]

    sig_l = bn.ints_to_limbs_batch(sigs, k)
    pk_l = bn.ints_to_limbs_batch([n] * B, k)
    mu = bn.barrett_mu_batch([n] * B, k)
    algo = hash_len if hash_len != 160 else 160
    padded = [sha2.pad_message(m, 512) for m in msgs]
    words = np.stack([sha2.bytes_to_words32(p) for p in padded], axis=-1)
    dwords = sha2.sha_hash_chunks(words, algo)

    ok = jax.jit(lambda s, p, m, dw: rsa.verify_pkcs1v15(
        s, p, m, dw, hash_len, key_bits, exp))(sig_l, pk_l, mu, dwords)
    assert np.asarray(ok).all()

    # corrupt one signature -> that instance fails
    bad = list(sigs)
    bad[0] ^= 1
    bad_l = bn.ints_to_limbs_batch(bad, k)
    ok2 = np.asarray(rsa.verify_pkcs1v15(bad_l, pk_l, mu, dwords,
                                         hash_len, key_bits, exp))
    assert not ok2[0] and ok2[1]


def test_em_encoding_matches_oracle():
    digest = hashlib.sha256(b"hello").digest()
    em_int = rsa.emsa_pkcs1_v15_encode(digest, 2048)
    words = np.stack([sha2.bytes_to_words32(digest)], axis=-1)
    limbs = rsa.expected_em_limbs(words, 256, 2048)
    got = bn.limbs_to_ints_batch(np.asarray(jax.device_get(limbs)))[0]
    assert got == em_int
