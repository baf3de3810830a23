"""RSA-PSS verification vs host encode/sign oracles."""
import hashlib
import random

import jax
import numpy as np
import pytest

from passport_zk_circuits_tpu.ops import bignum as bn
from passport_zk_circuits_tpu.ops import rsapss
from passport_zk_circuits_tpu.ops import sha2
from passport_zk_circuits_tpu.utils.rsa_keygen import gen_rsa_key


pytestmark = pytest.mark.slow  # big-graph compile tier (SURVEY §4 budget)

rng = random.Random(404)
_KEYS = {}


def _key(bits, exp=65537):
    if (bits, exp) not in _KEYS:
        _KEYS[(bits, exp)] = gen_rsa_key(bits, rng, exp)
    return _KEYS[(bits, exp)]


@pytest.mark.parametrize("key_bits,hash_len,salt_len,exp", [
    (2048, 256, 32, 65537),   # SIG_ALGO 11
    (2048, 256, 64, 65537),   # SIG_ALGO 12
    (2048, 256, 32, 3),       # SIG_ALGO 10
    (2048, 384, 48, 65537),   # SIG_ALGO 13
])
def test_verify_pss(key_bits, hash_len, salt_len, exp):
    B = 2
    n, e, d = _key(key_bits, exp)
    k = key_bits // 16
    name = {256: "sha256", 384: "sha384"}[hash_len]
    msgs = [bytes(rng.randrange(256) for _ in range(40)) for _ in range(B)]
    digests = [hashlib.new(name, m).digest() for m in msgs]
    sigs = [rsapss.sign_pss(dg, d, n, key_bits, salt_len, rng)
            for dg in digests]

    sig_l = bn.ints_to_limbs_batch(sigs, k)
    pk_l = bn.ints_to_limbs_batch([n] * B, k)
    mu = bn.barrett_mu_batch([n] * B, k)
    padded = [sha2.pad_message(m, sha2.ALGO_BITS[hash_len]) for m in msgs]
    if hash_len in (384, 512):
        words = np.stack([sha2.bytes_to_words64(p) for p in padded], axis=-1)
    else:
        words = np.stack([sha2.bytes_to_words32(p) for p in padded], axis=-1)
    dwords = sha2.sha_hash_chunks(words, hash_len)

    ok = jax.jit(lambda s, p, m, dw: rsapss.verify_pss(
        s, p, m, dw, hash_len, key_bits, salt_len, exp))(
        sig_l, pk_l, mu, dwords)
    assert np.asarray(ok).all()

    bad = list(sigs)
    bad[0] ^= 2
    ok2 = np.asarray(rsapss.verify_pss(
        bn.ints_to_limbs_batch(bad, k), pk_l, mu, dwords,
        hash_len, key_bits, salt_len, exp))
    assert not ok2[0] and ok2[1]
