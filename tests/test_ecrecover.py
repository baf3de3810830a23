"""ecrecover vs a host sign-then-recover round trip."""
import hashlib
import pytest
import random

import jax
import numpy as np

from passport_zk_circuits_tpu.ops import bignum as bn
from passport_zk_circuits_tpu.ops import ecrecover
from passport_zk_circuits_tpu.ops.curves import CURVES
from passport_zk_circuits_tpu.utils import ecdsa_ref as ref

rng = random.Random(1717)



pytestmark = pytest.mark.slow  # sweep/e2e tier (SURVEY §4 budget)

def test_recover_matches_signer():
    cv = CURVES["secp256k1"]
    B = 2
    keys = [ref.keygen(cv, rng) for _ in range(B)]
    msgs = [bytes(rng.randrange(256) for _ in range(20)) for _ in range(B)]
    digs = [hashlib.sha256(m).digest() for m in msgs]

    rs, ss, vs = [], [], []
    for (d, Q), dg in zip(keys, digs):
        h = int.from_bytes(dg, "big")
        while True:
            k = rng.randrange(1, cv.n)
            R = ref.scalar_mul(cv, k, (cv.gx, cv.gy))
            r = R[0] % cv.n
            if r == 0 or R[0] >= cv.n:   # skip the rare r-overflow case
                continue
            s = pow(k, -1, cv.n) * (h + r * d) % cv.n
            if s:
                rs.append(r)
                ss.append(s)
                vs.append(R[1] & 1)
                break

    r_l = bn.ints_to_limbs_batch(rs, 16)
    s_l = bn.ints_to_limbs_batch(ss, 16)
    v = np.array(vs, dtype=bool)
    bits = np.stack([[(int.from_bytes(dg, "big") >> (255 - i)) & 1
                      for dg in digs] for i in range(256)]).astype(np.uint32)

    qx, qy, ok = jax.jit(ecrecover.recover)(r_l, s_l, v, bits)
    assert np.asarray(ok).all()
    for j, (_, Q) in enumerate(keys):
        assert bn.limbs_to_ints_batch(qx)[j] == Q[0]
        assert bn.limbs_to_ints_batch(qy)[j] == Q[1]
