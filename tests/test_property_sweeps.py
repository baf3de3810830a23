"""Property-style randomized sweeps (PLAN_NEXT round-1 follow-up):
random operands for the static-constant multiply path and random
shift/block-count circuit parameterizations through the full pipeline.
"""
import random

import jax
import numpy as np
import pytest

from passport_zk_circuits_tpu.ops import bignum as bn
from passport_zk_circuits_tpu.ops import field as fr

rng = random.Random(20260818)



pytestmark = pytest.mark.slow  # sweep/e2e tier (SURVEY §4 budget)

@pytest.mark.parametrize("n,m", [(16, 17), (16, 16), (17, 16), (8, 5),
                                 (32, 33), (1, 1)])
def test_poly_mul_static_random(n, m):
    c = rng.getrandbits(16 * m - rng.randrange(0, 8)) | 1
    c_limbs = bn.int_to_limbs(c, m)
    xs = [rng.getrandbits(16 * n) for _ in range(9)] + [0, (1 << (16 * n)) - 1]
    a = bn.ints_to_limbs_batch(xs, n)
    out = bn.carry_normalize(bn.poly_mul_static(a, c_limbs), k_out=n + m)
    got = bn.limbs_to_ints_batch(out)
    assert got == [(x * c) % (1 << (16 * (n + m))) for x in xs]


def test_static_vs_dynamic_barrett_agree():
    # the same reduction through the static-matrix and generic paths
    xs = [rng.getrandbits(2 * 256 - 3) for _ in range(17)]
    t = bn.ints_to_limbs_batch(xs, 32)
    r_static = bn.barrett_reduce(t, fr.P_LIMBS, fr.MU_LIMBS)
    r_dyn = bn.barrett_reduce(t, jax.numpy.asarray(fr.P_LIMBS),
                              jax.numpy.asarray(fr.MU_LIMBS))
    assert bn.limbs_to_ints_batch(r_static) == bn.limbs_to_ints_batch(r_dyn) \
        == [x % fr.P for x in xs]


def test_random_shift_param_sweep():
    """Random (ec_shift, dg1_shift, ec_blocks) tuples through synthesis ->
    ingestion -> forward, checking flow verdict + oracle outputs."""
    from passport_zk_circuits_tpu.models.params import CircuitParams
    from passport_zk_circuits_tpu.models import register_identity as ri
    from passport_zk_circuits_tpu.ingest import synthetic
    from passport_zk_circuits_tpu.ingest.builder import build_register_inputs

    for trial in range(3):
        ec_blocks = rng.choice([3, 4, 5])
        ec_cap_bits = ec_blocks * 512 - 72 - 256   # room for the digest
        dg1_shift = 8 * rng.randrange(0, ec_cap_bits // 8)
        ec_shift = 8 * rng.randrange(0, (1024 - 136 - 256) // 8)
        p = CircuitParams(signature_type=1, dg_hash_type=256, document_type=3,
                          ec_block_number=ec_blocks, ec_shift=ec_shift,
                          dg1_shift=dg1_shift, aa_signature_algo=0,
                          dg15_shift=0, dg15_block_number=1, aa_shift=0)
        pp = synthetic.make_synthetic_passport(p, rng)
        inp = build_register_inputs(p, [pp])
        out = jax.jit(lambda i: ri.forward(p, i))(inp)
        assert np.asarray(out["flow_ok"]).all(), (trial, ec_shift, dg1_shift)
        assert np.asarray(out["sig_ok"]).all()
        want = synthetic.expected_outputs(p, pp)
        got = fr.batch_from_limbs(out["passport_hash"])[0]
        assert got == want["passport_hash"]
