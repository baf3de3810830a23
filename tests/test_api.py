"""Top-level API: ingest -> compile -> generate_witness."""
import random
import pytest

import numpy as np

from passport_zk_circuits_tpu import api
from passport_zk_circuits_tpu.ingest import passport
from passport_zk_circuits_tpu.utils.rsa_keygen import gen_rsa_key


pytestmark = pytest.mark.slow  # big-graph compile tier (SURVEY §4 budget)

rng = random.Random(2718)


def test_ingest_compile_generate():
    dg1 = bytes(rng.randrange(256) for _ in range(93))
    aa_n, _, _ = gen_rsa_key(1024, rng)
    dg15 = passport.build_dg15_rsa(aa_n)
    sod, _ = passport.build_sod(dg1, dg15, 1, 256, rng)

    params, witness = api.ingest(dg1, dg15, sod)
    circuit = api.compile(params)
    out = api.generate_witness(circuit, [witness, witness])
    assert np.asarray(out["flow_ok"]).all()
    assert np.asarray(out["sig_ok"]).all()
    assert np.asarray(out["smt_ok"]).all()
    assert params.name.startswith("registerIdentity_1_256_3_")
