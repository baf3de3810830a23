"""Groth16 end-to-end on the FLAGSHIP RegisterIdentity R1CS lowering.

The full reference pipeline story at production scale: lower
registerIdentity_1_256_3_4_600_248_1_1496_3_256 (~515k constraints /
~512k wires), run the seeded dev setup with device fixed-base G1 queries
(~2.6M scalar mults on the chip), prove one real synthetic-passport
witness (device MSMs + chunked coset-NTT h at domain 2^20), verify with
the host pairing — the analog of export-keys.sh + prove.sh + verify.sh
on the same circuit the reference pins in hardhat.config.ts:30.

Expect ~1h wall on a single v5e chip; prints per-stage progress.
"""

import os
import sys
import time
import random

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", os.path.abspath(
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                 ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main() -> int:
    from passport_zk_circuits_tpu.models.params import CircuitParams
    from passport_zk_circuits_tpu.ingest import synthetic
    from passport_zk_circuits_tpu.circuit import register_identity as cri
    from passport_zk_circuits_tpu.groth16 import protocol as g16

    print("backend:", jax.default_backend(), flush=True)
    p = CircuitParams.from_name(
        "registerIdentity_1_256_3_4_600_248_1_1496_3_256")
    rng = random.Random(7)
    pp = synthetic.make_synthetic_passport(p, rng)

    t0 = time.time()
    b, outs = cri.build(p, [pp])
    want = synthetic.expected_outputs(p, pp)
    for key in ("passport_hash", "dg1_commitment", "pk_identity_hash",
                "dg15_pubkey_hash"):
        assert outs[key].ints() == [want[key]], key
    pub = b.finalize([outs["dg15_pubkey_hash"], outs["passport_hash"],
                      outs["dg1_commitment"], outs["pk_identity_hash"]])
    print(f"build+finalize {time.time() - t0:.1f}s "
          f"n_vars={b.cs.n_vars} nc={b.cs.n_constraints}", flush=True)

    t0 = time.time()
    pk, vk = g16.setup(b.cs, n_public=4, seed=11)
    print(f"setup {time.time() - t0:.1f}s domain={pk.domain_size}",
          flush=True)

    t0 = time.time()
    w = b.witness_matrix()
    print(f"witness matrix {w.shape} {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    proofs = g16.prove(pk, b.cs, w, seed=12)
    print(f"prove {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    pubs = [pub[j][0] for j in range(4)]
    assert g16.verify(vk, proofs[0], pubs), "verify failed"
    assert not g16.verify(vk, proofs[0],
                          [(pubs[0] + 1) % g16.fr.P] + pubs[1:])
    print(f"verify {time.time() - t0:.1f}s — "
          "FLAGSHIP REGISTER-IDENTITY PROVED AND VERIFIED", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
