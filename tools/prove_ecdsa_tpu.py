"""Groth16 end-to-end on the R1CS-lowered ECDSA RegisterIdentity circuit
(SIG_ALGO 20: p256 + SHA-256) — the round-5 capability proof: every
signature family the reference proves, this framework proves too
(ref signatureVerification.circom:177-261 dispatch + ecdsa.circom,
proved through circuits/scripts/{export-keys,prove,verify}.sh there).

Run on the TPU; per-stage timings printed. ~1.39M constraints,
domain 2^21.
"""

import os
import sys
import time
import random

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/root/repo/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main() -> int:
    from passport_zk_circuits_tpu.models.params import CircuitParams
    from passport_zk_circuits_tpu.ingest import synthetic
    from passport_zk_circuits_tpu.circuit import register_identity as cri
    from passport_zk_circuits_tpu.groth16 import protocol as g16

    print("backend:", jax.default_backend(), flush=True)
    p = CircuitParams(signature_type=20, dg_hash_type=256, document_type=3,
                      ec_block_number=4, ec_shift=600, dg1_shift=248,
                      aa_signature_algo=0, dg15_shift=0, dg15_block_number=1,
                      aa_shift=0)
    rng = random.Random(21)
    pp = synthetic.make_synthetic_passport(p, rng)

    t0 = time.time()
    b, outs = cri.build(p, [pp])
    want = synthetic.expected_outputs(p, pp)
    for key in ("passport_hash", "dg1_commitment", "pk_identity_hash"):
        assert outs[key].ints() == [want[key]], key
    pub = b.finalize([outs["passport_hash"], outs["dg1_commitment"],
                      outs["pk_identity_hash"], outs["pubkey_hash"]])
    print(f"build+finalize {time.time() - t0:.1f}s "
          f"n_vars={b.cs.n_vars} nc={b.cs.n_constraints}", flush=True)

    t0 = time.time()
    pk, vk = g16.setup(b.cs, n_public=4, seed=22)
    print(f"setup {time.time() - t0:.1f}s domain={pk.domain_size}",
          flush=True)

    t0 = time.time()
    w = b.witness_matrix()
    print(f"witness matrix {w.shape} {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    proofs = g16.prove(pk, b.cs, w, seed=23)
    print(f"prove {time.time() - t0:.1f}s (incl. executable loads over the device tunnel)", flush=True)

    t0 = time.time()
    proofs = g16.prove(pk, b.cs, w, seed=123)
    print(f"prove steady-state {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    pubs = [pub[j][0] for j in range(4)]
    assert g16.verify(vk, proofs[0], pubs), "verify failed"
    assert not g16.verify(vk, proofs[0],
                          [(pubs[0] + 1) % g16.fr.P] + pubs[1:])
    print(f"verify {time.time() - t0:.1f}s — "
          "ECDSA(p256) REGISTER-IDENTITY PROVED AND VERIFIED", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
