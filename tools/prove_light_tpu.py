"""Groth16 end-to-end on the R1CS-lowered RegisterIdentityLight circuit.

Drives the full proving pipeline on a REAL circuit (not a demo system):
build + finalize (~56k constraints), seeded dev setup with the device
fixed-base G1 queries, batched prove (device MSMs + coset-NTT h), host
pairing verify — the snarkjs pipeline analog
(/root/reference/circuits/scripts/export-keys.sh, prove.sh, verify.sh).

Run on the TPU (default backend there); per-stage timings printed.
"""

import os
import sys
import time
import random

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.abspath(
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                 ".jax_cache")))

import numpy as np
import jax

# this jax build ignores the JAX_COMPILATION_CACHE_DIR env var; the
# explicit config update is required for the persistent compile cache
import jax as _jax_cfg
_jax_cfg.config.update("jax_compilation_cache_dir",
                       __import__("os").environ.get(
                           "JAX_COMPILATION_CACHE_DIR",
                           "/root/repo/.jax_cache"))
_jax_cfg.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main() -> int:
    from passport_zk_circuits_tpu.circuit import register_light
    from passport_zk_circuits_tpu.utils import poseidon_ref as pref
    from passport_zk_circuits_tpu.groth16 import protocol as g16

    print("backend:", jax.default_backend(), flush=True)
    rng = random.Random(42)
    B = 2
    dg1s = [bytes(rng.randrange(256) for _ in range(93)) for _ in range(B)]
    sks = [rng.randrange(1, pref.P) for _ in range(B)]

    t0 = time.time()
    b, outs = register_light.build(dg1s, sks)
    pub = b.finalize([outs["dg1_commitment"], outs["pk_identity_hash"],
                      outs["dg1_hash"]])
    print(f"build+finalize {time.time() - t0:.1f}s "
          f"n_vars={b.cs.n_vars} nc={b.cs.n_constraints}", flush=True)

    t0 = time.time()
    pk, vk = g16.setup(b.cs, n_public=3, seed=5)
    print(f"setup {time.time() - t0:.1f}s domain={pk.domain_size}",
          flush=True)

    t0 = time.time()
    w = b.witness_matrix()
    print(f"witness matrix {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    proofs = g16.prove(pk, b.cs, w, seed=6)
    print(f"prove (batch {B}) {time.time() - t0:.1f}s "
          "(incl. executable loads over the device tunnel)", flush=True)

    # steady-state: executables resident (the number a prover service
    # sees; first-call cost is dominated by shipping the ~100MB compiled
    # MSM programs over the axon tunnel, see docs/ROUND5_EVIDENCE.md)
    t0 = time.time()
    proofs = g16.prove(pk, b.cs, w, seed=7)
    print(f"prove steady-state (batch {B}) {time.time() - t0:.1f}s",
          flush=True)

    t0 = time.time()
    for lane in range(B):
        pubs = [pub[j][lane] for j in range(3)]
        assert g16.verify(vk, proofs[lane], pubs), f"lane {lane}"
        assert not g16.verify(vk, proofs[lane],
                              [(pubs[0] + 1) % pref.P, pubs[1], pubs[2]])
    print(f"verify {time.time() - t0:.1f}s — "
          "REGISTER-IDENTITY-LIGHT PROVED AND VERIFIED", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
