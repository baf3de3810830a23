"""Per-stage wall-clock profile of the flagship RegisterIdentity step.

Times each pipeline stage as its own jitted program on the current backend
(real TPU under axon) so optimization effort goes to the top op class
(PLAN_NEXT.md "Profile-driven"). Stages mirror the reference call stack
(SURVEY.md §3.1): SHA hashing, RSA modexp signature check, Poseidon set,
SMT climb, BabyJubJub ladder.

Usage: python tools/profile_flagship.py [batch]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def bench_fn(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    from __graft_entry__ import _flagship_inputs
    from passport_zk_circuits_tpu.models import register_identity as ri
    from passport_zk_circuits_tpu.models import passport_verification as pv
    from passport_zk_circuits_tpu.ops import sha2, rsa, smt, poseidon as pos
    from passport_zk_circuits_tpu.ops import babyjubjub as bjj
    from passport_zk_circuits_tpu.ops import field as fr

    p, inputs = _flagship_inputs(batch=batch)
    inputs = jax.device_put(inputs)     # steady-state: no per-call H2D
    pp = inputs.passport
    times = {}

    times["full_step"] = bench_fn(jax.jit(lambda i: ri.forward(p, i)), inputs)

    sha_fn = jax.jit(lambda w: (
        sha2.sha_hash_chunks(w[0], p.dg_hash_type),
        sha2.sha_hash_chunks(w[1], p.dg_hash_type),
        sha2.sha_hash_chunks(w[2], p.dg_hash_type),
        sha2.sha_hash_chunks(w[3], p.sig.hash_len)))
    times["sha_all"] = bench_fn(
        sha_fn, (pp.dg1_words, pp.dg15_words, pp.ec_words, pp.sa_words))

    sa_digest = jax.jit(
        lambda w: sha2.sha_hash_chunks(w, p.sig.hash_len))(pp.sa_words)
    times["rsa_verify"] = bench_fn(
        jax.jit(lambda s, m, mu, d: rsa.verify_pkcs1v15(
            s, m, mu, d, p.sig.hash_len, p.sig.key_bits, p.sig.exp)),
        pp.signature, pp.pubkey, pp.pubkey_mu, sa_digest)

    times["smt_climb"] = bench_fn(
        jax.jit(lambda r, k, v, b: smt.verify(r, k, v, b)),
        pp.slave_root, pp.slave_root, pp.slave_root, pp.slave_branches)

    times["bjj_ladder"] = bench_fn(
        jax.jit(lambda sk: bjj.base8_mul(sk, sk.shape[1:])),
        inputs.sk_identity)

    times["poseidon5"] = bench_fn(
        jax.jit(lambda x: pos.poseidon([x] * 5)), inputs.sk_identity)

    dev = jax.devices()[0]
    print(f"backend={dev.platform} device={dev.device_kind} batch={batch}")
    total = times["full_step"]
    for k, v in sorted(times.items(), key=lambda kv: -kv[1]):
        print(f"{k:14s} {v * 1e3:9.3f} ms   {v / total * 100:5.1f}% of full")
    print(f"witnesses/s = {batch / total:,.0f}")


if __name__ == "__main__":
    main()
