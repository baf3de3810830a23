"""Per-stage wall-clock profile of the flagship RegisterIdentity step.

Times each pipeline stage as its own jitted program on the current backend
(real TPU under axon) so optimization effort goes to the top op class
(PLAN_NEXT.md "Profile-driven"). Stages mirror the reference call stack
(SURVEY.md §3.1): SHA hashing, RSA modexp signature check, Poseidon set,
SMT climb, BabyJubJub ladder.

Methodology: every timed loop is CHAINED — each iteration's inputs are
derived from the previous iteration's outputs — because the execution
environment elides repeated executions with identical inputs (see
bench.py / BASELINE.md round-3 correction). `chain_time` enforces that
shape: step_fn must map its carry to the next carry through the computation
under test.

Usage: python tools/profile_flagship.py [batch]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

import jax

# this jax build ignores the JAX_COMPILATION_CACHE_DIR env var; the
# explicit config update is required for the persistent compile cache
import jax as _jax_cfg
_jax_cfg.config.update("jax_compilation_cache_dir",
                       __import__("os").environ.get(
                           "JAX_COMPILATION_CACHE_DIR",
                           "/root/repo/.jax_cache"))
_jax_cfg.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _force(tree):
    """Fetch one concrete element of every leaf. block_until_ready is not a
    reliable fence in this environment (see bench.py); device_get is."""
    for leaf in jax.tree_util.tree_leaves(tree):
        jax.device_get(leaf.reshape(-1)[:1])


def chain_time(step_fn, x0, iters=5):
    """Time a self-chained step: x_{i+1} = step_fn(x_i). Returns sec/step."""
    stepj = jax.jit(step_fn)
    x = stepj(x0)
    _force(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = stepj(x)
    _force(x)
    return (time.perf_counter() - t0) / iters


def _mask16(t):
    return t & jnp.uint32(0xFFFF)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    from __graft_entry__ import _flagship_inputs
    from passport_zk_circuits_tpu.models import register_identity as ri
    from passport_zk_circuits_tpu.ops import sha2, rsa, smt, poseidon as pos
    from passport_zk_circuits_tpu.ops import babyjubjub as bjj

    p, inputs = _flagship_inputs(batch=batch)
    inputs = jax.device_put(inputs)     # steady-state: no per-call H2D
    pp = inputs.passport
    times = {}

    def full_step(inp):
        out = ri.forward(p, inp)
        # Fold EVERY output (incl. the flow/sig/smt verdicts) into the
        # carry: a carry that only tastes two hashes lets XLA dead-code
        # eliminate the RSA/SMT/flow subgraphs entirely, and the "full"
        # step then times a fraction of the program (the round-4
        # profiler bug: full_step 88 ms vs the honest bench's 313 ms).
        ok = (out["flow_ok"] & out["sig_ok"] & out["smt_ok"]).astype(
            jnp.uint32)
        mix = (out["passport_hash"] ^ out["pk_identity_hash"]
               ^ out["pubkey_hash"] ^ out["dg15_pubkey_hash"]
               ^ out["dg1_commitment"] ^ ok[None])
        sk = (inp.sk_identity ^ mix).at[-1].set(
            (inp.sk_identity[-1] ^ mix[-1]) & jnp.uint32(0x3FF))
        return inp._replace(sk_identity=sk)

    times["full_step"] = chain_time(full_step, inputs)

    def sha_step(words):
        d1 = sha2.sha_hash_chunks(words[0], p.dg_hash_type)
        d2 = sha2.sha_hash_chunks(words[1], p.dg_hash_type)
        d3 = sha2.sha_hash_chunks(words[2], p.dg_hash_type)
        d4 = sha2.sha_hash_chunks(words[3], p.sig.hash_len)
        mix = d1[0] ^ d2[0] ^ d3[0] ^ d4[0]          # (B,)
        return tuple(w ^ mix[None] for w in words)

    times["sha_all"] = chain_time(
        sha_step, (pp.dg1_words, pp.dg15_words, pp.ec_words, pp.sa_words))

    sa_digest = jax.jit(
        lambda w: sha2.sha_hash_chunks(w, p.sig.hash_len))(pp.sa_words)

    def rsa_step(sig):
        ok = rsa.verify_pkcs1v15(sig, pp.pubkey, pp.pubkey_mu, sa_digest,
                                 p.sig.hash_len, p.sig.key_bits, p.sig.exp)
        return sig.at[0].set(_mask16(sig[0] ^ ok.astype(jnp.uint32)))

    times["rsa_verify"] = chain_time(rsa_step, pp.signature)

    def smt_step(root):
        ok, computed = smt.verify(root, root, root, pp.slave_branches)
        return _mask16(root ^ computed)

    times["smt_climb"] = chain_time(smt_step, pp.slave_root)

    def bjj_step(sk):
        px, py = bjj.base8_mul(sk, sk.shape[1:])
        return _mask16(sk ^ px ^ py)

    times["bjj_ladder"] = chain_time(bjj_step, inputs.sk_identity)

    def pos5_step(x):
        return _mask16(x ^ pos.poseidon([x] * 5))

    times["poseidon5"] = chain_time(pos5_step, inputs.sk_identity)

    dev = jax.devices()[0]
    print(f"backend={dev.platform} device={dev.device_kind} batch={batch}")
    total = times["full_step"]
    for k, v in sorted(times.items(), key=lambda kv: -kv[1]):
        print(f"{k:14s} {v * 1e3:9.3f} ms   {v / total * 100:5.1f}% of full")
    print(f"witnesses/s = {batch / total:,.0f}")


if __name__ == "__main__":
    main()
