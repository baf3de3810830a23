"""On-chip verification gate for the fused Pallas kernels.

Runs every fused kernel on the REAL TPU and bit-checks it against the
pure-Python oracles (the same ones that gate the XLA path). On full
success writes the `.pallas_verified` marker at the repo root — the ONLY
thing that lets `ops.pallas_field.use_pallas()` default to the Pallas
path on TPU. On any failure the marker is removed.

Rationale: round 3 shipped kernels that passed CPU-interpret tests but
failed Mosaic compilation on the chip, and a Mosaic compile can hang —
so hardware defaults must be gated on a positive on-chip result, not on
an in-process probe. Run this under `timeout`:

    timeout 900 python tools/verify_pallas_tpu.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
MARKER = os.path.abspath(os.path.join(REPO, ".pallas_verified"))

os.environ["PZK_PALLAS"] = "1"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.abspath(os.path.join(REPO, ".jax_cache")))

import random

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
    if os.path.exists(MARKER):
        os.unlink(MARKER)
    if jax.default_backend() != "tpu":
        print("not a TPU backend; refusing to write the marker")
        return 1

    from passport_zk_circuits_tpu.ops import field as fr
    from passport_zk_circuits_tpu.ops import pallas_field as pf
    from passport_zk_circuits_tpu.ops import pallas_poseidon as ppk
    from passport_zk_circuits_tpu.ops import smt
    from passport_zk_circuits_tpu.utils import poseidon_ref as pref

    rng = random.Random(2024)
    B = 256

    def ints(x):
        return fr.batch_from_limbs(np.asarray(jax.block_until_ready(x)))

    t0 = time.time()
    # 1. fused modmul, incl. edge values
    xs = [0, 1, fr.P - 1] + [rng.randrange(fr.P) for _ in range(B - 3)]
    ys = [fr.P - 1, fr.P - 1, fr.P - 1] + \
        [rng.randrange(fr.P) for _ in range(B - 3)]
    got = ints(pf.mul(fr.batch_to_limbs(xs), fr.batch_to_limbs(ys)))
    assert got == [(a * b) % fr.P for a, b in zip(xs, ys)], "pf.mul"
    print(f"pf.mul: OK ({time.time() - t0:.1f}s)", flush=True)

    # 2. fused mul chain
    t0 = time.time()
    n_chain = 64
    got = ints(pf.mul_chain(fr.batch_to_limbs(xs), fr.batch_to_limbs(ys),
                            n_chain))
    want = []
    for a, b in zip(xs, ys):
        for _ in range(n_chain):
            a = a * b % fr.P
        want.append(a)
    assert got == want, "pf.mul_chain"
    print(f"pf.mul_chain: OK ({time.time() - t0:.1f}s)", flush=True)

    # 3. poseidon_ex t=2..6 vs host oracle
    for n_in in range(1, 6):
        t0 = time.time()
        cols = [[rng.randrange(fr.P) for _ in range(B)]
                for _ in range(n_in)]
        inp = [fr.batch_to_limbs(c) for c in cols]
        got = ints(ppk.poseidon(inp))
        want = [pref.poseidon([c[i] for c in cols]) for i in range(B)]
        assert got == want, f"poseidon t={n_in + 1}"
        print(f"ppk.poseidon t={n_in + 1}: OK ({time.time() - t0:.1f}s)",
              flush=True)

    # 4. whole SMT climb vs host oracle (1-leaf tree + deeper tree)
    t0 = time.time()
    keys = [rng.randrange(fr.P) for _ in range(B)]
    vals = [rng.randrange(fr.P) for _ in range(B)]
    roots = [pref.poseidon([k, v, 1]) for k, v in zip(keys, vals)]
    sibs = np.zeros((16, 80, B), np.uint32)
    ok, computed = jax.block_until_ready(jax.jit(smt.verify)(
        fr.batch_to_limbs(roots), fr.batch_to_limbs(keys),
        fr.batch_to_limbs(vals), sibs))
    assert np.asarray(ok).all(), "smt 1-leaf"
    # two-leaf tree: the sibling sits at index 0 (root-most, iden3 proof
    # ordering) and the first key bit picks the side
    k0, v0 = keys[0], vals[0]
    other = pref.poseidon([7, 7, 1])
    leaf = pref.poseidon([k0, v0, 1])
    root2 = (pref.poseidon([leaf, other]) if k0 & 1 == 0
             else pref.poseidon([other, leaf]))
    sibs2 = np.zeros((16, 80, B), np.uint32)
    sibs2[:, 0, :] = fr.to_limbs(other)[:, None]
    ok2, _ = jax.block_until_ready(jax.jit(smt.verify)(
        fr.batch_to_limbs([root2] * B), fr.batch_to_limbs([k0] * B),
        fr.batch_to_limbs([v0] * B), sibs2))
    assert np.asarray(ok2).all(), "smt 2-leaf"
    print(f"ppk.smt_climb (via smt.verify): OK ({time.time() - t0:.1f}s)",
          flush=True)

    # 5. fused BabyJubJub ladder vs host oracle (incl. scalar 0/1 edges)
    t0 = time.time()
    from passport_zk_circuits_tpu.ops import babyjubjub as bjj
    from passport_zk_circuits_tpu.utils import babyjubjub_ref as bref
    sks = [0, 1] + [rng.randrange(fr.P) for _ in range(B - 2)]
    px, py = bjj.base8_mul(fr.batch_to_limbs(sks), (B,))
    gx, gy = ints(px), ints(py)
    for i, s in enumerate(sks):
        wx, wy = bref.base8_mul(s % (1 << 254))
        assert (gx[i], gy[i]) == (wx, wy), f"bjj ladder lane {i}"
    print(f"pbjj.ladder (via base8_mul): OK ({time.time() - t0:.1f}s)",
          flush=True)

    # 6. fused RSA modexp ladder vs pow() (RSA-2048, e = 65537 + e = 3)
    t0 = time.time()
    from passport_zk_circuits_tpu.ops import pallas_rsa
    from passport_zk_circuits_tpu.ops import bignum as bn2
    k = 128
    mods = [rng.getrandbits(2047) | (1 << 2047) | 1 for _ in range(B)]
    sigs = [rng.randrange(m) for m in mods]
    nl = bn2.ints_to_limbs_batch(mods, k)
    mul_ = bn2.barrett_mu_batch(mods, k)
    sl = bn2.ints_to_limbs_batch(sigs, k)
    for exp in (65537, 3):
        got = bn2.limbs_to_ints_batch(np.asarray(jax.block_until_ready(
            pallas_rsa.pow_mod(sl, nl, mul_, exp))))
        assert got == [pow(s, exp, m) for s, m in zip(sigs, mods)], \
            f"rsa pow exp={exp}"
    print(f"prsa.pow_mod (2048-bit, e=65537/3): OK "
          f"({time.time() - t0:.1f}s)", flush=True)

    # 7. fused SHA-256/224 vs hashlib
    t0 = time.time()
    from passport_zk_circuits_tpu.ops import sha2
    import hashlib
    msgs = [bytes(rng.randrange(256) for _ in range(93)) for _ in range(B)]
    words = np.stack([sha2.bytes_to_words32(sha2.pad_message(m, 512))
                      for m in msgs], axis=-1)
    for algo, hname in ((256, "sha256"), (224, "sha224")):
        dw = np.asarray(jax.block_until_ready(
            sha2.sha_hash_chunks(words, algo)))
        for i, m in enumerate(msgs):
            got = b"".join(int(dw[w, i]).to_bytes(4, "big")
                           for w in range(dw.shape[0]))
            assert got == hashlib.new(hname, m).digest(), f"sha{algo}"
    print(f"psha.sha2_32_chunks (256/224): OK ({time.time() - t0:.1f}s)",
          flush=True)

    with open(MARKER, "w") as f:
        f.write(f"verified {time.time()} on {jax.devices()[0].device_kind} "
                f"by tools/verify_pallas_tpu.py\n")
    print(f"marker written: {MARKER}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
