"""Microbenchmarks of candidate Fr-mul formulations on the current backend.

Honest chained timing (see bench.py methodology): each candidate runs a
lax.scan of SCAN_LEN self-dependent modmuls inside one jit, itself chained
across calls, so nothing can be elided. Reports ns per Fr-mul per batch
element — the framework's atomic cost unit (BASELINE.json metric 2).

Candidates:
  xla_conv      current ops/bignum.py path (one-hot conv matmul + Barrett)
  pallas_school Pallas kernel, schoolbook u32 limb products + Barrett,
                all in VMEM (ops/pallas_field.py)

Usage: python tools/microbench_field.py [batch] [scan_len]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

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
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from passport_zk_circuits_tpu.ops import field as fr           # noqa: E402


def chain_time(step_fn, x0, iters=3):
    stepj = jax.jit(step_fn)
    x = stepj(x0)
    jax.device_get(x.reshape(-1)[:1])   # reliable fence (see bench.py)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = stepj(x)
    jax.device_get(x.reshape(-1)[:1])
    return (time.perf_counter() - t0) / iters


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    scan_len = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(fr.batch_to_limbs(
        [int(rng.integers(1, 1 << 63)) for _ in range(batch)]))
    c = jnp.asarray(fr.to_limbs(0x1234567890ABCDEF11223344))

    results = {}

    def scan_mul(mul):
        def step(x):
            def body(carry, _):
                return mul(carry), None
            out, _ = jax.lax.scan(body, x, None, length=scan_len)
            return out
        return step

    # -- candidate 1: current XLA path --------------------------------------
    cb = jnp.broadcast_to(c[:, None], x0.shape)
    results["xla_conv"] = chain_time(scan_mul(lambda x: fr.mul(x, cb)), x0)

    # -- candidate 2: Pallas schoolbook kernel (per-mul pallas_call) --------
    from passport_zk_circuits_tpu.ops import pallas_field as pf
    results["pallas_school"] = chain_time(
        scan_mul(lambda x: pf.mul(x, cb)), x0)
    y_ref = fr.mul(x0, cb)
    y_pal = pf.mul(x0, cb)
    results["pallas_matches"] = bool(jnp.all(y_ref == y_pal))

    # -- candidate 3: whole chain fused in ONE Pallas kernel ----------------
    results["pallas_fused"] = chain_time(
        lambda x: pf.mul_chain(x, cb, scan_len), x0)
    y_ref = x0
    for _ in range(4):
        y_ref = fr.mul(y_ref, cb)
    results["pallas_fused_matches"] = bool(
        jnp.all(y_ref == pf.mul_chain(x0, cb, 4)))

    # -- raw VPU u32 multiply ceiling ---------------------------------------
    def raw_step(x):
        def body(carry, _):
            return (carry * jnp.uint32(12345) + jnp.uint32(1)), None
        out, _ = jax.lax.scan(body, x, None, length=scan_len * 16)
        return out
    results["raw_u32_mul_chain"] = chain_time(raw_step, x0)

    dev = jax.devices()[0]
    print(f"backend={dev.platform} device={dev.device_kind} "
          f"batch={batch} scan_len={scan_len}")
    for k, v in results.items():
        if isinstance(v, bool):
            print(f"{k:18s} {'OK' if v else 'MISMATCH'}")
        else:
            per_mul_ns = v / scan_len * 1e9
            print(f"{k:18s} {v*1e3:9.3f} ms/step  {per_mul_ns:9.1f} ns/mul "
                  f"({per_mul_ns/batch*1e3:7.3f} ps/mul/elem)")


if __name__ == "__main__":
    main()
