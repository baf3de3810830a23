"""In-kernel primitive cost measurements (Pallas, real TPU).

Times N-iteration fori_loops of candidate formulations inside single
kernels, chained across calls (bench.py methodology). Separates VPU u32
multiply cost, schoolbook variants, and MXU conv variants so the modmul
design is driven by measured numbers, not cycle models.

Usage: python tools/microbench_kernel.py [batch]
"""
import functools
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from passport_zk_circuits_tpu.ops import field as fr                # noqa
from passport_zk_circuits_tpu.ops import pallas_field as pf         # noqa
from passport_zk_circuits_tpu.ops import pallas_poseidon as ppk     # noqa

MASK = 0xFFFF


def school_rows(a, b):
    """Schoolbook with per-row accumulation (no pads, no matmul)."""
    n = a.shape[0]
    acc = [None] * (2 * n + 1)
    for i in range(n):
        p = a[i][None] * b                     # (n, B)
        lo = p & MASK
        hi = p >> 16
        for j in range(n):
            k = i + j
            acc[k] = lo[j] if acc[k] is None else acc[k] + lo[j]
            acc[k + 1] = hi[j] if acc[k + 1] is None else acc[k + 1] + hi[j]
    return jnp.stack(acc[:2 * n], axis=0)


def mk_loop_kernel(body, n_iter, n_extra):
    def kern(*refs):
        a_ref, c_ref = refs[0], refs[1]
        extra = [r[:] for r in refs[2:2 + n_extra]]
        o_ref = refs[-1]
        c = c_ref[:]
        o_ref[:] = jax.lax.fori_loop(
            0, n_iter, lambda i, x: body(x, c, *extra), a_ref[:])
    return kern


def run_loop(body, n_iter, a, c, *extra, iters=3):
    kern = mk_loop_kernel(body, n_iter, len(extra))
    f = jax.jit(lambda a, c, *e: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 + len(extra)),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=pf.interpret_mode(),
    )(a, c, *e))
    x = f(a, c, *extra)
    jax.device_get(x.reshape(-1)[:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        x = f(x, c, *extra)
    jax.device_get(x.reshape(-1)[:1])
    return (time.perf_counter() - t0) / iters / n_iter


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 1 << 16, (16, B)).astype(np.uint32))
    c = jnp.asarray(rng.integers(1, 1 << 16, (16, B)).astype(np.uint32))
    res = {}

    # raw VPU u32 multiply (+add) on (16, B)
    res["u32_mul_add"] = run_loop(
        lambda x, c: (x * c + 1) & 0xFFFF, 4096, a, c)
    # raw i32 multiply
    ai = a.astype(jnp.int32)
    ci = c.astype(jnp.int32)
    res["i32_mul_add"] = run_loop(
        lambda x, c: (x * c + 1) & 0xFFFF, 4096, ai, ci)
    # one full-width mask/shift/add sequence (memory-shape cost probe)
    res["mask_shift_add"] = run_loop(
        lambda x, c: ((x & 0xFFFF) + (c >> 1)) & 0xFFFF, 4096, a, c)

    def norm16(t):
        return pf._carry16(t, 16)

    # schoolbook product variants (result truncated to keep shapes fixed)
    res["school_pads"] = run_loop(
        lambda x, c: norm16(pf.school_mul(x, c)[:16]), 64, a, c)
    res["school_rows"] = run_loop(
        lambda x, c: norm16(school_rows(x, c)[:16]), 64, a, c)

    # full modmuls
    res["modmul_vpu_pads"] = run_loop(
        lambda x, c: pf.modmul(x, c), 64, a, c)

    cs = ppk._consts(3)
    conv = jnp.asarray(cs["conv"])
    mu_m = jnp.asarray(cs["mu_m"])
    mod_m = jnp.asarray(cs["mod_m"])

    def modmul_mxu(x, c, conv, mu_m, mod_m):
        consts = {"conv": conv, "mu_m": mu_m, "mod_m": mod_m}
        return ppk._modmul(x, c, consts)
    res["modmul_mxu"] = run_loop(modmul_mxu, 64, a, c, conv, mu_m, mod_m)

    def modmul_rows_mxu_barrett(x, c, mu_m, mod_m):
        consts = {"mu_m": mu_m, "mod_m": mod_m}
        return ppk._barrett2p(pf._carry16(school_rows(x, c), 32), consts)
    res["modmul_rows_mxu_barrett"] = run_loop(
        modmul_rows_mxu_barrett, 64, a, c, mu_m, mod_m)

    def barrett_only(x, c, mu_m, mod_m):
        consts = {"mu_m": mu_m, "mod_m": mod_m}
        t = jnp.concatenate([x, x], axis=0)
        return ppk._barrett2p(t, consts)
    res["barrett_mxu_only"] = run_loop(barrett_only, 64, a, c, mu_m, mod_m)

    def barrett_vpu_only(x, c):
        t = jnp.concatenate([x, x], axis=0)
        return pf.barrett_static(t)
    res["barrett_vpu_only"] = run_loop(barrett_vpu_only, 64, a, c)

    dev = jax.devices()[0]
    print(f"backend={dev.platform} device={dev.device_kind} B={B}")
    for k, v in res.items():
        print(f"{k:24s} {v*1e9:10.1f} ns/op  ({v/B*1e12:8.2f} ps/elem)")


if __name__ == "__main__":
    main()
