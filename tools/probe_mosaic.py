"""Empirical probe of what Mosaic (the Pallas TPU compiler) accepts.

Round 3's fused kernels passed CPU-interpret tests but failed Mosaic
compilation on the real chip (`unsupported shape cast` on a rank-3
reshape).  This tool runs a battery of tiny kernels — one per questionable
primitive — directly on the chip, printing PASS/FAIL incrementally so a
compile hang identifies the culprit.  Run before/while (re)designing any
kernel layout.

Usage:  python tools/probe_mosaic.py [probe ...]   (default: all)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

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


def run_kernel(body, out_shape, *args):
    return pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct(*out_shape),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(*args)


B = 128
A32 = np.arange(16 * B, dtype=np.uint32).reshape(16, B) % 0xFFFF
C32 = (A32 * 3 + 1) % 0xFFFF


def p_basic():
    def k(a_ref, o_ref):
        a = a_ref[:]
        o_ref[:] = (a * a + (a >> 3)) & 0xFFFF
    got = run_kernel(k, ((16, B), jnp.uint32), A32)
    want = (A32 * A32 + (A32 >> 3)) & 0xFFFF
    assert (np.asarray(got) == want).all()


def p_rank3_elemwise():
    def k(a_ref, b_ref, o_ref):
        p = a_ref[:][:, None] * b_ref[:][None]        # (16, 16, B)
        o_ref[:] = p[0] + p[:, 0]
    got = run_kernel(k, ((16, B), jnp.uint32), A32, C32)
    want = A32[0][None] * C32 + A32 * C32[0][None]
    assert (np.asarray(got) == want).all()


def p_reshape_merge_major():
    def k(a_ref, b_ref, o_ref):
        p = a_ref[:][:, None] * b_ref[:][None]        # (16, 16, B)
        o_ref[:] = p.reshape(256, B)
    got = run_kernel(k, ((256, B), jnp.uint32), A32, C32)
    want = (A32[:, None] * C32[None]).reshape(256, B)
    assert (np.asarray(got) == want).all()


def p_reshape_split_major():
    x = np.arange(256 * B, dtype=np.uint32).reshape(256, B)

    def k(a_ref, o_ref):
        u = a_ref[:].reshape(16, 16, B)
        o_ref[:] = u[:, 0] + u[:, 1]
    got = run_kernel(k, ((16, B), jnp.uint32), x)
    u = x.reshape(16, 16, B)
    assert (np.asarray(got) == u[:, 0] + u[:, 1]).all()


def p_strided_slice_major():
    x = np.arange(32 * B, dtype=np.uint32).reshape(32, B)

    def k(a_ref, o_ref):
        o_ref[:] = a_ref[:][0::2] + a_ref[:][1::2]
    got = run_kernel(k, ((16, B), jnp.uint32), x)
    assert (np.asarray(got) == x[0::2] + x[1::2]).all()


def p_interleave_stack():
    def k(a_ref, o_ref):
        a = a_ref[:]
        o_ref[:] = jnp.stack([a & 0xFF, a >> 8], axis=1).reshape(32, B)
    got = run_kernel(k, ((32, B), jnp.uint32), A32)
    want = np.stack([A32 & 0xFF, A32 >> 8], axis=1).reshape(32, B)
    assert (np.asarray(got) == want).all()


def p_moveaxis():
    x = np.arange(16 * 3 * B, dtype=np.uint32).reshape(16, 3, B)

    def k(a_ref, o_ref):
        m = jnp.moveaxis(a_ref[:].reshape(16, 3, B), 1, 0)   # (3, 16, B)
        o_ref[:] = m.reshape(48, B)
    got = run_kernel(k, ((48, B), jnp.uint32), x.reshape(48, B))
    want = np.moveaxis(x, 1, 0).reshape(48, B)
    assert (np.asarray(got) == want).all()


def p_dot_2d():
    m = np.random.RandomState(0).randint(0, 3, (32, 512)).astype(np.float32)
    x = np.random.RandomState(1).randint(0, 255, (512, B)).astype(np.float32)

    def k(m_ref, x_ref, o_ref):
        o_ref[:] = jax.lax.dot(m_ref[:], x_ref[:],
                               precision=jax.lax.Precision.HIGHEST)
    got = run_kernel(k, ((32, B), jnp.float32), m, x)
    assert (np.asarray(got) == m @ x).all()


def p_concat_major():
    def k(a_ref, b_ref, o_ref):
        o_ref[:] = jnp.concatenate([a_ref[:], b_ref[:]], axis=0)
    got = run_kernel(k, ((32, B), jnp.uint32), A32, C32)
    assert (np.asarray(got) == np.concatenate([A32, C32], 0)).all()


def p_concat_minor():
    a = A32[:, :64]
    b = C32[:, :64]

    def k(a_ref, b_ref, o_ref):
        o_ref[:] = jnp.concatenate([a_ref[:], b_ref[:]], axis=-1)
    got = run_kernel(k, ((16, B), jnp.uint32), a, b)
    assert (np.asarray(got) == np.concatenate([a, b], -1)).all()


def p_pad_major():
    def k(a_ref, o_ref):
        o_ref[:] = jnp.pad(a_ref[:], [(3, 13), (0, 0)])
    got = run_kernel(k, ((32, B), jnp.uint32), A32)
    assert (np.asarray(got) == np.pad(A32, [(3, 13), (0, 0)])).all()


def p_fori_tuple():
    def k(a_ref, b_ref, o_ref):
        def body(i, st):
            x, y = st
            return ((x + y) & 0xFFFF, y)
        x, _ = jax.lax.fori_loop(0, 7, body, (a_ref[:], b_ref[:]))
        o_ref[:] = x
    got = run_kernel(k, ((16, B), jnp.uint32), A32, C32)
    assert (np.asarray(got) == (A32 + 7 * C32) & 0xFFFF).all()


def p_iota2d():
    def k(a_ref, o_ref):
        sh = jax.lax.broadcasted_iota(jnp.uint32, (16, B), 0)
        o_ref[:] = a_ref[:] << (sh % 8)
    got = run_kernel(k, ((16, B), jnp.uint32), A32)
    sh = np.arange(16, dtype=np.uint32)[:, None] % 8
    assert (np.asarray(got) == A32 << sh).all()


def p_sum_axis0():
    def k(a_ref, o_ref):
        s = jnp.sum(a_ref[:].astype(jnp.int32), axis=0,
                    keepdims=True).astype(jnp.uint32)
        o_ref[:] = jnp.broadcast_to(s, (16, B))
    got = run_kernel(k, ((16, B), jnp.uint32), A32)
    assert (np.asarray(got)[0] == A32.sum(0)).all()


def p_pl_ds():
    x = np.arange(160 * B, dtype=np.uint32).reshape(160, B)

    def k(a_ref, o_ref):
        def body(i, acc):
            return acc + a_ref[pl.ds(i * 16, 16), :]
        o_ref[:] = jax.lax.fori_loop(0, 10, body,
                                     jnp.zeros((16, B), jnp.uint32))
    got = run_kernel(k, ((16, B), jnp.uint32), x)
    assert (np.asarray(got) == x.reshape(10, 16, B).sum(0)).all()


def p_u32_to_f32():
    def k(a_ref, o_ref):
        o_ref[:] = a_ref[:].astype(jnp.int32).astype(jnp.float32)
    got = run_kernel(k, ((16, B), jnp.float32), A32)
    assert (np.asarray(got) == A32.astype(np.float32)).all()


def p_field_mul():
    from passport_zk_circuits_tpu.ops import pallas_field as pf
    from passport_zk_circuits_tpu.ops import field as fr
    rs = np.random.RandomState(7)
    xs = [int(rs.randint(0, 1 << 62)) * int(rs.randint(0, 1 << 62))
          for _ in range(B)]
    ys = [int(rs.randint(0, 1 << 62)) * int(rs.randint(0, 1 << 62))
          for _ in range(B)]
    a = fr.batch_to_limbs(xs)
    b = fr.batch_to_limbs(ys)
    got = fr.batch_from_limbs(np.asarray(jax.block_until_ready(pf.mul(a, b))))
    want = [(x * y) % fr.P for x, y in zip(xs, ys)]
    assert list(got) == want


def p_poseidon_t3():
    from passport_zk_circuits_tpu.ops import pallas_poseidon as ppk
    from passport_zk_circuits_tpu.ops import field as fr
    from passport_zk_circuits_tpu.utils import poseidon_ref as pref
    xs = list(range(1, B + 1))
    a = fr.batch_to_limbs(xs)
    got = fr.batch_from_limbs(np.asarray(jax.block_until_ready(
        ppk.poseidon([a, a]))))
    want = [pref.poseidon([x, x]) for x in xs]
    assert list(got) == want


def p_smt_climb():
    from passport_zk_circuits_tpu.ops import pallas_poseidon as ppk
    from passport_zk_circuits_tpu.ops import smt, field as fr
    import os
    os.environ["PZK_PALLAS"] = "1"
    from passport_zk_circuits_tpu.utils import poseidon_ref as pref
    key, value = 5, 7
    root = pref.poseidon([key, value, 1])
    bb = 8
    kl = fr.batch_to_limbs([key] * bb)
    vl = fr.batch_to_limbs([value] * bb)
    rl = fr.batch_to_limbs([root] * bb)
    sibs = np.zeros((16, 80, bb), np.uint32)
    ok, computed = jax.block_until_ready(
        jax.jit(smt.verify)(rl, kl, vl, sibs))
    assert np.asarray(ok).all()


PROBES = [
    ("basic", p_basic),
    ("iota2d", p_iota2d),
    ("concat_major", p_concat_major),
    ("pad_major", p_pad_major),
    ("fori_tuple", p_fori_tuple),
    ("dot_2d", p_dot_2d),
    ("u32_to_f32", p_u32_to_f32),
    ("sum_axis0", p_sum_axis0),
    ("pl_ds", p_pl_ds),
    ("strided_slice_major", p_strided_slice_major),
    ("interleave_stack", p_interleave_stack),
    ("reshape_split_major", p_reshape_split_major),
    ("reshape_merge_major", p_reshape_merge_major),
    ("rank3_elemwise", p_rank3_elemwise),
    ("moveaxis", p_moveaxis),
    ("concat_minor", p_concat_minor),
    ("field_mul", p_field_mul),
    ("poseidon_t3", p_poseidon_t3),
    ("smt_climb", p_smt_climb),
]


def main():
    names = sys.argv[1:]
    todo = [(n, f) for n, f in PROBES if not names or n in names]
    print(f"backend: {jax.default_backend()}", flush=True)
    for name, fn in todo:
        t0 = time.time()
        print(f"PROBE {name} ...", flush=True)
        try:
            fn()
            print(f"PASS  {name}  ({time.time() - t0:.1f}s)", flush=True)
        except Exception as e:
            msg = str(e).replace("\n", " | ")[:300]
            print(f"FAIL  {name}  ({time.time() - t0:.1f}s): {msg}",
                  flush=True)


if __name__ == "__main__":
    main()
