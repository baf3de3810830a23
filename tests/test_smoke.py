"""Fast-tier smoke tests for the critical paths the slow tier covers in
depth (ADVICE r4: a plain `pytest -q` run must not go green while proof
or kernel-parity regressions land).

One cheap probe per path: a real (tiny) Groth16 proof through the full
setup/prove/verify pipeline, and a fused-kernel parity check in Pallas
interpret mode. Kept small so the default tier stays in budget."""
import random

import numpy as np
import pytest

from passport_zk_circuits_tpu.ops import field as fr
from passport_zk_circuits_tpu.r1cs import system as r1
from passport_zk_circuits_tpu import groth16 as g16


def test_smoke_groth16_tiny_proof():
    """z = x*y with an 8-bit decomposition: full setup -> prove -> verify
    plus a wrong-public rejection. The 8-bit width makes every MSM pad to
    the same 16-wide bucket as the slow-tier demo circuit, so this reuses
    its compiled executables (persistent cache) and stays fast-tier."""
    rng = random.Random(31337)
    cs = r1.ConstraintSystem()
    z = cs.new_var("z")
    x = cs.new_var("x")
    y = cs.new_var("y")
    cs.constrain({x: 1}, {y: 1}, {z: 1})
    cs.bits(x, 8)
    pk, vk = g16.setup(cs, n_public=1, seed=2)
    xs, ys = [11], [7]
    zs = [77]
    rows = [1, zs, xs, ys] + [[(xs[0] >> i) & 1] for i in range(8)]
    w = r1.witness_matrix(rows, 1)
    ok, _ = r1.check_batched(cs, w)
    assert np.asarray(ok).all()
    proofs = g16.prove(pk, cs, w, seed=5)
    assert g16.verify(vk, proofs[0], [zs[0]])
    assert not g16.verify(vk, proofs[0], [(zs[0] + 1) % fr.P])


def test_smoke_pallas_parity_modmul():
    """Fused Pallas field mul (interpret mode on CPU) vs host ints — the
    cheap canary for the kernel-parity family."""
    import os
    os.environ["PZK_PALLAS"] = "1"
    try:
        from passport_zk_circuits_tpu.ops import pallas_field as pf
        rng = random.Random(7)
        xs = [rng.randrange(fr.P) for _ in range(4)]
        ys = [rng.randrange(fr.P) for _ in range(4)]
        a = fr.batch_to_limbs(xs)
        b = fr.batch_to_limbs(ys)
        out = np.asarray(pf.mul(a, b))
        assert fr.batch_from_limbs(out) == [
            x * y % fr.P for x, y in zip(xs, ys)]
    finally:
        del os.environ["PZK_PALLAS"]
