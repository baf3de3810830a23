"""Poseidon bit-exactness vs the pure-Python oracle and circomlib vectors."""
import random

import jax
import pytest

from passport_zk_circuits_tpu.ops import field as fr
from passport_zk_circuits_tpu.ops import poseidon as pos
from passport_zk_circuits_tpu.utils import poseidon_ref as ref

rng = random.Random(42)


def test_known_circomlib_vectors():
    # canonical circomlib test vectors
    assert ref.poseidon([1, 2]) == (
        7853200120776062878684798364095072458815029376092732009249414926327459813530)
    assert ref.poseidon([1]) == (
        18586133768512220936620570745912940619677854269274689475585506675881198879027)


@pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 16])
def test_batched_vs_oracle(n):
    B = 4
    cols = [[rng.randrange(fr.P) for _ in range(n)] for _ in range(B)]
    inp = fr.batch_to_limbs([c[i] for c in cols for i in range(n)])
    inp = inp.reshape(fr.NLIMBS, B, n).transpose(0, 2, 1)   # (16, n, B)
    out = jax.jit(pos.poseidon)(inp)
    got = fr.batch_from_limbs(out)
    want = [ref.poseidon(c) for c in cols]
    assert got == want


def test_known_vector_on_device():
    inp = fr.batch_to_limbs([1, 2]).reshape(fr.NLIMBS, 2, 1)
    out = pos.poseidon(inp)
    assert fr.batch_from_limbs(out) == [ref.poseidon([1, 2])]


def test_poseidon_ex_multi_out():
    xs = [rng.randrange(fr.P) for _ in range(3)]
    inp = fr.batch_to_limbs(xs).reshape(fr.NLIMBS, 3, 1)
    out = pos.poseidon_ex(inp, n_outs=2)
    got = fr.batch_from_limbs(out.reshape(fr.NLIMBS, 2))
    assert got == ref.poseidon_ex(xs, 2)
