"""Poseidon2 T=3 permutation/sponge/merkle vs the Python oracle."""
import random

import jax
import numpy as np

from passport_zk_circuits_tpu.ops import field as fr
from passport_zk_circuits_tpu.ops import poseidon2 as p2
from passport_zk_circuits_tpu.utils import poseidon_ref as ref

rng = random.Random(23)


def test_permutation_vs_oracle():
    B = 4
    states = [[rng.randrange(fr.P) for _ in range(3)] for _ in range(B)]
    s = [fr.batch_to_limbs([st[j] for st in states]) for j in range(3)]
    out = jax.jit(lambda a, b, c: p2.permutation(a, b, c))(*s)
    for j in range(3):
        got = fr.batch_from_limbs(out[j])
        want = [ref.poseidon2_permutation(st)[j] for st in states]
        assert got == want, f"state elem {j}"


def test_compression_and_sponge():
    B = 3
    xs = [rng.randrange(fr.P) for _ in range(B)]
    ys = [rng.randrange(fr.P) for _ in range(B)]
    a, b = fr.batch_to_limbs(xs), fr.batch_to_limbs(ys)
    got = fr.batch_from_limbs(p2.compression(a, b))
    assert got == [ref.poseidon2_compression(x, y) for x, y in zip(xs, ys)]

    # sponge rate-1 over 3 elements (Poseidon2Hash semantics)
    cols = [[rng.randrange(fr.P) for _ in range(3)] for _ in range(B)]
    inp = [fr.batch_to_limbs([c[i] for c in cols]) for i in range(3)]
    got = fr.batch_from_limbs(p2.sponge_hash(inp, capacity=2))
    assert got == [ref.poseidon2_sponge(c, 2) for c in cols]
    # rate-2 variant
    got2 = fr.batch_from_limbs(p2.sponge_hash(inp, capacity=1))
    assert got2 == [ref.poseidon2_sponge(c, 1) for c in cols]


def test_merkle_root():
    B, L = 2, 3          # 8 leaves
    leaves = [[rng.randrange(fr.P) for _ in range(8)] for _ in range(B)]
    arr = np.stack([fr.batch_to_limbs([lv[i] for lv in leaves])
                    for i in range(8)], axis=1)       # (16, 8, B)
    got = fr.batch_from_limbs(jax.jit(p2.merkle_root)(arr))

    def host_root(vals):
        level = list(vals)
        while len(level) > 1:
            level = [ref.poseidon2_compression(level[2 * i], level[2 * i + 1])
                     for i in range(len(level) // 2)]
        return level[0]

    assert got == [host_root(lv) for lv in leaves]
