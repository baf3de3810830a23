"""SMT verifier and BabyJubJub vs Python oracles."""
import random

import jax
import numpy as np

from passport_zk_circuits_tpu.ops import field as fr
from passport_zk_circuits_tpu.ops import smt
from passport_zk_circuits_tpu.ops import babyjubjub as bjj
from passport_zk_circuits_tpu.utils import poseidon_ref as pref
from passport_zk_circuits_tpu.utils import babyjubjub_ref as bref

rng = random.Random(2024)


def build_smt_path(key: int, value: int, depth: int, other_leaves=()):
    """Host-side single-proof SMT construction matching the reference's fake
    trust anchors (process_passport.js:628-657: 1-leaf tree root =
    Poseidon3(k, v, 1) with all-zero siblings)."""
    leaf = pref.poseidon([key, value, 1])
    siblings = [other_leaves[i] if i < len(other_leaves) else 0
                for i in range(depth)]
    # siblings[0] is the ROOT-most level; the leaf sits one level past the
    # last non-zero sibling and every level below that (zero or not) hashes.
    last_nz = max((i for i, s in enumerate(siblings) if s), default=-1)
    node = leaf
    for i in range(last_nz, -1, -1):
        if (key >> i) & 1:
            node = pref.poseidon([siblings[i], node])
        else:
            node = pref.poseidon([node, siblings[i]])
    return node, siblings


def test_smt_single_leaf_tree():
    B, depth = 4, 80
    keys = [rng.randrange(fr.P) for _ in range(B)]
    vals = [rng.randrange(fr.P) for _ in range(B)]
    roots, sibs = [], []
    for k, v in zip(keys, vals):
        r, s = build_smt_path(k, v, depth)
        roots.append(r)
        sibs.append(s)
    root_l = fr.batch_to_limbs(roots)
    key_l = fr.batch_to_limbs(keys)
    val_l = fr.batch_to_limbs(vals)
    sib_l = np.stack([fr.batch_to_limbs(s) for s in zip(*sibs)], axis=1)
    ok, computed = jax.jit(smt.verify)(root_l, key_l, val_l, sib_l)
    assert np.asarray(ok).all()
    # wrong root must fail
    bad_root = fr.batch_to_limbs([r + 1 for r in roots])
    ok2, _ = jax.jit(smt.verify)(bad_root, key_l, val_l, sib_l)
    assert not np.asarray(ok2).any()


def test_smt_with_nonzero_siblings():
    B, depth = 2, 80
    keys = [rng.randrange(fr.P) for _ in range(B)]
    vals = [rng.randrange(fr.P) for _ in range(B)]
    roots, sibs = [], []
    for k, v in zip(keys, vals):
        others = [rng.randrange(fr.P), rng.randrange(fr.P), 0, rng.randrange(fr.P)]
        r, s = build_smt_path(k, v, depth, others)
        roots.append(r)
        sibs.append(s)
    root_l = fr.batch_to_limbs(roots)
    key_l = fr.batch_to_limbs(keys)
    val_l = fr.batch_to_limbs(vals)
    sib_l = np.stack([fr.batch_to_limbs(s) for s in zip(*sibs)], axis=1)
    ok, _ = jax.jit(smt.verify)(root_l, key_l, val_l, sib_l)
    assert np.asarray(ok).all()


def test_babyjubjub_base8_mul():
    B = 4
    sks = [rng.randrange(1 << 250) for _ in range(B)]
    sk_l = fr.batch_to_limbs(sks)
    px, py = jax.jit(bjj.base8_mul, static_argnums=1)(sk_l, (B,))
    gx = fr.batch_from_limbs(px)
    gy = fr.batch_from_limbs(py)
    for j, s in enumerate(sks):
        ex, ey = bref.base8_mul(s)
        assert (gx[j], gy[j]) == (ex, ey)


def test_babyjubjub_edges():
    # scalar 0 -> identity (0,1); scalar 1 -> Base8; on_curve holds
    sk_l = fr.batch_to_limbs([0, 1, 8])
    px, py = bjj.base8_mul(sk_l, (3,))
    gx, gy = fr.batch_from_limbs(px), fr.batch_from_limbs(py)
    assert (gx[0], gy[0]) == (0, 1)
    assert (gx[1], gy[1]) == bref.BASE8
    assert (gx[2], gy[2]) == bref.base8_mul(8)
    assert np.asarray(bjj.on_curve(px, py)).all()
