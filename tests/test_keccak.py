"""Keccak-256 / SHA3-256 vs hashlib and canonical vectors."""
import hashlib
import pytest
import random

import jax
import numpy as np

from passport_zk_circuits_tpu.ops import keccak


pytestmark = pytest.mark.slow  # big-graph compile tier (SURVEY §4 budget)

rng = random.Random(3)


def _run(msgs, sha3=False):
    n = len(msgs[0])
    B = len(msgs)
    rows = [np.array([m[j] for m in msgs], dtype=np.uint32)
            for j in range(n)]
    out = jax.jit(lambda *r: keccak.keccak256_bytes(
        list(r), sha3, bshape=(B,)))(*rows)
    out = [np.asarray(jax.device_get(o)) for o in out]
    return [bytes(int(o[j]) for o in out) for j in range(B)]


def test_keccak256_known_vectors():
    # canonical legacy-Keccak vectors
    got = _run([b"", b""])[0]
    assert got.hex() == ("c5d2460186f7233c927e7db2dcc703c0"
                         "e500b653ca82273b7bfad8045d85a470")
    got = _run([b"abc", b"abc"])[0]
    assert got.hex() == ("4e03657aea45a94fc7d47ba826c8d667"
                         "c0d1e6e33a64a036ec44f58fa12d6c45")


def test_sha3_vs_hashlib():
    for n in [0, 1, 135, 136, 137, 200]:
        msgs = [bytes(rng.randrange(256) for _ in range(n)) for _ in range(2)]
        got = _run(msgs, sha3=True)
        for g, m in zip(got, msgs):
            assert g == hashlib.sha3_256(m).digest(), f"len {n}"


def test_eth_address():
    # address of an all-0x01 "pubkey" = keccak256(bytes(64 x 0x01))[12:]
    pk = [b"\x01" * 64]
    rows = [np.array([1], dtype=np.uint32) for _ in range(64)]
    out = keccak.eth_address_from_pubkey(rows)
    got = bytes(int(np.asarray(o)[0]) for o in out)
    full = _run([b"\x01" * 64])[0]
    assert got == full[12:]
    assert len(got) == 20
