"""C++ host batcher vs pure-Python ingestion: bit-identical outputs."""
import random

import numpy as np
import pytest

from passport_zk_circuits_tpu.ingest import native
from passport_zk_circuits_tpu.ops import sha2
from passport_zk_circuits_tpu.ops import bignum as bn

rng = random.Random(7)


def _py_pad_words(blobs, block_bits, n_blocks):
    cols = []
    for b in blobs:
        padded = sha2.pad_message(b, block_bits)
        assert len(padded) * 8 == n_blocks * block_bits
        cols.append(sha2.bytes_to_words32(padded))
    return np.stack(cols, axis=-1)


@pytest.mark.parametrize("block_bits,n_blocks", [(512, 2), (512, 4),
                                                 (1024, 1), (1024, 3)])
def test_pad_words32_matches_python(block_bits, n_blocks):
    cap = n_blocks * block_bits // 8 - (9 if block_bits == 512 else 17)
    lo = cap - block_bits // 8 + 1
    blobs = [bytes(rng.randrange(256) for _ in range(rng.randrange(max(lo, 0),
                                                                   cap + 1)))
             for _ in range(37)]
    got = native.pad_words32_batch(blobs, block_bits, n_blocks)
    want = _py_pad_words(blobs, block_bits, n_blocks)
    np.testing.assert_array_equal(got, want)


def test_pad_words32_rejects_overfull():
    with pytest.raises(ValueError):
        native.pad_words32_batch([b"\x01" * 60], 512, 1)  # needs 2 blocks


def test_pad_words32_rejects_underfull():
    # 3 bytes pads to exactly 1 block, not 2
    with pytest.raises(ValueError):
        native.pad_words32_batch([b"\x01\x02\x03"], 512, 2)


def test_bytes_to_limbs16_matches_python():
    vals = [rng.getrandbits(rng.randrange(1, 2048)) for _ in range(25)] + [0]
    blobs = [v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big")
             for v in vals]
    got = native.bytes_to_limbs16_batch(blobs, 128)
    want = bn.ints_to_limbs_batch(vals, 128)
    np.testing.assert_array_equal(got, want)


def test_native_available_report():
    # informative: the image ships g++, so the native path should be live
    assert native.available()
