"""ctypes loader for the C++ host-side ingestion batcher (csrc/host_batcher.cc).

Compiles the shared library on first use with g++ (cached next to the source,
keyed by source mtime) and exposes numpy-facing wrappers. Every wrapper has a
pure-Python fallback in ops.sha2 / ops.bignum, so the package works without a
toolchain; `available()` reports which path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "csrc", "host_batcher.cc")
_SO = os.path.join(os.path.dirname(_SRC), "host_batcher.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     "-o", _SO, _SRC],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(_SO)
            lib.pzk_pad_words32.restype = ctypes.c_int64
            lib.pzk_pad_words32.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p]
            lib.pzk_bytes_to_limbs16.restype = ctypes.c_int64
            lib.pzk_bytes_to_limbs16.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p]
            _lib = lib
        except (OSError, subprocess.CalledProcessError):
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def _pack_rows(blobs) -> tuple[np.ndarray, np.ndarray, int]:
    lens = np.array([len(b) for b in blobs], dtype=np.int64)
    stride = max(1, int(lens.max()) if len(blobs) else 1)
    buf = b"".join(b.ljust(stride, b"\x00") for b in blobs)
    rows = np.frombuffer(buf, dtype=np.uint8).reshape(len(blobs), stride)
    return rows, lens, stride


def pad_words32_batch(blobs, block_bits: int, n_blocks: int) -> np.ndarray:
    """Pad B blobs MD-style and pack big-endian 32-bit words.

    Returns (n_blocks*block_bits/32, B) uint32, batch minor-most — the exact
    tensor builder.build_register_inputs feeds the SHA kernels. Native path
    when the toolchain is present; bit-identical Python fallback otherwise.
    """
    lib = _load()
    B = len(blobs)
    n_words = n_blocks * block_bits // 32
    if lib is not None and B > 0:
        rows, lens, stride = _pack_rows(blobs)
        out = np.empty((n_words, B), dtype=np.uint32)
        rc = lib.pzk_pad_words32(
            rows.ctypes.data, lens.ctypes.data, B, stride, block_bits,
            n_blocks, out.ctypes.data)
        if rc != 0:
            i = int(rc) - 1
            raise ValueError(
                f"blob {i} of {len(blobs[i])}B does not pad to exactly "
                f"{n_blocks} x {block_bits}-bit blocks")
        return out
    from ..ops import sha2
    cols = []
    for b in blobs:
        padded = sha2.pad_message(b, block_bits)
        if len(padded) * 8 != n_blocks * block_bits:
            raise ValueError(
                f"blob of {len(b)}B does not pad to exactly "
                f"{n_blocks} x {block_bits}-bit blocks")
        cols.append(sha2.bytes_to_words32(padded))
    return (np.stack(cols, axis=-1) if cols
            else np.empty((n_words, 0), dtype=np.uint32))


def bytes_to_limbs16_batch(blobs, k: int) -> np.ndarray:
    """B big-endian byte strings -> (k, B) uint32 base-2^16 limb tensor."""
    lib = _load()
    B = len(blobs)
    if lib is not None and B > 0:
        rows, lens, stride = _pack_rows(blobs)
        out = np.empty((k, B), dtype=np.uint32)
        rc = lib.pzk_bytes_to_limbs16(
            rows.ctypes.data, lens.ctypes.data, B, stride, k,
            out.ctypes.data)
        if rc != 0:
            raise ValueError(f"blob {int(rc) - 1} longer than {k} limbs")
        return out
    from ..ops import bignum as bn
    return bn.ints_to_limbs_batch(
        [int.from_bytes(b, "big") for b in blobs], k)
