#!/usr/bin/env python
"""One-time DATA extraction of the circomlib-compatible Poseidon round
constants from the reference snapshot (numeric constants only — no code is
taken). These constants are required for bit-compatibility with the
reference's Poseidon (test/poseidon_constants.js = mirror of
circuits/lib/circuits/hasher/poseidon/poseidonConstants.circom).

Output: passport_zk_circuits_tpu/utils/constants/poseidon_bn254.npz with keys
``{C,M,P,S}_{t}`` for t=2..17, each a (count, 16) uint32 array of 16-bit
little-endian limbs (matrices M/P are stored row-major flattened, length t*t).
"""

import re
import sys
import pathlib

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
SRC = pathlib.Path("/root/reference/test/poseidon_constants.js")
OUT = ROOT / "passport_zk_circuits_tpu/utils/constants/poseidon_bn254.npz"


def int_to_limbs16(x: int) -> np.ndarray:
    return np.array([(x >> (16 * i)) & 0xFFFF for i in range(16)],
                    dtype=np.uint32)


def main():
    text = SRC.read_text()
    out = {}
    # split into the four function bodies
    parts = re.split(r"function POSEIDON_([CMPS])\(t\)", text)
    for name, body in zip(parts[1::2], parts[2::2]):
        # split per t-branch
        chunks = re.split(r"if \(t\s*==\s*(\d+)\)", body)
        for tstr, chunk in zip(chunks[1::2], chunks[2::2]):
            t = int(tstr)
            nums = [int(h.strip(), 16) if h.strip().startswith("0x")
                    else int(h.strip())
                    for h in re.findall(r'BigInt\("\s*((?:0x)?[0-9a-fA-F]+)\s*"\)',
                                        chunk)]
            if not nums:
                continue
            arr = np.stack([int_to_limbs16(x) for x in nums])
            out[f"{name}_{t}"] = arr
    # sanity: expected counts per circomlib schedule
    NP = [56, 57, 56, 60, 60, 63, 64, 63, 60, 66, 60, 65, 70, 60, 64, 68]
    for t in range(2, 17):
        np_ = NP[t - 2]
        assert out[f"C_{t}"].shape[0] == t * 8 + np_, (t, out[f"C_{t}"].shape)
        assert out[f"M_{t}"].shape[0] == t * t
        assert out[f"P_{t}"].shape[0] == t * t
        assert out[f"S_{t}"].shape[0] == np_ * (2 * t - 1)
    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT} with {len(out)} arrays")


if __name__ == "__main__":
    sys.exit(main())
