"""Top-level framework API — the `train()`-equivalents of SURVEY.md §3.5.

    compile(params)                 -> CompiledCircuit (jitted, cached)
    ingest(dg1, dg15, sod)          -> (params, witness_inputs)
    generate_witness(cc, passports) -> batched outputs (the throughput path)
    check(cs, witness)              -> batched R1CS satisfaction

A user of the reference's pipeline (processPassport -> circom -> wasm
witness) maps 1:1 onto ingest -> compile -> generate_witness.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional

import jax

from .models.params import CircuitParams
from .models import register_identity as _ri
from .ingest import passport as _passport
from .ingest.builder import build_register_inputs


@dataclasses.dataclass(frozen=True)
class CompiledCircuit:
    """A specialized RegisterIdentity program (analog of one generated
    registerIdentity_<...>.circom + its compiled witness generator)."""
    params: CircuitParams

    @functools.cached_property
    def fn(self):
        p = self.params
        return jax.jit(lambda inp: _ri.forward(p, inp))

    def __call__(self, inputs):
        return self.fn(inputs)


def compile(params: CircuitParams) -> CompiledCircuit:  # noqa: A001
    """Specialize the batched witness program for a parameter tuple.
    XLA executables are cached persistently (.jax_cache) keyed by the
    traced shapes — the analog of the reference's generated-circuit files
    (process_passport.js:783)."""
    return CompiledCircuit(params)


def ingest(dg1: bytes, dg15: Optional[bytes], sod: bytes, **kw):
    """processPassport analog: parse + detect + shift discovery."""
    return _passport.process_passport(dg1, dg15, sod, **kw)


def generate_witness(circuit: CompiledCircuit, passports: List[dict]):
    """Batched witness generation: the throughput metric path.
    passports: list of witness dicts (from `ingest` or ingest.synthetic)."""
    inputs = build_register_inputs(circuit.params, passports)
    return circuit(inputs)


def check(cs, witness):
    """Batched R1CS satisfaction (Az∘Bz−Cz == 0) — the sanitizer
    (automatisationTest.js:51 checkConstraints analog)."""
    from .r1cs.system import check_batched
    return check_batched(cs, witness)
