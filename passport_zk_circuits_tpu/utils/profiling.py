"""Profiling / observability helpers.

The reference has no tracing beyond `time` prefixes in shell scripts
(SURVEY.md §5). Here: JAX profiler trace capture, wall-clock stage timers,
and cost accounting in field-multiplies — the framework's native unit of
work (BASELINE.json's second metric is BN254 field-muls/sec).
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, Optional

import jax


class StageTimer:
    """Wall-clock per-stage timing with device synchronization."""

    def __init__(self):
        self.times: Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str, block_on=None):
        t0 = time.perf_counter()
        yield
        if block_on is not None:
            jax.block_until_ready(block_on)
        self.times[name] = self.times.get(name, 0.0) + time.perf_counter() - t0

    def report(self) -> str:
        return json.dumps({k: round(v, 6) for k, v in self.times.items()})


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a JAX profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


# -- field-multiply cost model ----------------------------------------------

def field_mul_cost(p) -> int:
    """Static estimate of BN254 field-muls per RegisterIdentity witness for
    a given CircuitParams — the denominator for field-muls/sec reporting.

    Counts: Poseidon (~(t+3) muls x 65 rounds), SMT climb (80 Poseidon2-ary),
    BabyJubJub ladder (254 x ~27), RSA modexp (bits(e) squarings in k-limb
    units normalized to Fr-mul equivalents), SHA ignored (integer ops)."""
    sig = p.sig
    pose = {2: 250, 3: 330, 4: 400, 5: 470, 6: 540}

    def pose_cost(t):
        return pose.get(t, 540)

    cost = 0
    cost += pose_cost(6) * 2          # pubkey hash + dg1 commitment
    cost += pose_cost(2) * 2          # passport hash + sk hash
    cost += pose_cost(3)              # pk identity hash
    cost += 80 * pose_cost(3) + pose_cost(4)   # SMT climb + leaf
    cost += 254 * 27                  # BabyJubJub ladder
    if p.aa_signature_algo:
        cost += pose_cost(6)
    k_ratio = (sig.key_bits // 256) ** 2
    if sig.family in ("rsa", "rsapss"):
        nmuls = bin(sig.exp).count("1") + sig.exp.bit_length() - 1
        cost += nmuls * k_ratio
    else:
        cost += (64 * 27 + 32 * 16 + 300) * 2   # windowed + fixed-base
    return cost


def witnesses_to_field_muls(p, witnesses_per_sec: float) -> float:
    return witnesses_per_sec * field_mul_cost(p)
