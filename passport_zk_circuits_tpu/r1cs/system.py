"""Rank-1 constraint systems with a batched TPU evaluator.

The reference's circuits compile (via circom) to R1CS whose satisfaction is
checked per witness by `circuit.checkConstraints`
(/root/reference/test/automatisationTest.js:51) — the soundness sanitizer of
the whole pipeline (SURVEY.md §5: every `<--` hint is paired with an `===`
check). This module is the TPU-native equivalent:

* `ConstraintSystem` — builder for sparse A, B, C (coefficient triplets over
  witness indices) with circom-like gadget helpers (mul, bool, is_zero,
  bit decomposition);
* `check_batched` — evaluates A·w ∘ B·w − C·w over a *batched* witness
  matrix (n_vars, 16, B) with lazy limb accumulation: per-row sparse
  products are summed in overflowed form via `segment_sum` and reduced with
  ONE Barrett reduction per matrix, then the Hadamard identity is tested.

Witness index 0 is the constant ONE wire, as in circom.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import field as fr
from ..ops import bignum as bn


@dataclasses.dataclass
class ConstraintSystem:
    n_vars: int = 1                      # wire 0 = constant 1
    a: List[Tuple[int, int, int]] = dataclasses.field(default_factory=list)
    b: List[Tuple[int, int, int]] = dataclasses.field(default_factory=list)
    c: List[Tuple[int, int, int]] = dataclasses.field(default_factory=list)
    n_constraints: int = 0
    labels: Dict[int, str] = dataclasses.field(default_factory=dict)

    # -- wires ---------------------------------------------------------

    def new_var(self, label: str = "") -> int:
        idx = self.n_vars
        self.n_vars += 1
        if label:
            self.labels[idx] = label
        return idx

    # -- raw constraint ------------------------------------------------

    def constrain(self, a_terms, b_terms, c_terms):
        """(sum a_i w_i) * (sum b_i w_i) = (sum c_i w_i); terms are
        {var: coeff} dicts (coeffs are Python ints mod p)."""
        row = self.n_constraints
        self.n_constraints += 1
        for terms, mat in ((a_terms, self.a), (b_terms, self.b),
                           (c_terms, self.c)):
            for var, coeff in terms.items():
                coeff %= fr.P
                if coeff:
                    mat.append((row, var, coeff))
        return row

    # -- circom-style gadgets -----------------------------------------

    def mul(self, x: int, y: int, label: str = "mul") -> int:
        z = self.new_var(label)
        self.constrain({x: 1}, {y: 1}, {z: 1})
        return z

    def enforce_bool(self, x: int):
        # x * (x - 1) = 0
        self.constrain({x: 1}, {x: 1, 0: fr.P - 1}, {})

    def enforce_equal(self, x: int, y: int):
        self.constrain({x: 1, y: fr.P - 1}, {0: 1}, {})

    def lincomb_equal(self, terms, x: int):
        """sum terms = x (1 constraint)."""
        self.constrain(dict(terms), {0: 1}, {x: 1})

    def is_zero(self, x: int) -> int:
        """circom IsZero (comparators.circom:11): out = 1 - x*inv, x*out = 0.
        The inverse is a hint wire the witness builder must fill."""
        inv = self.new_var("iszero_inv_hint")
        out = self.new_var("iszero_out")
        self.constrain({x: 1}, {inv: 1}, {out: fr.P - 1, 0: 1})  # x*inv = 1-out
        self.constrain({x: 1}, {out: 1}, {})                     # x*out = 0
        return out

    def bits(self, x: int, n: int) -> List[int]:
        """Num2Bits (bitify.circom:10): n bool wires + recompose."""
        bit_wires = [self.new_var(f"bit{i}") for i in range(n)]
        for b in bit_wires:
            self.enforce_bool(b)
        self.lincomb_equal({b: 1 << i for i, b in enumerate(bit_wires)}, x)
        return bit_wires

    # -- export --------------------------------------------------------

    def matrices(self):
        """Returns (rows, cols, coeff_limbs) per matrix as numpy arrays."""
        out = []
        for mat in (self.a, self.b, self.c):
            if mat:
                rows = np.array([t[0] for t in mat], dtype=np.int32)
                cols = np.array([t[1] for t in mat], dtype=np.int32)
                coeffs = np.stack([fr.to_limbs(t[2]) for t in mat])
            else:
                rows = np.zeros(0, np.int32)
                cols = np.zeros(0, np.int32)
                coeffs = np.zeros((0, fr.NLIMBS), np.uint32)
            out.append((rows, cols, coeffs))
        return out


def _sparse_matvec(rows, cols, coeff_limbs, w, n_rows):
    """(A w) for batched witness w: (n_vars, 16, B) -> (n_rows, 16, B).

    Per-entry products are computed with one batched convolution, summed
    per row in overflowed uint32 form (segment_sum), then reduced with one
    Barrett pass."""
    if len(rows) == 0:
        return jnp.zeros((n_rows, fr.NLIMBS) + w.shape[2:], dtype=jnp.uint32)
    gathered = w[cols]                              # (nnz, 16, B)
    coeffs = jnp.asarray(coeff_limbs)[..., None]    # (nnz, 16, 1)
    prods = bn.poly_mul(jnp.moveaxis(coeffs, 0, 1),
                        jnp.moveaxis(gathered, 0, 1))   # (32, nnz, B)
    prods = jnp.moveaxis(prods, 1, 0)               # (nnz, 32, B)
    sums = jax.ops.segment_sum(prods, jnp.asarray(rows),
                               num_segments=n_rows)  # (n_rows, 32, B)
    # A row may hold up to ~1000 terms, so the summed value can exceed the
    # Barrett bound b^2k. Split at limb 16: sum = lo + hi * 2^256, reduce
    # halves independently (each < 2^(256+10)) and recombine with one
    # constant multiply by 2^256 mod p.
    sums = jnp.moveaxis(sums, 0, 1)                 # (32, n_rows, B)
    zeros = jnp.zeros_like(sums[:16])
    lo = fr.reduce_overflowed(jnp.concatenate([sums[:16], zeros], axis=0))
    hi = fr.reduce_overflowed(jnp.concatenate([sums[16:], zeros], axis=0))
    shift_c = fr.const((1 << 256) % fr.P, lo.shape[1:])
    red = fr.add(lo, fr.mul(hi, shift_c))           # (16, n_rows, B)
    return jnp.moveaxis(red, 1, 0)


def check_batched(cs: ConstraintSystem, witness, row_chunk: int = 131072):
    """witness: (n_vars, 16, B) Fr limbs (wire 0 must be 1).
    Returns (all_ok (B,), per_constraint_ok (n_constraints, B)).

    Systems past `row_chunk` constraints are evaluated in row slices so
    the intermediate (nnz, 32, B) product tensors stay bounded — the
    flagship RegisterIdentity lowering is ~515k constraints / ~2M nnz."""
    mats = cs.matrices()
    n = cs.n_constraints
    if n <= row_chunk:
        return _check_rows(mats, witness, 0, n)
    witness = jnp.asarray(witness)
    oks = []
    for lo in range(0, n, row_chunk):
        _, ok = _check_rows(mats, witness, lo, min(n, lo + row_chunk))
        oks.append(ok)
    ok = jnp.concatenate(oks, axis=0)
    return jnp.all(ok, axis=0), ok


def _check_rows(mats, witness, lo: int, hi: int):
    parts = []
    for rows, cols, coeffs in mats:
        m = (rows >= lo) & (rows < hi)
        parts.append((rows[m] - lo, cols[m], coeffs[m]))
    (ra, ca, va), (rb, cb, vb), (rc, cc, vc) = parts
    n = hi - lo
    az = _sparse_matvec(ra, ca, va, witness, n)     # (n, 16, B)
    bz = _sparse_matvec(rb, cb, vb, witness, n)
    cz = _sparse_matvec(rc, cc, vc, witness, n)
    prod = fr.mul(jnp.moveaxis(az, 0, 1), jnp.moveaxis(bz, 0, 1))
    diff = fr.sub(prod, jnp.moveaxis(cz, 0, 1))     # (16, n, B)
    ok = fr.is_zero(diff)                           # (n, B)
    return jnp.all(ok, axis=0), ok


def witness_matrix(values, batch: int) -> np.ndarray:
    """Host helper: list of per-wire batched ints (or single ints) ->
    (n_vars, 16, B)."""
    rows = []
    for v in values:
        if isinstance(v, int):
            rows.append(np.repeat(fr.to_limbs(v)[:, None], batch, axis=1))
        else:
            rows.append(fr.batch_to_limbs(list(v)))
    return np.stack(rows, axis=0)
