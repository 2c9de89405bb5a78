"""AIR (algebraic intermediate representation) interface.

An AIR describes a computation as a trace matrix (n rows x width columns
over BabyBear) plus polynomial constraints.  Constraints are written once
against an abstract algebra and evaluated twice:

- by the **prover**, vectorized over the whole LDE domain with base-field
  jnp arrays (raiko_tpu.stark.prover), and
- by the **verifier**, at the single out-of-domain point with host
  extension-field scalars (raiko_tpu.stark.verifier).

Constraint kinds and their divisors (SURVEY.md §7 step 6 quotient scheme):

- ``transition(expr)``: must vanish on every row except the last
  (divisor Z_H(x) / (x - g^{n-1})).
- ``first_row(expr)``: must vanish on row 0 (divisor x - 1).
- ``last_row(expr)``: must vanish on row n-1 (divisor x - g^{n-1}).

Max constraint degree 3 (blowup 4 leaves quotient degree < 2n < m).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable


@dataclass
class Constraint:
    kind: str  # "transition" | "first_row" | "last_row"
    expr: Any
    count: int = 1  # >1 for block constraints (expr stacks `count` rows)


class ConstraintBuilder:
    """Collects constraints during Air.eval.

    ``algebra`` supplies add/sub/mul/constant plus row accessors; the same
    Air.eval drives both vectorized prover evaluation and scalar verifier
    evaluation.
    """

    def __init__(self, algebra):
        self.alg = algebra
        self.constraints: list[Constraint] = []

    # row access -------------------------------------------------------
    def local(self, col: int):
        return self.alg.local(col)

    def next(self, col: int):
        return self.alg.next(col)

    def fixed(self, col: int):
        """Public preprocessed column (selectors, round constants,
        absorbed-message lanes).  Both sides know its values: the prover
        extends it alongside the trace, the verifier evaluates it at the
        OOD point directly — no commitment or opening needed."""
        return self.alg.fixed(col)

    def public(self, i: int):
        return self.alg.public(i)

    def constant(self, v: int):
        return self.alg.constant(v)

    # algebra ----------------------------------------------------------
    def add(self, a, b):
        return self.alg.add(a, b)

    def sub(self, a, b):
        return self.alg.sub(a, b)

    def mul(self, a, b):
        return self.alg.mul(a, b)

    # block row access (vectorized AIRs: keccak etc.) -------------------
    def local_block(self, cols) -> Any:
        """Stacked columns: cols is a list of column indices; returns a
        block value (prover: (k, m) array; verifier: list of EF scalars)."""
        return self.alg.local_block(list(cols))

    def next_block(self, cols) -> Any:
        return self.alg.next_block(list(cols))

    def fixed_block(self, cols) -> Any:
        return self.alg.fixed_block(list(cols))

    def public_block(self, idxs) -> Any:
        return self.alg.public_block(list(idxs))

    def scale(self, k: int, a):
        """Multiply by a small integer constant (degree-preserving)."""
        return self.alg.scale(k, a)

    # constraint registration ------------------------------------------
    def transition(self, expr) -> None:
        self.constraints.append(Constraint("transition", expr))

    def first_row(self, expr) -> None:
        self.constraints.append(Constraint("first_row", expr))

    def last_row(self, expr) -> None:
        self.constraints.append(Constraint("last_row", expr))

    def transition_block(self, expr, count: int) -> None:
        self.constraints.append(Constraint("transition", expr, count))

    def first_row_block(self, expr, count: int) -> None:
        self.constraints.append(Constraint("first_row", expr, count))

    def last_row_block(self, expr, count: int) -> None:
        self.constraints.append(Constraint("last_row", expr, count))


class Air:
    """Base class.  Subclasses set ``width`` and implement ``eval`` (and
    typically a trace generator used by the calling prover pipeline).
    ``fixed_columns(n)`` optionally returns an (F, n) uint32 array of
    public preprocessed columns.  ``quotient_chunks`` = max constraint
    degree - 1 (2 supports degree <= 3, 4 supports degree <= 5)."""

    width: int = 0
    quotient_chunks: int = 2

    def eval(self, b: ConstraintBuilder) -> None:
        raise NotImplementedError

    def fixed_columns(self, n: int):
        return None

    def num_constraints(self) -> int:
        class _Probe:
            def __getattr__(self, name):
                return lambda *a, **k: 0

        b = ConstraintBuilder(_Probe())
        self.eval(b)
        return sum(c.count for c in b.constraints)
