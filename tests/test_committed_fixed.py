"""Committed fixed segment (Air.commit_fixed, PARITY roadmap #2).

For AIRs with statement-sized fixed tables the verifier's sparse Lagrange
evaluation is O(nnz); a recursive verifier would pay that in GATES.  With
``commit_fixed = True`` the prover Merkle-commits the fixed columns (a
deterministic commitment the verifier recomputes from the statement) and
opens them at zeta + every query; the openings are DEEP/FRI-bound like
any other committed segment.  Analog of plonky3/risc0 "preprocessed
trace" commitments (reference vendors this inside risc0-zkvm, SURVEY.md
§2.2)."""
import pytest

pytestmark = pytest.mark.slow


import copy

import numpy as np
import pytest

from raiko_tpu.fields import babybear as bb
from raiko_tpu.stark import prover, recursion, verifier
from raiko_tpu.stark.air import Air, ConstraintBuilder

LOG_N = 4


def _fixed_cols(n: int) -> np.ndarray:
    rng = np.random.default_rng(1234)
    f = rng.integers(0, bb.P, size=(2, n), dtype=np.uint64).astype(np.uint32)
    f[1] = np.maximum(f[1], 1)  # multiplicative column nonzero
    return f


class AffineChainAir(Air):
    """t' = t * f1 + f0 with committed fixed columns f0, f1."""

    width = 1
    commit_fixed = True

    def eval(self, b: ConstraintBuilder) -> None:
        t0, t1 = b.local(0), b.next(0)
        f0, f1 = b.fixed(0), b.fixed(1)
        b.transition(b.sub(t1, b.add(b.mul(t0, f1), f0)))
        b.first_row(b.sub(t0, b.public(0)))
        b.last_row(b.sub(t0, b.public(1)))

    def fixed_columns(self, n: int):
        return _fixed_cols(n)

    @staticmethod
    def trace(log_n: int, start: int = 7):
        n = 1 << log_n
        f = _fixed_cols(n)
        rows = np.zeros((n, 1), dtype=np.uint32)
        t = start % bb.P
        for i in range(n):
            rows[i, 0] = t
            t = (t * int(f[1, i]) + int(f[0, i])) % bb.P
        return rows, [start % bb.P, int(rows[n - 1, 0])]


class AffineChainPublicFixedAir(AffineChainAir):
    commit_fixed = False


@pytest.fixture(scope="module")
def cf_proof():
    air = AffineChainAir()
    trace, publics = AffineChainAir.trace(LOG_N)
    proof = prover.prove(air, trace, publics)
    return air, trace, publics, proof


def test_committed_fixed_roundtrip(cf_proof):
    air, _, _, proof = cf_proof
    assert proof.fixed_root and proof.fixed_at_zeta
    assert all("fixed_row" in q and "fixed_path" in q for q in proof.queries)
    assert verifier.verify(air, proof)


def test_same_air_public_fixed_roundtrip(cf_proof):
    """The uncommitted (dense-eval) mode of the identical AIR still works
    and its transcript domain-separates from the committed mode."""
    air = AffineChainPublicFixedAir()
    trace, publics = AffineChainAir.trace(LOG_N)
    proof = prover.prove(air, trace, publics)
    assert not proof.fixed_root and not proof.fixed_at_zeta
    assert verifier.verify(air, proof)
    # a committed-mode proof must not pass as an uncommitted statement
    assert not verifier.verify(air, cf_proof[3])
    assert not verifier.verify(AffineChainAir(), proof)


def test_tampered_fixed_parts_rejected(cf_proof):
    air, trace, publics, proof = cf_proof

    p = copy.deepcopy(proof)
    p.fixed_root[0] = (p.fixed_root[0] + 1) % bb.P
    assert not verifier.verify(air, p)

    p = copy.deepcopy(proof)
    p.fixed_at_zeta = [list(v) for v in p.fixed_at_zeta]
    p.fixed_at_zeta[0][0] = (p.fixed_at_zeta[0][0] + 1) % bb.P
    assert not verifier.verify(air, p)

    p = copy.deepcopy(proof)
    p.queries[0]["fixed_row"][0] = (p.queries[0]["fixed_row"][0] + 1) % bb.P
    assert not verifier.verify(air, p)

    # proving with fixed columns that differ from the statement's must be
    # caught by the deterministic-root equality check
    class WrongFixed(AffineChainAir):
        def fixed_columns(self, n: int):
            f = _fixed_cols(n).copy()
            f[0, 0] = (int(f[0, 0]) + 1) % bb.P
            return f

    # trace satisfying the TAMPERED constraint system
    n = 1 << LOG_N
    f = WrongFixed().fixed_columns(n)
    rows = np.zeros((n, 1), dtype=np.uint32)
    t = 7
    for i in range(n):
        rows[i, 0] = t
        t = (t * int(f[1, i]) + int(f[0, i])) % bb.P
    bad = prover.prove(WrongFixed(), rows, [7, int(rows[n - 1, 0])])
    assert not verifier.verify(air, bad)


def test_serde_roundtrip(cf_proof):
    from raiko_tpu.stark import serde

    air, _, _, proof = cf_proof
    back = serde.proof_from_dict(serde.proof_to_dict(proof))
    assert back.fixed_root == list(proof.fixed_root)
    assert verifier.verify(air, back)


def test_recursive_committed_fixed(monkeypatch):
    """An inner proof with a COMMITTED fixed segment verifies inside the
    outer recursive STARK (fixed openings Merkle-checked and DEEP-bound
    in-circuit instead of an O(nnz) in-circuit Lagrange evaluation)."""
    monkeypatch.setattr(prover, "NUM_QUERIES", 4)
    monkeypatch.setattr(verifier, "NUM_QUERIES", 4)

    air = AffineChainAir()
    trace, publics = AffineChainAir.trace(LOG_N)
    proof = prover.prove(air, trace, publics)
    assert verifier.verify(air, proof)
    table = recursion.InnerTable(air, LOG_N, publics)
    outer = recursion.prove_recursion([[table]], [[proof]])
    assert recursion.verify_recursion([[table]], outer)
    # different inner statement (other start value) must fail
    _, other_publics = AffineChainAir.trace(LOG_N, start=8)
    other = recursion.InnerTable(air, LOG_N, other_publics)
    assert not recursion.verify_recursion([[other]], outer)
    # tampered inner fixed openings must be rejected at witness build
    bad = copy.deepcopy(proof)
    bad.queries[0]["fixed_row"][0] = (bad.queries[0]["fixed_row"][0] + 1) % bb.P
    with pytest.raises((ValueError, AssertionError)):
        recursion.prove_recursion([[table]], [[bad]])
