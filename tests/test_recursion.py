"""Recursive aggregation: a STARK proof verified inside a STARK
(stark/recursion.py).  Uses a reduced query count to keep the CPU-mesh
test fast; the circuit structure is identical at the production
NUM_QUERIES=40 (just more query blocks)."""
import pytest

pytestmark = pytest.mark.slow


import pytest

from raiko_tpu.fields import babybear as bb
from raiko_tpu.stark import prover, recursion, verifier
from raiko_tpu.stark.airs.fib import FibAir

LOG_N = 4
QUERIES = 4


@pytest.fixture()
def small_params(monkeypatch):
    monkeypatch.setattr(prover, "NUM_QUERIES", QUERIES)
    monkeypatch.setattr(verifier, "NUM_QUERIES", QUERIES)


@pytest.fixture()
def inner(small_params):
    air = FibAir()
    trace, publics = FibAir.trace(LOG_N)
    proof = prover.prove(air, trace, publics)
    assert verifier.verify(air, proof)
    return recursion.InnerTable(air, LOG_N, publics), proof


def test_recursive_fib(inner):
    table, proof = inner
    outer = recursion.prove_recursion([[table]], [[proof]])
    assert recursion.verify_recursion([[table]], outer)
    # outer proof against a DIFFERENT statement must fail
    _, other_publics = FibAir.trace(LOG_N, a=2, b=3)
    other = recursion.InnerTable(table.air, LOG_N, other_publics)
    assert not recursion.verify_recursion([[other]], outer)


def test_recursion_rejects_invalid_inner(inner):
    table, proof = inner
    bad = recursion.StarkProof(**{**proof.__dict__})
    bad.trace_at_zeta = [tuple((v + 1) % bb.P for v in t) for t in proof.trace_at_zeta]
    with pytest.raises((ValueError, AssertionError)):
        recursion.prove_recursion([[table]], [[bad]])


def test_recursive_shard_aggregation(small_params):
    """SP1-style shard proofs aggregated into ONE recursive proof
    (provers/tpu_shard.py recursive mode): 2 Poseidon2-transcript shard
    STARKs verified inside a single outer two-table STARK, boundary
    continuity included in the statement."""
    from raiko_tpu.provers import tpu_shard

    ih = bytes(range(32))
    payload = tpu_shard.prove_sharded_recursive(ih)
    assert payload["kind"] == "poseidon2-transcript-sharded-recursive-v1"
    assert len(payload["outer"]) == 2
    assert tpu_shard.verify_sharded_recursive(payload)
    # tampered boundary chain -> different statement -> reject
    bad = dict(payload)
    bad["boundaries"] = [list(b) for b in payload["boundaries"]]
    bad["boundaries"][1][0] = (bad["boundaries"][1][0] + 1) % bb.P
    assert not tpu_shard.verify_sharded_recursive(bad)


def test_recursion_rejects_tampered_outer(inner):
    table, proof = inner
    outer = recursion.prove_recursion([[table]], [[proof]])
    bad0 = recursion.StarkProof(**{**outer[0].__dict__})
    bad0.trace_root = [(v + 1) % bb.P for v in outer[0].trace_root]
    assert not recursion.verify_recursion([[table]], [bad0, outer[1]])
