"""Auxiliary-segment (challenge-dependent committed columns) tests:
the permutation grand-product argument end to end."""

import copy

import numpy as np
import pytest

from raiko_tpu.fields import babybear as bb
from raiko_tpu.stark import prover, verifier
from raiko_tpu.stark.airs.permcheck import PermutationAir
from raiko_tpu.stark.serde import proof_from_dict, proof_to_dict


@pytest.fixture(scope="module")
def perm_proof():
    rng = np.random.default_rng(11)
    a = rng.integers(0, bb.P, 64).tolist()
    b = list(a)
    rng.shuffle(b)
    air = PermutationAir()
    trace = PermutationAir.make_trace(a, b)
    proof = prover.prove(air, trace, [])
    return air, trace, proof


def test_permutation_roundtrip(perm_proof):
    air, _, proof = perm_proof
    assert proof.aux_root and len(proof.aux_at_zeta) == 8
    assert all("aux_row" in q for q in proof.queries)
    assert verifier.verify(air, proof)


def test_non_permutation_rejected():
    rng = np.random.default_rng(12)
    a = rng.integers(0, bb.P, 64).tolist()
    b = list(a)
    rng.shuffle(b)
    b[7] = (b[7] + 1) % bb.P  # break the multiset
    air = PermutationAir()
    proof = prover.prove(air, PermutationAir.make_trace(a, b), [])
    assert not verifier.verify(air, proof)


def test_aux_serde_roundtrip(perm_proof):
    air, _, proof = perm_proof
    restored = proof_from_dict(proof_to_dict(proof))
    assert verifier.verify(air, restored)


def test_logup_lookup_roundtrip():
    from raiko_tpu.stark.airs.lookup import LookupAir

    rng = np.random.default_rng(13)
    table = rng.integers(0, bb.P, 64).tolist()
    looked = [table[int(i)] for i in rng.integers(0, 64, 64)]
    air = LookupAir()
    trace = LookupAir.make_trace(looked, table)
    proof = prover.prove(air, trace, [])
    assert verifier.verify(air, proof)


def test_logup_missing_value_rejected():
    from raiko_tpu.stark.airs.lookup import LookupAir

    rng = np.random.default_rng(14)
    table = rng.integers(0, bb.P, 64).tolist()
    looked = [table[int(i)] for i in rng.integers(0, 64, 64)]
    looked[5] = (max(table) + 1) % bb.P  # not in the table
    air = LookupAir()
    trace = LookupAir.make_trace(looked, table)
    proof = prover.prove(air, trace, [])
    assert not verifier.verify(air, proof)


def test_logup_wrong_multiplicity_rejected():
    from raiko_tpu.stark.airs.lookup import LookupAir

    rng = np.random.default_rng(15)
    table = rng.integers(0, bb.P, 64).tolist()
    looked = [table[int(i)] for i in rng.integers(0, 64, 64)]
    trace = LookupAir.make_trace(looked, table)
    trace[3, 2] = (int(trace[3, 2]) + 1) % bb.P  # corrupt a multiplicity
    air = LookupAir()
    proof = prover.prove(air, trace, [])
    assert not verifier.verify(air, proof)


def test_tampered_aux_rejected(perm_proof):
    air, _, proof = perm_proof
    p = copy.deepcopy(proof)
    p.aux_at_zeta = [list(v) for v in p.aux_at_zeta]
    p.aux_at_zeta[0][0] = (p.aux_at_zeta[0][0] + 1) % bb.P
    assert not verifier.verify(air, p)

    p = copy.deepcopy(proof)
    p.queries[0]["aux_row"][0] = (p.queries[0]["aux_row"][0] + 1) % bb.P
    assert not verifier.verify(air, p)

    p = copy.deepcopy(proof)
    p.aux_root[0] = (p.aux_root[0] + 1) % bb.P
    assert not verifier.verify(air, p)
