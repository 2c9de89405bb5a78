"""Keccak-f[1600] AIR: prove/verify + tamper rejection."""

import copy

import numpy as np
import pytest

from raiko_tpu.stark import prover, verifier
from raiko_tpu.stark.airs.keccak_air import (
    KeccakFAir,
    bits_to_state,
    state_to_bits,
)
from raiko_tpu.utils.keccak_py import keccak_f1600


@pytest.fixture(scope="module")
def keccak_proof():
    rng = np.random.default_rng(5)
    state = [int(rng.integers(0, 1 << 63)) for _ in range(25)]
    air = KeccakFAir(state)
    proof = prover.prove(air, air.trace(), air.publics())
    return state, air, proof


def test_bits_roundtrip():
    rng = np.random.default_rng(1)
    state = [int(rng.integers(0, 1 << 63)) for _ in range(25)]
    assert bits_to_state(state_to_bits(state)) == state


def test_output_matches_reference(keccak_proof):
    state, air, _ = keccak_proof
    assert air.output_state == keccak_f1600(state)
    assert bits_to_state(air.trace()[24, :1600]) == air.output_state


def test_prove_verify(keccak_proof):
    _, air, proof = keccak_proof
    assert verifier.verify(air, proof)


def test_wrong_statement_rejected(keccak_proof):
    """The statement is bound through proof.publics: callers compare the
    expected publics (as provers/tpu_stark.verify_payload does), and a
    proof cannot be re-targeted by swapping them."""
    state, air, proof = keccak_proof
    other = KeccakFAir([v ^ 1 for v in state])
    assert proof.publics != other.publics()  # caller-side statement check
    p = copy.deepcopy(proof)
    p.publics = other.publics()
    assert not verifier.verify(air, p)  # transcript/boundary both break


def test_tampered_proof_rejected(keccak_proof):
    _, air, proof = keccak_proof
    p = copy.deepcopy(proof)
    p.publics[1600] ^= 1  # claim a different output bit
    assert not verifier.verify(air, p)
    p = copy.deepcopy(proof)
    p.trace_at_zeta = [list(v) for v in p.trace_at_zeta]
    p.trace_at_zeta[7][0] ^= 1
    assert not verifier.verify(air, p)


@pytest.mark.slow
def test_keccak_sponge_prove_verify():
    from raiko_tpu.stark.airs.keccak_air import KeccakSpongeAir
    from raiko_tpu.utils.keccak_py import keccak256

    msg = b"raiko-tpu proves keccak256 of arbitrary messages"
    air = KeccakSpongeAir(msg)
    assert air.digest == keccak256(msg)
    proof = prover.prove(air, air.trace(), air.publics())
    assert verifier.verify(air, proof)
    # digest tamper
    p = copy.deepcopy(proof)
    p.publics[0] ^= 1
    assert not verifier.verify(air, p)


@pytest.mark.slow
def test_keccak_batch_sponge_prove_verify():
    """One trace proving keccak256 of several messages (incl. a 2-block
    one); digest tampering in the fixed columns is caught."""
    from raiko_tpu.stark.airs.keccak_air import KeccakBatchSpongeAir
    from raiko_tpu.utils.keccak_py import keccak256

    msgs = [b"", b"raiko-tpu batched sponge", b"x" * 150]  # 1+1+2 perms
    air = KeccakBatchSpongeAir(msgs)
    assert air.digests == [keccak256(m) for m in msgs]
    proof = prover.prove(air, air.trace(), air.publics())
    assert verifier.verify(air, proof)
    # a verifier checking a WRONG claimed digest must reject: the trace
    # cannot satisfy the digest-row binding for a different value
    bad = KeccakBatchSpongeAir(msgs, digests=[keccak256(m) for m in msgs])
    bad.digests[1] = bytes(32)
    assert not verifier.verify(bad, proof)


@pytest.mark.slow
def test_mpt_preimage_batch_statement():
    """The batched sponge statement over real MPT node preimages: digests
    equal the node references used by the state-root recomputation."""
    from raiko_tpu.mpt.trie import MptNode, hashed_preimages, to_nibs
    from raiko_tpu.stark.airs.keccak_air import KeccakBatchSpongeAir
    from raiko_tpu.utils.keccak_py import keccak256

    trie = MptNode.null()
    for i in range(6):
        trie.insert(to_nibs(keccak256(i.to_bytes(4, "big"))), b"value-%d" % i * 3)
    msgs = hashed_preimages(trie)
    assert len(msgs) >= 3
    assert keccak256(msgs[0]) == trie.hash()  # root preimage first
    air = KeccakBatchSpongeAir(msgs)
    proof = prover.prove(air, air.trace(), air.publics())
    assert verifier.verify(air, proof)
    # digest set == the hashes the trie actually uses
    assert set(air.digests) <= {keccak256(m) for m in msgs}
