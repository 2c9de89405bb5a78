"""Poseidon2 transcript AIR + tpu_stark prover backend."""
import pytest

pytestmark = pytest.mark.slow


import json

import pytest

from raiko_tpu.fields import babybear as bb
from raiko_tpu.provers.tpu_stark import (
    prove_transcript,
    transcript_blocks,
    verify_payload,
)
from raiko_tpu.stark import prover, verifier
from raiko_tpu.stark.airs.poseidon2_air import Poseidon2TranscriptAir
from raiko_tpu.stark.serde import proof_from_dict, proof_to_dict
from raiko_tpu.utils import keccak256


@pytest.fixture(scope="module")
def air_proof():
    blocks = [[i * 8 + j + 1 for j in range(8)] for i in range(4)]
    air = Poseidon2TranscriptAir(blocks)
    digest = air.compute_digest()
    publics = air.publics_for(digest)
    proof = prover.prove(air, air.trace(), publics)
    return air, digest, publics, proof


def test_air_prove_verify(air_proof):
    air, _, _, proof = air_proof
    assert verifier.verify(air, proof)


def test_air_wrong_digest_rejected(air_proof):
    air, digest, _, _ = air_proof
    bad = list(digest)
    bad[0] = (bad[0] + 1) % bb.P
    proof = prover.prove(air, air.trace(), air.publics_for(bad))
    assert not verifier.verify(air, proof)


def test_air_wrong_message_rejected(air_proof):
    air, digest, publics, proof = air_proof
    other = Poseidon2TranscriptAir([[9] * 8] + [[0] * 8] * 3)
    # proof for `air` must not verify against a different transcript
    assert not verifier.verify(other, proof)


def test_proof_serde_roundtrip(air_proof):
    air, _, _, proof = air_proof
    d = proof_to_dict(proof)
    json.dumps(d)  # JSON-able
    p2 = proof_from_dict(d)
    assert verifier.verify(air, p2)


def test_transcript_payload_roundtrip():
    ih = keccak256(b"the instance hash")
    payload = prove_transcript(ih)
    assert verify_payload(payload)
    # corrupting the instance hash breaks the binding
    bad = dict(payload)
    bad["instance_hash"] = keccak256(b"other").hex()
    assert not verify_payload(bad)
    # corrupting the digest breaks it
    bad = dict(payload)
    bad["digest"] = [(payload["digest"][0] + 1) % bb.P] + payload["digest"][1:]
    assert not verify_payload(bad)


def test_transcript_blocks_packing():
    ih = bytes(range(32))
    blocks = transcript_blocks(ih)
    assert len(blocks) == 4 and all(len(b) == 8 for b in blocks)
    # elems = [tag, nblocks, chunk0..chunk15]: chunk0 lands at block0[2],
    # chunk14 (ih[28:30]) at block2[0]; block3 is zero padding
    assert blocks[0][2] == int.from_bytes(ih[0:2], "big")
    assert blocks[2][0] == int.from_bytes(ih[28:30], "big")
    assert blocks[3] == [0] * 8


def test_sharded_prove_verify():
    from raiko_tpu.provers.tpu_shard import prove_sharded, verify_sharded

    ih = keccak256(b"sharded instance")
    payload = prove_sharded(ih)
    assert len(payload["shards"]) == 2
    assert verify_payload is not None  # namespacing sanity
    assert verify_sharded(payload)
    # continuity tamper
    bad = json.loads(json.dumps(payload))
    bad["boundaries"][1][0] ^= 1
    assert not verify_sharded(bad)
    # shard message tamper
    bad = json.loads(json.dumps(payload))
    bad["shards"][0]["blocks"][0][0] ^= 1
    assert not verify_sharded(bad)
