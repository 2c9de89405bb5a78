"""Whole-payload recursion seal (provers/seal.py): group extraction,
sealing, tamper rejection, and the on-chain verifier analog.

The fast test seals a transcript payload (one inner group) end to end —
the same outer two-table machinery any payload uses.  The slow test
seals a payload with an EVM call-tree group (many narrow tables).  Wide
keccak containment tables seal through the same path; their cost is
characterized in BASELINE.md ("seal-v2").
"""

import json

import pytest

from raiko_tpu.provers import seal as seal_mod
from raiko_tpu.provers.tpu_stark import prove_transcript


def test_seal_transcript_payload_roundtrip():
    ih = bytes(range(32))
    payload = prove_transcript(ih)
    s = seal_mod.prove_block_seal(payload)
    assert s["kind"] == "seal-v2" and s["n_groups"] == 1
    assert seal_mod.verify_block_seal(payload, s)
    # the stripped descriptor (no inner proof bodies) verifies too
    stripped = seal_mod.strip_payload(payload)
    assert "stark" not in stripped
    assert seal_mod.verify_block_seal(stripped, s)
    # tampering the statement (different instance hash) must fail
    bad = dict(payload, instance_hash=bytes(32).hex())
    assert not seal_mod.verify_block_seal(bad, s)
    # tampering the shape vector must fail
    bad_seal = dict(s, shapes=[[x + 1 for x in g] for g in s["shapes"]])
    assert not seal_mod.verify_block_seal(payload, bad_seal)


def test_seal_artifact_onchain():
    from chainsim import ChainSim, install_proof_verifier
    from raiko_tpu.core.provider import SimBlockDataProvider
    from raiko_tpu.provers import onchain

    ih = bytes(range(32))
    payload = prove_transcript(ih)
    s = seal_mod.prove_block_seal(payload)
    art = seal_mod.seal_artifact(payload, s)
    # seal size: outer proof + shape vector, independent of the block
    assert seal_mod.verify_seal_artifact(ih, art)
    assert not seal_mod.verify_seal_artifact(bytes(32), art)

    sim = ChainSim("ethereum")
    addr = b"\x53" * 20
    install_proof_verifier(sim, addr)
    provider = SimBlockDataProvider(sim)
    assert onchain.verify_proof_onchain(provider, addr, ih, art)
    assert not onchain.verify_proof_onchain(provider, addr, bytes(32), art)


@pytest.mark.slow
def test_seal_evm_frame_group():
    """Seal a payload carrying an EVM call-tree group: the transcript
    table + every frame/bridge table of one covered frame collapse into
    one outer proof."""
    from raiko_tpu.stark.airs import evm_air as ea

    ih = bytes(range(32))
    payload = prove_transcript(ih)
    frame = ea.prove_frame(
        bytes([0x60, 5, 0x60, 7, 0x01, 0x50, 0x00]),  # PUSH ADD POP
        ea.FrameEnv(codesize=7),
        100000,
    )
    payload["evm"] = {
        "kind": "evm-frames-v1",
        "total": 1,
        "covered": 1,
        "frames": [frame],
    }
    s = seal_mod.prove_block_seal(payload)
    assert s["n_groups"] == 2 and s["unsealed"] == 0
    assert seal_mod.verify_block_seal(payload, s)
    # tamper a frame public: the rebuilt statement no longer matches
    bad_frame = json.loads(json.dumps(frame))
    bad_frame["frames"][0]["gas_f"] = int(bad_frame["frames"][0]["gas_f"]) - 1
    bad = dict(payload, evm=dict(payload["evm"], frames=[bad_frame]))
    assert not seal_mod.verify_block_seal(bad, s)
