"""TPU-STARK prover backend: bind the guest output into a STARK.

The TPU-native analog of the reference's zkVM backends (risc0/sp1
drivers): block re-execution runs on the host (like preflight), and the
proving work — trace LDE, Merkle commitments, DEEP quotient, FRI — runs
through the TPU STARK pipeline (raiko_tpu.stark).

Round-1 statement (documented scope): the proof demonstrates knowledge of
a Poseidon2 sponge transcript over the public message

    [DOMAIN_TAG, n_blocks, instance_hash as 16 x 16-bit chunks, 0-pad]

whose digest equals the public digest — i.e. a STARK-bound commitment to
the protocol instance hash, with proof/verify fully succinct.  Extending
the AIR set toward full execution proofs (keccak/MPT/EVM trace AIRs with
recursion) is the roadmap for subsequent rounds; the pipeline underneath
(NTT/LDE + Poseidon2 Merkle + DEEP-ALI + FRI) is the complete engine
those AIRs plug into.

The proof JSON carries the serialized StarkProof + the public transcript;
``verify_payload`` reconstructs the AIR from the payload alone.
"""

from __future__ import annotations

import json

from ..core.interfaces import GuestError, Proof, ProofType
from ..evm.builder import calculate_block_header
from ..proto.instance import ProtocolInstance
from ..stark import prover as stark_prover
from ..stark import verifier as stark_verifier
from ..stark.airs.poseidon2_air import RATE, Poseidon2TranscriptAir
from ..stark.serde import proof_from_dict, proof_to_dict
from .base import Prover, register

DOMAIN_TAG = 0x52545031  # "RTP1"
NUM_BLOCKS = 4


def transcript_blocks(instance_hash: bytes, num_blocks: int = NUM_BLOCKS):
    """[tag, nblocks, hash chunks...] packed into RATE-wide blocks."""
    chunks = [
        int.from_bytes(instance_hash[2 * i : 2 * i + 2], "big") for i in range(16)
    ]
    elems = [DOMAIN_TAG, num_blocks] + chunks
    blocks = []
    for i in range(num_blocks):
        blk = elems[RATE * i : RATE * (i + 1)]
        blocks.append(blk + [0] * (RATE - len(blk)))
    return blocks


class TpuStarkProver(Prover):
    proof_type = ProofType.TPU_STARK

    def run(self, guest_input, output, config: dict) -> Proof:
        header = calculate_block_header(guest_input)
        pi = ProtocolInstance.new(guest_input, header, "RISC0")
        ih = pi.instance_hash()
        if ih != output.hash:
            raise GuestError("instance hash mismatch in tpu_stark guest")
        payload = prove_transcript(ih)
        return Proof(
            proof=json.dumps(payload),
            input_hash="0x" + ih.hex(),
        )

    def cancel(self, key) -> None:  # local proving; nothing to cancel
        pass


def prove_transcript(instance_hash: bytes) -> dict:
    blocks = transcript_blocks(instance_hash)
    air = Poseidon2TranscriptAir(blocks)
    digest = air.compute_digest()
    publics = air.publics_for(digest)
    trace = air.trace()
    sp = stark_prover.prove(air, trace, publics)
    return {
        "kind": "poseidon2-transcript-v1",
        "instance_hash": instance_hash.hex(),
        "blocks": blocks,
        "digest": digest,
        "stark": proof_to_dict(sp),
    }


def verify_payload(payload: dict) -> bool:
    """Reconstruct the AIR from public data and verify the STARK."""
    if payload.get("kind") != "poseidon2-transcript-v1":
        return False
    ih = bytes.fromhex(payload["instance_hash"])
    blocks = transcript_blocks(ih)
    if blocks != [list(b) for b in payload["blocks"]]:
        return False  # message does not bind the claimed instance hash
    air = Poseidon2TranscriptAir(blocks)
    digest = air.compute_digest()
    if digest != list(payload["digest"]):
        return False
    sp = proof_from_dict(payload["stark"])
    if sp.publics != air.publics_for(digest):
        return False
    return stark_verifier.verify(air, sp)


register(TpuStarkProver())
