"""Shard-parallel TPU-STARK backend (the SP1-analog).

The transcript is split at permutation boundaries into S shards; each
shard is an independent STARK over the same Poseidon2 AIR, started from
the sponge state its predecessor exposes (full 16-lane boundary publics).
The aggregate proof = S shard proofs + the boundary states; verification
checks every shard proof plus the continuity chain

    shard[i].final_state == shard[i+1].initial_state
    shard[0].initial_state == 0, shard[S-1] digest == claimed digest.

This is exactly SP1's shard model (reference docs/README_Sp1.md SHARD_SIZE
semantics, SURVEY.md §2.3(d)): shards are independent proving tasks, so
they scale across chips — the multi-chip dispatch lives in
raiko_tpu/parallel (each shard's prove is a self-contained device
workload)."""

from __future__ import annotations

import json

from ..core.interfaces import GuestError, Proof, ProofType
from ..evm.builder import calculate_block_header
from ..proto.instance import ProtocolInstance
from ..stark import prover as stark_prover
from ..stark import verifier as stark_verifier
from ..stark.airs.poseidon2_air import WIDTH, Poseidon2TranscriptAir
from ..stark.serde import proof_from_dict, proof_to_dict
from . import proof_cache
from .base import Prover, register
from .tpu_stark import NUM_BLOCKS, transcript_blocks

SHARD_BLOCKS = 2  # permutations per shard (power of two)


class TpuShardProver(Prover):
    proof_type = ProofType.TPU_SHARD

    def run(self, guest_input, output, config: dict, ctx=None) -> Proof:
        header = calculate_block_header(guest_input)
        pi = ProtocolInstance.new(guest_input, header, "SP1")
        ih = pi.instance_hash()
        if ih != output.hash:
            raise GuestError("instance hash mismatch in tpu_shard guest")
        config = config or {}
        cached = proof_cache.load_proof(config, "tpu_shard", ih)
        if cached is not None:
            return Proof(proof=json.dumps(cached), input_hash="0x" + ih.hex())
        if config.get("recursion"):
            payload = prove_sharded_recursive(ih)
        else:
            payload = prove_sharded(ih)
        proof_cache.save_proof(config, "tpu_shard", ih, payload)
        return Proof(proof=json.dumps(payload), input_hash="0x" + ih.hex())

    def cancel(self, key, id_store=None) -> None:
        pass


def prove_sharded(instance_hash: bytes, shard_blocks: int = SHARD_BLOCKS) -> dict:
    blocks = transcript_blocks(instance_hash)
    assert len(blocks) % shard_blocks == 0
    shards = []
    state = [0] * WIDTH
    boundaries = [list(state)]
    for off in range(0, len(blocks), shard_blocks):
        shard_blk = blocks[off : off + shard_blocks]
        air = Poseidon2TranscriptAir(
            shard_blk, initial_state=state, expose_full_state=True
        )
        final_state = air.compute_final_state()
        publics = air.publics_for(final_state)
        sp = stark_prover.prove(air, air.trace(), publics)
        shards.append({"blocks": shard_blk, "stark": proof_to_dict(sp)})
        state = final_state
        boundaries.append(list(state))
    return {
        "kind": "poseidon2-transcript-sharded-v1",
        "instance_hash": instance_hash.hex(),
        "shard_blocks": shard_blocks,
        "boundaries": boundaries,
        "digest": boundaries[-1][:8],
        "shards": shards,
    }


def _shard_tables(
    ih: bytes, shard_blocks: int, boundaries: list[list[int]]
) -> list:
    """The shard statement as recursion InnerTables: one Poseidon2
    transcript AIR per shard, publics chaining through the boundary
    states (SP1-style shard continuity, now enforced INSIDE one proof)."""
    from ..stark import recursion

    blocks = transcript_blocks(ih)
    log_n = (32 * shard_blocks).bit_length() - 1
    tables = []
    for i in range(len(blocks) // shard_blocks):
        air = Poseidon2TranscriptAir(
            blocks[i * shard_blocks : (i + 1) * shard_blocks],
            initial_state=boundaries[i],
            expose_full_state=True,
        )
        tables.append(
            recursion.InnerTable(air, log_n, air.publics_for(boundaries[i + 1]))
        )
    return tables


def prove_sharded_recursive(
    instance_hash: bytes, shard_blocks: int = SHARD_BLOCKS
) -> dict:
    """Shard proving + recursive aggregation: the S shard STARKs are
    verified inside ONE outer proof (stark/recursion.py), so the final
    artifact carries two STARKs regardless of shard count — the risc0/SP1
    aggregation model (SURVEY.md §7 step 6)."""
    from ..stark import recursion

    base = prove_sharded(instance_hash, shard_blocks)
    boundaries = base["boundaries"]
    tables = _shard_tables(instance_hash, shard_blocks, boundaries)
    inner = [proof_from_dict(s["stark"]) for s in base["shards"]]
    outer = recursion.prove_recursion([[t] for t in tables], [[p] for p in inner])
    return {
        "kind": "poseidon2-transcript-sharded-recursive-v1",
        "instance_hash": instance_hash.hex(),
        "shard_blocks": shard_blocks,
        "boundaries": boundaries,
        "digest": boundaries[-1][:8],
        "outer": [proof_to_dict(p) for p in outer],
    }


def verify_sharded_recursive(payload: dict) -> bool:
    if payload.get("kind") != "poseidon2-transcript-sharded-recursive-v1":
        return False
    from ..stark import recursion

    ih = bytes.fromhex(payload["instance_hash"])
    blocks = transcript_blocks(ih)
    sb = payload["shard_blocks"]
    nshards = len(blocks) // sb
    boundaries = payload["boundaries"]
    if len(boundaries) != nshards + 1:
        return False
    if boundaries[0] != [0] * WIDTH:
        return False
    if payload["digest"] != boundaries[-1][:8]:
        return False
    tables = _shard_tables(ih, sb, boundaries)
    outer = [proof_from_dict(d) for d in payload["outer"]]
    return recursion.verify_recursion([[t] for t in tables], outer)


def verify_sharded(payload: dict) -> bool:
    if payload.get("kind") != "poseidon2-transcript-sharded-v1":
        return False
    ih = bytes.fromhex(payload["instance_hash"])
    blocks = transcript_blocks(ih)
    sb = payload["shard_blocks"]
    nshards = len(blocks) // sb
    boundaries = payload["boundaries"]
    if len(payload["shards"]) != nshards or len(boundaries) != nshards + 1:
        return False
    if boundaries[0] != [0] * WIDTH:
        return False
    if payload["digest"] != boundaries[-1][:8]:
        return False
    for i, shard in enumerate(payload["shards"]):
        expect_blocks = blocks[i * sb : (i + 1) * sb]
        if [list(b) for b in shard["blocks"]] != expect_blocks:
            return False
        air = Poseidon2TranscriptAir(
            expect_blocks,
            initial_state=boundaries[i],
            expose_full_state=True,
        )
        sp = proof_from_dict(shard["stark"])
        # publics must chain: init = boundary[i] path, out = boundary[i+1]
        if sp.publics != air.publics_for(boundaries[i + 1]):
            return False
        if not stark_verifier.verify(air, sp):
            return False
    return True


register(TpuShardProver())
