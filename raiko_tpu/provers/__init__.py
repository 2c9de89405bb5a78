"""Proof backends (reference provers/ crates).

Registry-dispatched (reference run_prover, core/src/interfaces.rs:168-222):

- native:    re-execute + check, no proof (reference NativeProver)
- tee:       ECDSA-signed instance hash + mock attestation quote
             (reference SGX prover's proof shape)
- tpu_stark: STARK proof over the Poseidon2 transcript binding the guest
             output (the TPU-native analog of the risc0/sp1 backends)
- tpu_shard: shard-parallel variant of tpu_stark (multi-chip)
"""

from ..core.interfaces import ProofType
from .base import Prover, ProverCtx, get_prover  # noqa: F401


def run_prover(
    proof_type: ProofType, guest_input, output, config: dict, ctx=None
):
    """Dispatch + append the KZG blob proof (ref interfaces.rs:170-222)."""
    prover = get_prover(proof_type)
    proof = prover.run(guest_input, output, config, ctx)
    # append blob KZG data for on-chain blob verification (ref :207-219)
    taiko = guest_input.taiko
    if taiko.blob_commitment is not None and guest_input.chain_spec.is_taiko:
        from ..kzg import eip4844

        vh = eip4844.commitment_to_version_hash(bytes(taiko.blob_commitment))
        # use_tpu=None: same device policy as preflight (eip4844.tpu_default)
        kzg_proof = eip4844.calc_kzg_proof(taiko.tx_data, vh, use_tpu=None)
        proof.kzg_proof = "0x" + kzg_proof.hex()
    return proof


def cancel_proof(proof_type: ProofType, key, id_store=None):
    prover = get_prover(proof_type)
    prover.cancel(key, id_store)
