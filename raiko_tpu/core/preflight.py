"""Preflight: turn (network, block) + provider state into a self-contained
GuestInput (reference core/src/preflight.rs:36-188).

Steps mirrored from the reference:
1. fetch the block + parent,
2. Taiko: assemble the L1-side data (proposal metadata, tx-list blob,
   anchor tx, blob commitment; ref prepare_taiko_chain_input :191-280),
3. iterative optimistic execution (<= 100 rounds) batching missing state
   through ProviderDb (ref :116-139),
4. EIP-1186 proofs for initial + final state -> sparse tries (:146-157),
5. ancestor headers + contract bytecodes (:160-176),
6. assemble the GuestInput.
"""

from __future__ import annotations

from ..chain import SupportedChainSpecs
from ..evm.execute import execute_block_txs, apply_withdrawals
from ..evm.interpreter import BlockEnv
from ..evm.state import StateJournal
from ..kzg import eip4844
from ..mpt import proofs_to_tries
from ..proto.input import GuestInput, TaikoGuestInput
from ..proto.types import BlockHeader
from ..utils.txlist import generate_transactions
from .interfaces import PreflightError, ProofRequest
from .provider import provider_for
from .provider_db import ProviderDb

MAX_OPTIMISTIC_ITERATIONS = 100


def preflight(
    request: ProofRequest, chain_specs: SupportedChainSpecs
) -> GuestInput:
    spec = chain_specs.get(request.network)
    provider = provider_for(spec)
    n = request.block_number
    blocks = provider.get_blocks([n, n - 1])
    (header, txs, withdrawals), (parent, _, _) = blocks[0], blocks[1]

    taiko = TaikoGuestInput()
    if spec.is_taiko:
        taiko = prepare_taiko_chain_input(request, spec, chain_specs, header, txs)
        exec_txs = generate_transactions(
            spec,
            taiko.block_proposed_meta.blob_used,
            taiko.tx_data,
            taiko.anchor_tx,
        )
    else:
        exec_txs = txs
    taiko.prover_data_prover = _hexaddr(request.prover)
    taiko.prover_data_graffiti = _hex32(request.graffiti)

    env = BlockEnv(
        number=header.number,
        timestamp=header.timestamp,
        gas_limit=header.gas_limit,
        base_fee=header.base_fee_per_gas or 0,
        coinbase=header.beneficiary,
        prevrandao=header.mix_hash,
        chain_id=spec.chain_id,
        difficulty=header.difficulty,
    )
    treasury = None
    if spec.is_taiko and spec.l2_contract:
        treasury = bytes.fromhex(spec.l2_contract[2:].zfill(40))

    # optimistic execution loop (ref :116-139)
    db = ProviderDb(provider, n - 1, parent)
    for _ in range(MAX_OPTIMISTIC_ITERATIONS):
        state = StateJournal(db)
        execute_block_txs(
            state,
            env,
            exec_txs,
            is_taiko=spec.is_taiko,
            treasury=treasury,
            optimistic=True,
        )
        apply_withdrawals(state, withdrawals)
        if db.fetch_data():
            break
    else:
        raise PreflightError("optimistic execution did not converge")

    # proofs -> sparse tries; final proofs resolve orphaned siblings of
    # deleted keys (ref :146-157, :1116-1133)
    initial_proofs, final_proofs = db.get_proofs(n)
    state_trie, storage_tries = proofs_to_tries(
        parent.state_root, initial_proofs, final_proofs
    )
    proof_keys = db.proof_keys()
    parent_storage = {
        addr: (storage_tries.get(addr), proof_keys.get(addr, []))
        for addr in initial_proofs
    }
    contracts = sorted(
        {info.code for info in db.accounts.values() if info and info.code}
    )
    ancestor_headers = db.get_ancestor_headers()
    return GuestInput(
        chain_spec=spec,
        block_header=header,
        transactions=txs,
        withdrawals=withdrawals,
        parent_header=parent,
        parent_state_trie=state_trie,
        parent_storage=parent_storage,
        contracts=contracts,
        ancestor_headers=ancestor_headers,
        taiko=taiko,
    )


def prepare_taiko_chain_input(
    request: ProofRequest,
    spec,
    chain_specs: SupportedChainSpecs,
    header: BlockHeader,
    txs,
) -> TaikoGuestInput:
    """L1-side data assembly (ref :191-280).

    The provider for the L1 network must expose the proposal lookup
    (``get_block_proposed``) and blob retrieval (``get_blob``); the RPC
    implementation resolves them via log filters and the beacon API, the
    simulator serves them directly."""
    l1_spec = chain_specs.get(request.l1_network)
    l1_provider = provider_for(l1_spec)
    if not txs:
        raise PreflightError("taiko block without anchor tx")
    anchor_tx = txs[0]
    if not hasattr(l1_provider, "sim") or not hasattr(
        l1_provider.sim, "get_block_proposed"
    ):
        raise PreflightError(
            "L1 provider does not expose proposal data (live beacon/blobscan "
            "retrieval requires network access)"
        )
    proposal = l1_provider.sim.get_block_proposed(header.number)
    meta = proposal["meta"]
    l1_header = BlockHeader.decode(proposal["l1_header"].encode())
    tx_data = proposal["tx_data"]
    blob_commitment = None
    if meta.blob_used:
        blob_commitment = eip4844.blob_to_kzg_commitment(tx_data, use_tpu=False)
        if eip4844.commitment_to_version_hash(blob_commitment) != meta.blob_hash:
            raise PreflightError("blob versioned hash mismatch")
    return TaikoGuestInput(
        l1_header=l1_header,
        tx_data=tx_data,
        anchor_tx=anchor_tx,
        block_proposed_meta=meta,
        blob_commitment=blob_commitment,
        blob_proof_type=request.blob_proof_type,
    )


def _hexaddr(s: str) -> bytes:
    return bytes.fromhex(s[2:].zfill(40)) if s.startswith("0x") else bytes.fromhex(s)


def _hex32(s: str) -> bytes:
    return bytes.fromhex(s[2:].zfill(64)) if s.startswith("0x") else bytes.fromhex(s)
