"""End-to-end block re-execution from a GuestInput built out of proofs
(the 'in-guest' path: create_mem_db -> execute -> finalize,
reference lib/src/builder.rs)."""

import pytest

from chainsim import ChainSim
from raiko_tpu.evm.builder import calculate_block_header
from raiko_tpu.evm.execute import BlockError
from raiko_tpu.mpt import proofs_to_tries
from raiko_tpu.proto.input import GuestInput, TaikoGuestInput
from raiko_tpu.proto.types import Transaction, Withdrawal
from raiko_tpu.utils import keccak256, secp256k1

KEY = 0xFACE
SENDER = secp256k1.pubkey_to_address(secp256k1.pubkey(KEY))
COUNTER_RUNTIME = bytes([0x5F, 0x54, 0x60, 0x01, 0x01, 0x5F, 0x55, 0x00])
COUNTER_INITCODE = (
    bytes([0x67]) + COUNTER_RUNTIME + bytes([0x5F, 0x52, 0x60, 0x08, 0x60, 0x18, 0xF3])
)


def mktx(nonce, to, value=0, data=b"", gas=200000):
    tx = Transaction(
        tx_type=2,
        chain_id=1,
        nonce=nonce,
        max_priority_fee_per_gas=1,
        max_fee_per_gas=100,
        gas_limit=gas,
        to=to,
        value=value,
        data=data,
    )
    tx.sign(KEY)
    return tx


@pytest.fixture(scope="module")
def sim_world():
    sim = ChainSim("ethereum")
    sim.fund(SENDER, 10**20)
    from raiko_tpu.proto import rlp

    contract = keccak256(rlp.encode([SENDER, 0]))[12:]
    sim.produce_block([mktx(0, None, data=COUNTER_INITCODE)])
    header = sim.produce_block(
        [mktx(1, contract), mktx(2, b"\x42" * 20, value=777, gas=21000)],
        withdrawals=[Withdrawal(0, 1, b"\x43" * 20, 5)],
    )
    return sim, contract, header


def build_guest_input(sim: ChainSim, number: int) -> GuestInput:
    """Assemble a GuestInput from provider-style queries (what preflight
    does, here driven directly for the builder test)."""
    from raiko_tpu.proto.types import BlockHeader

    header, txs, withdrawals = sim.get_block(number)
    parent, _, _ = sim.get_block(number - 1)
    # decouple from the simulator's objects (tests mutate their inputs)
    header = BlockHeader.decode(header.encode())
    parent = BlockHeader.decode(parent.encode())
    # figure out touched accounts/slots by asking the simulator's snapshot
    touched = set(sim.snapshots[number - 1].accounts) | set(
        sim.snapshots[number].accounts
    )
    infos = {}
    slots_of = {}
    for addr in touched:
        slots = sorted(
            set(sim.snapshots[number - 1].storages.get(addr, {}))
            | set(sim.snapshots[number].storages.get(addr, {}))
        )
        slots_of[addr] = slots
        infos[addr] = sim.get_proof(number - 1, addr, slots)
    state_trie, storage_tries = proofs_to_tries(parent.state_root, infos)
    contracts = []
    for addr in touched:
        code = sim.get_code(number - 1, addr)
        if code:
            contracts.append(code)
    ancestors = [sim.get_block(n)[0] for n in range(number - 2, -1, -1)][:256]
    spec = sim.spec
    return GuestInput(
        chain_spec=spec,
        block_header=header,
        transactions=txs,
        withdrawals=withdrawals,
        parent_header=parent,
        parent_state_trie=state_trie,
        parent_storage={
            addr: (storage_tries.get(addr), slots_of[addr]) for addr in touched
        },
        contracts=contracts,
        ancestor_headers=ancestors,
        taiko=TaikoGuestInput(),
    )


def test_rebuild_header_from_proof_input(sim_world):
    sim, contract, header = sim_world
    gi = build_guest_input(sim, 2)
    rebuilt = calculate_block_header(gi)
    assert rebuilt.state_root == header.state_root
    assert rebuilt.receipts_root == header.receipts_root
    assert rebuilt.transactions_root == header.transactions_root
    assert rebuilt.hash() == header.hash()


def test_guest_input_serde_roundtrip(sim_world):
    sim, _, header = sim_world
    gi = build_guest_input(sim, 2)
    data = gi.to_bytes()
    gi2 = GuestInput.from_bytes(data)
    assert gi2.to_bytes() == data  # canonical round-trip
    rebuilt = calculate_block_header(gi2)  # mutates gi2's tries (finalize)
    assert rebuilt.hash() == header.hash()


def test_corrupt_parent_trie_rejected(sim_world):
    sim, _, _ = sim_world
    gi = build_guest_input(sim, 2)
    gi.parent_header.state_root = b"\x00" * 32
    with pytest.raises(BlockError):
        calculate_block_header(gi)


def test_wrong_gas_used_rejected(sim_world):
    sim, _, _ = sim_world
    gi = build_guest_input(sim, 2)
    gi.block_header.gas_used += 1
    with pytest.raises(BlockError):
        calculate_block_header(gi)


def test_tampered_tx_rejected(sim_world):
    sim, _, header = sim_world
    gi = build_guest_input(sim, 2)
    gi.transactions[1].value += 1  # signature now invalid
    with pytest.raises(Exception):
        calculate_block_header(gi)


def test_wrong_base_fee_rejected(sim_world):
    sim, _, _ = sim_world
    gi = build_guest_input(sim, 2)
    gi.block_header.base_fee_per_gas += 1
    with pytest.raises(BlockError):
        calculate_block_header(gi)
