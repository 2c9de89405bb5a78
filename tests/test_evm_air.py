"""EVM execution-trace AIRs (stark/airs/evm_air.py): constraint
satisfaction over a program exercising every covered opcode, negative
soundness probes via the debug checker, and the full multi-table
prove/verify roundtrip with payload tampering."""

import numpy as np
import pytest

from raiko_tpu.fields import babybear as bb
from raiko_tpu.fields import babybear_ext as ef
from raiko_tpu.stark.airs import evm_air as ea
from raiko_tpu.stark.debug import check_constraints


def asm(*items) -> bytes:
    """Two-pass mini assembler: ints are opcodes, ("push", n, value)
    emits PUSHn, ("label", name) marks, ("jumpdest", name) marks + emits
    0x5B, ("pushlabel", name) emits PUSH2 <label-pc>."""
    labels = {}
    for _pass in range(2):
        out = bytearray()
        for it in items:
            if isinstance(it, int):
                out.append(it)
            elif it[0] == "push":
                _, n, v = it
                out.append(0x5F + n)
                out += int(v).to_bytes(n, "big")
            elif it[0] == "jumpdest":
                labels[it[1]] = len(out)
                out.append(0x5B)
            elif it[0] == "pushlabel":
                out.append(0x61)
                out += labels.get(it[1], 0).to_bytes(2, "big")
            else:
                raise ValueError(it)
    return bytes(out)


def full_coverage_program() -> bytes:
    """Exercises every covered opcode, including a taken JUMPI, a
    not-taken JUMPI, an unconditional JUMP, DUP16/SWAP16, and a PUSH32."""
    items = [
        # arithmetic / comparisons
        ("push", 2, 0x1234),
        ("push", 32, (1 << 255) + 12345),        # negative as signed
        0x01,                                     # ADD
        ("push", 1, 7),
        0x03,                                     # SUB
        ("push", 1, 9),
        0x10,                                     # LT
        ("push", 1, 3),
        0x11,                                     # GT
        ("push", 32, (1 << 256) - 5),             # -5 signed
        ("push", 1, 4),
        0x12,                                     # SLT (4 < -5? no -> 0)
        ("push", 32, (1 << 256) - 5),
        ("push", 1, 4),
        0x13,                                     # SGT (4 > -5 -> 1)
        0x14,                                     # EQ
        0x15,                                     # ISZERO
        # bitwise
        ("push", 2, 0xF0F0),
        ("push", 2, 0x0FF0),
        0x16,                                     # AND
        ("push", 2, 0x000F),
        0x17,                                     # OR
        ("push", 2, 0xFFFF),
        0x18,                                     # XOR
        0x19,                                     # NOT
        0x50,                                     # POP
        # environment constants
        0x30, 0x32, 0x33, 0x34, 0x36, 0x38, 0x3A, 0x41,
        0x42, 0x43, 0x44, 0x45, 0x46, 0x48, 0x4A,
        # deep stack ops: there are >16 items on the stack now
        0x8F,                                     # DUP16
        0x9F,                                     # SWAP16
        0x58,                                     # PC
        0x5A,                                     # GAS
        0x01, 0x01, 0x01,                         # fold a few
        # taken JUMPI
        ("push", 1, 1),
        ("pushlabel", "L1"),
        0x57,                                     # JUMPI -> taken
        0x00,                                     # STOP (skipped)
        ("jumpdest", "L1"),
        # not-taken JUMPI
        ("push", 1, 0),
        ("pushlabel", "L2"),
        0x57,                                     # JUMPI -> not taken
        # unconditional JUMP over a gap
        ("pushlabel", "L2"),
        0x56,                                     # JUMP
        0xFE,                                     # INVALID (skipped)
        ("jumpdest", "L2"),
        0x5F,                                     # PUSH0
        0x50,                                     # POP
        # run off the end: virtual STOP
    ]
    return asm(*items)


ENV = ea.FrameEnv(
    address=0xAAAA, origin=0xBBBB, caller=0xCCCC, callvalue=5,
    calldatasize=68, gasprice=7, coinbase=0xDDDD, timestamp=1_700_000_000,
    number=19_000_000, prevrandao=(1 << 200) + 3, gaslimit=30_000_000,
    chainid=167, basefee=11, blobbasefee=1,
)


@pytest.fixture(scope="module")
def frame():
    code = full_coverage_program()
    return ea.execute_frame(code, ENV, gas=200_000)


@pytest.fixture(scope="module")
def challenges():
    rng = np.random.default_rng(42)
    return [tuple(int(v) for v in rng.integers(1, bb.P, 4)) for _ in range(3)]


def test_executor_covers_everything(frame):
    names = {st.name for st in frame.steps}
    assert names == set(ea.FLAG_NAMES), set(ea.FLAG_NAMES) - names
    # interpreter cross-check on an arithmetic sub-program: the covered
    # executor and the full EVM interpreter must agree on gas and stack
    from raiko_tpu.evm.interpreter import EVM, BlockEnv, TxEnv
    from raiko_tpu.evm.state import StateJournal

    class _NullDb:
        def basic(self, a):
            return None

        def storage(self, a, k):
            return 0

        def block_hash(self, n):
            return b"\x00" * 32

        def code_by_hash(self, h):
            return b""

    code = full_coverage_program()
    st = StateJournal(_NullDb())
    addr = ENV.address.to_bytes(20, "big")
    st.set_code(addr, code)
    evm = EVM(
        st,
        BlockEnv(
            number=ENV.number, timestamp=ENV.timestamp,
            gas_limit=ENV.gaslimit, base_fee=ENV.basefee,
            coinbase=ENV.coinbase.to_bytes(20, "big"),
            prevrandao=ENV.prevrandao.to_bytes(32, "big"),
            chain_id=ENV.chainid, blob_base_fee=ENV.blobbasefee,
        ),
        TxEnv(origin=ENV.origin.to_bytes(20, "big"), gas_price=ENV.gasprice),
    )
    res = evm.call(
        ENV.caller.to_bytes(20, "big"), addr, ENV.callvalue,
        b"\x00" * ENV.calldatasize, 200_000, transfers_value=False,
    )
    assert res.success
    assert res.gas_left == frame.gas_f


def test_constraints_and_bus_balance(frame, challenges):
    tables = ea.frame_tables(frame)
    totals = [ef.H_ZERO, ef.H_ZERO]
    for air, trace, publics in tables:
        assert check_constraints(air, trace, publics, challenges) == []
        for i, bv in enumerate(air.bus_values(trace, challenges)):
            totals[i] = ef.h_add(totals[i], bv)
    assert all(t == ef.H_ZERO for t in totals)


def test_tampered_add_result_caught(frame, challenges):
    cpu, trace, publics = ea.frame_tables(frame)[0]
    trace = trace.copy()
    add_rows = np.where(trace[:, ea.FLAG0 + ea.FLAG_IDX["add"]] == 1)[0]
    trace[add_rows[0], ea.C0] ^= 1  # flip result bit 0
    assert check_constraints(cpu, trace, publics, challenges)


def test_tampered_gas_caught(frame, challenges):
    cpu, trace, publics = ea.frame_tables(frame)[0]
    trace = trace.copy()
    trace[3, ea.GASB0] ^= 1
    assert check_constraints(cpu, trace, publics, challenges)


def test_misclassified_opcode_caught(frame, challenges):
    """Claiming an ADD row is a SUB must break the op-byte binding."""
    cpu, trace, publics = ea.frame_tables(frame)[0]
    trace = trace.copy()
    add_rows = np.where(trace[:, ea.FLAG0 + ea.FLAG_IDX["add"]] == 1)[0]
    r = add_rows[0]
    trace[r, ea.FLAG0 + ea.FLAG_IDX["add"]] = 0
    trace[r, ea.FLAG0 + ea.FLAG_IDX["sub"]] = 1
    assert check_constraints(cpu, trace, publics, challenges)


def test_wrong_rom_multiplicity_unbalances_bus(frame, challenges):
    tables = ea.frame_tables(frame)
    rom, rom_trace, _ = tables[1]
    rom_trace = rom_trace.copy()
    rom_trace[0, ea.RM_MULT] += 1
    totals = [ef.H_ZERO, ef.H_ZERO]
    for (air, trace, publics), tr in zip(
        tables, [tables[0][1], rom_trace, tables[2][1]]
    ):
        for i, bv in enumerate(air.bus_values(tr, challenges)):
            totals[i] = ef.h_add(totals[i], bv)
    assert totals[0] != ef.H_ZERO  # fetch channel no longer balances


def test_stack_read_consistency_caught(frame, challenges):
    stk, trace, publics = ea.frame_tables(frame)[2]
    trace = trace.copy()
    # find a read row that repeats an address (sa=1, iw=0) and flip a bit
    rows = np.where((trace[:, ea.SK_SA] == 1) & (trace[:, ea.SK_IW] == 0))[0]
    assert len(rows)
    trace[rows[0], ea.SK_V0 + 3] ^= 1
    assert check_constraints(stk, trace, publics, challenges)


def test_uncovered_frame_rejected():
    with pytest.raises(ea.UncoveredFrame):
        ea.execute_frame(bytes([0x60, 0x02, 0x60, 0x03, 0x02, 0x00]),
                         ea.FrameEnv(), 10_000)  # MUL
    with pytest.raises(ea.UncoveredFrame):
        ea.execute_frame(bytes([0x50]), ea.FrameEnv(), 10_000)  # underflow
    with pytest.raises(ea.UncoveredFrame):
        ea.execute_frame(bytes([0x60, 0x00, 0x56]), ea.FrameEnv(), 10_000)


def test_prove_verify_roundtrip():
    """Small frame through the real multi-table prover; payload tampering
    must be rejected."""
    code = asm(
        ("push", 1, 5), ("push", 1, 7), 0x01, 0x80, 0x14, 0x15,
        ("pushlabel", "end"), 0x57, 0x00,
        ("jumpdest", "end"), 0x33, 0x50,
    )
    payload = ea.prove_frame(code, ENV, 50_000)
    assert ea.verify_frame_payload(payload)

    bad = dict(payload, gas_f=payload["gas_f"] - 1)
    assert not ea.verify_frame_payload(bad)

    other = bytearray(code)
    other[1] ^= 1  # different push immediate
    bad = dict(payload, code=bytes(other).hex())
    assert not ea.verify_frame_payload(bad)

    bad_env = dict(payload["env"], caller=hex(ENV.caller + 1))
    assert not ea.verify_frame_payload(dict(payload, env=bad_env))

    bad = dict(payload, accesses=payload["accesses"] + 1)
    assert not ea.verify_frame_payload(bad)


def test_block_frame_statement():
    """A simulated block whose tx calls a covered contract: the TPU_STARK
    payload gains an `evm` slot proving the frame's execution."""
    import json

    from chainsim import ChainSim
    from raiko_tpu.chain import SupportedChainSpecs
    from raiko_tpu.core.interfaces import ProofRequest, ProofType
    from raiko_tpu.core.orchestrator import Raiko
    from raiko_tpu.core.provider import register_sim, _SIM_REGISTRY
    from raiko_tpu.provers import tpu_stark as ts
    from raiko_tpu.proto.types import Transaction
    from raiko_tpu.utils import secp256k1

    contract_code = asm(
        0x34,                    # CALLVALUE
        ("push", 1, 5), 0x01,    # + 5
        0x33, 0x16,              # CALLER; AND
        0x50,                    # POP; then run off the end (virtual STOP)
    )
    key = 0xA11CE
    sender = secp256k1.pubkey_to_address(secp256k1.pubkey(key))
    _SIM_REGISTRY.clear()
    l1 = ChainSim("ethereum")
    l1.fund(sender, 10**20)
    contract = b"\xc0" * 20
    l1.fund(contract, 0, code=contract_code)
    tx = Transaction(
        tx_type=2, chain_id=1, nonce=0, max_priority_fee_per_gas=1,
        max_fee_per_gas=100, gas_limit=60_000, to=contract, value=3,
    )
    tx.sign(key)
    l1.produce_block([tx])
    register_sim("ethereum", l1)
    try:
        req = ProofRequest(
            block_number=1, network="ethereum",
            proof_type=ProofType.TPU_STARK,
            prover_args={
                "mpt_statement": False,
                "body_statement": False,
                "chain_statement": False,
            },
        )
        raiko = Raiko(SupportedChainSpecs(), req)
        gi = raiko.generate_input()
        output = raiko.get_output(gi)
        proof = raiko.prove(gi, output)
        payload = json.loads(proof.proof)
        assert "evm" in payload, "covered frame must be proven"
        assert payload["evm"]["covered"] == 1
        assert ts.verify_payload(payload)
        # tampering with the frame's gas claim must be rejected
        bad_frame = dict(payload["evm"]["frames"][0])
        bad_frame["gas_f"] -= 1
        bad = dict(payload, evm=dict(payload["evm"], frames=[bad_frame]))
        assert not ts.verify_payload(bad)
    finally:
        _SIM_REGISTRY.clear()
