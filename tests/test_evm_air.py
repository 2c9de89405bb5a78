"""EVM execution-trace AIRs (stark/airs/evm_air.py): constraint
satisfaction over a program exercising every covered opcode, negative
soundness probes via the debug checker, and the full multi-table
prove/verify roundtrip with payload tampering."""

import numpy as np
import pytest

from conftest import subprocess_isolated

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
        # MUL / DIV / MOD / SIGNEXTEND / BYTE / shifts / CALLDATALOAD
        ("push", 2, 0x0123),
        0x02,                                     # MUL
        ("push", 1, 7),
        ("push", 2, 1234),
        0x04,                                     # DIV (1234 / 7)
        ("push", 32, (1 << 250) + 77),
        0x06,                                     # MOD
        ("push", 1, 0),
        ("push", 2, 999),
        0x06,                                     # MOD by zero -> 0
        0x01,                                     # fold
        ("push", 1, 0),
        ("push", 2, 888),
        0x04,                                     # DIV by zero -> 0
        0x01,                                     # fold
        ("push", 1, 0x80),
        ("push", 1, 0),
        0x0B,                                     # SIGNEXTEND (negative)
        ("push", 1, 40),
        0x0B,                                     # SIGNEXTEND k >= 32
        0x01,                                     # fold
        ("push", 32, (1 << 255) + 99),
        ("push", 1, 3),
        0x1A,                                     # BYTE (index 3)
        ("push", 1, 40),
        0x1A,                                     # BYTE (index 40 -> 0)
        ("push", 1, 200),
        0x1B,                                     # SHL by 200
        ("push", 2, 300),
        0x1C,                                     # SHR by 300 (>=256 -> 0)
        ("push", 32, (1 << 256) - 5),
        ("push", 1, 7),
        0x1D,                                     # SAR (-5 >> 7 -> -1)
        ("push", 1, 13),
        0x1C,                                     # SHR by 13
        ("push", 2, 257),
        0x1D,                                     # SAR by >=256 (sign fill)
        0x02,                                     # MUL
        ("push", 1, 5),
        0x35,                                     # CALLDATALOAD (in bounds)
        ("push", 1, 60),
        0x35,                                     # CALLDATALOAD (tail pad)
        ("push", 2, 1000),
        0x35,                                     # CALLDATALOAD (out of bounds)
        0x01, 0x01, 0x01,                         # fold
        # memory: aligned MSTORE/MLOAD, MSIZE, a fresh (zero) read
        ("push", 1, 0x40),
        0x52,                                     # MSTORE value at 0x40
        0x59,                                     # MSIZE (96)
        ("push", 1, 0x40),
        0x51,                                     # MLOAD it back
        0x01,                                     # fold
        ("push", 2, 0x100),
        0x51,                                     # MLOAD untouched word (0)
        0x01,                                     # fold
        # MSTORE8: read-modify-write of single bytes (unaligned offsets)
        ("push", 1, 0xAB),
        ("push", 1, 0x47),
        0x53,                                     # MSTORE8 at 0x47 (inside word 2)
        ("push", 1, 0xCD),
        ("push", 2, 0x19F),
        0x53,                                     # MSTORE8 at 0x19F (expands)
        ("push", 1, 0x40),
        0x51,                                     # MLOAD word 2: byte visible
        0x01,                                     # fold
        ("push", 1, 0x47),
        0x51,                                     # unaligned MLOAD (k=7)
        0x01,                                     # fold
        ("push", 32, (0xDEADBEEF << 128) + 0x1234),
        ("push", 1, 0x55),
        0x52,                                     # unaligned MSTORE (k=21)
        ("push", 1, 0x55),
        0x51,                                     # unaligned MLOAD reads it back
        0x01,                                     # fold
        ("push", 2, 0x2C3),
        ("push", 2, 0x2C3),
        0x52,                                     # unaligned MSTORE, expands
        0x50,                                     # POP (sp fix: mstore pops 2)
        ("push", 2, 0x29D),
        0x51,                                     # unaligned MLOAD, expands
        0x01,                                     # fold
        # CALLDATACOPY: in-bounds words, a zero-fill word past the
        # calldata end, and an expanding copy
        ("push", 1, 64),                          # size = 2 words
        ("push", 1, 4),                           # offset 4 (unaligned src)
        ("push", 2, 0x120),                       # dest (aligned)
        0x37,                                     # CALLDATACOPY
        ("push", 1, 32),
        ("push", 2, 200),                         # source beyond cds=68
        ("push", 2, 0x160),
        0x37,                                     # CALLDATACOPY (zero word)
        ("push", 1, 7),                           # size 7: byte tail
        ("push", 1, 1),
        ("push", 2, 0x160),
        0x37,                                     # CALLDATACOPY tail splice
        ("push", 2, 0x120),
        0x51,                                     # MLOAD a copied word
        0x01,                                     # fold
        ("push", 1, 64),                          # size = 2 words
        ("push", 1, 3),                           # code offset 3
        ("push", 2, 0x1A0),
        0x39,                                     # CODECOPY
        ("push", 1, 32),
        ("push", 2, 0x7000),                      # beyond code end
        ("push", 2, 0x1E0),
        0x39,                                     # CODECOPY (zero fill)
        ("push", 1, 33),                          # 1 word + 1 tail byte
        ("push", 1, 2),
        ("push", 2, 0x1E0),
        0x39,                                     # CODECOPY tail splice
        ("push", 2, 0x1A0),
        0x51,                                     # MLOAD copied code
        0x01,                                     # fold
        ("push", 1, 0),                           # size 0
        ("push", 1, 0),                           # offset 0 (EIP-211)
        ("push", 1, 0),
        0x3E,                                     # RETURNDATACOPY (empty)
        # KECCAK256: two full words, a slack tail, and the empty hash
        ("push", 1, 64),
        ("push", 1, 0x40),
        0x20,                                     # keccak(mem[0x40:0x80])
        ("push", 1, 33),
        ("push", 1, 0x40),
        0x20,                                     # keccak, slack tail
        0x01,                                     # fold
        ("push", 1, 0),
        ("push", 2, 0x200),
        0x20,                                     # keccak of empty range
        0x01,                                     # fold
        # storage: cold/warm SLOAD + every SSTORE gas case
        ("push", 1, 1),
        0x54,                                     # SLOAD slot 1 (cold, 5)
        ("push", 1, 1),
        0x54,                                     # SLOAD slot 1 (warm)
        0x01,                                     # fold
        ("push", 1, 9),
        ("push", 1, 2),
        0x55,                                     # SSTORE slot 2: 0 -> 9 (clean zero, cold)
        ("push", 1, 9),
        ("push", 1, 2),
        0x55,                                     # SSTORE slot 2: noop (warm)
        ("push", 1, 4),
        ("push", 1, 2),
        0x55,                                     # SSTORE slot 2: dirty write
        ("push", 1, 11),
        ("push", 1, 3),
        0x55,                                     # SSTORE slot 3: 7 -> 11 (clean nonzero, cold)
        ("push", 1, 3),
        0x54,                                     # SLOAD slot 3 (warm, 11)
        0x50,                                     # POP
        # signed division (proven in the arith table over BUS_AR)
        ("push", 1, 20),
        ("push", 32, (1 << 256) - 60),
        0x05,                                     # SDIV: -60 / 20 = -3
        ("push", 1, 7),
        ("push", 32, (1 << 256) - 60),
        0x07,                                     # SMOD: -60 % 7 = -4
        0x02,                                     # fold (MUL)
        ("push", 1, 0),
        ("push", 1, 5),
        0x05,                                     # SDIV by zero -> 0
        0x01,                                     # fold
        ("push", 32, (1 << 256) - 1),
        ("push", 32, 1 << 255),
        0x05,                                     # SDIV overflow: min/-1 = min
        0x01,                                     # fold
        ("push", 1, 0),
        ("push", 1, 9),
        0x07,                                     # SMOD by zero -> 0
        0x01,                                     # fold
        ("push", 2, 0x1234),
        ("push", 1, 3),
        0x0A,                                     # EXP: 3 ** 0x1234
        ("push", 1, 0),
        ("push", 1, 7),
        0x0A,                                     # EXP: 7 ** 0 = 1
        0x02,                                     # fold
        # LOGs: gas + aligned memory-range metering, variable topic pops
        ("push", 1, 0),
        ("push", 1, 0),
        0xA0,                                     # LOG0, empty range
        ("push", 1, 0xAB),                        # topic1
        ("push", 1, 33),                          # size (slack tail)
        ("push", 1, 0x40),                        # offset (written above)
        0xA1,                                     # LOG1
        ("push", 1, 1),
        ("push", 1, 2),
        ("push", 1, 3),
        ("push", 1, 4),                           # topics 4..1
        ("push", 1, 32),
        ("push", 2, 0x300),                       # fresh memory, expands
        0xA4,                                     # LOG4
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
CALLDATA = bytes((7 * i + 3) & 0xFF for i in range(68))
STORAGE = {1: 5, 2: 0, 3: 7}


RET_CODE = asm(
    0x3D,                        # RETURNDATASIZE (no calls -> 0)
    0x50,                        # POP
    ("push", 2, 0xABCD),
    ("push", 1, 0),
    0x52,                        # MSTORE at 0
    ("push", 1, 33),
    ("push", 1, 0),
    0xF3,                        # RETURN mem[0:33]
)


@pytest.fixture(scope="module")
def frame():
    code = full_coverage_program()
    return ea.execute_frame(
        code, ENV, gas=200_000, calldata=CALLDATA, storage=dict(STORAGE)
    )


@pytest.fixture(scope="module")
def ret_frame():
    return ea.execute_frame(RET_CODE, ENV, gas=50_000, calldata=CALLDATA)


@pytest.fixture(scope="module")
def challenges():
    rng = np.random.default_rng(42)
    return [
        tuple(int(v) for v in rng.integers(1, bb.P, 4))
        for _ in range(ea.NUM_CHALLENGES)
    ]


def test_executor_covers_everything(frame, ret_frame):
    names = {st.name for st in frame.steps}
    names |= {st.name for st in ret_frame.steps}
    # the composition + account-state families (round 4) live in their
    # own fixtures (tests/test_evm_call.py); cover them here too so this
    # assertion stays the executor's completeness oracle
    call_code = bytes([
        0x47, 0x50,                                      # SELFBALANCE POP
        0x60, 0xEE, 0x31, 0x50,                          # BALANCE POP
        0x60, 0xEE, 0x3B, 0x50,                          # EXTCODESIZE POP
        0x60, 0xEE, 0x3F, 0x50,                          # EXTCODEHASH POP
        0x60, 0x05, 0x40, 0x50,                          # BLOCKHASH POP
        0x60, 0x00, 0x60, 0x00, 0x60, 0x00, 0x60, 0x00,
        0x60, 0x00, 0x60, 0xEE, 0x61, 0xFF, 0xFF, 0xF1,  # CALL
        0x00,
    ])
    callee = bytes([0x00])
    ft = ea.execute_frame(
        call_code,
        ea.FrameEnv(address=0xA0, caller=0x99, origin=0x99, number=10),
        100_000,
        world={0xEE: {"code": callee}},
        warm_addresses=set(),
        acct_ctx={(2, 0xEE): 1, (3, 0xEE): 2, (4, 5): 0x55},
        balances={0xA0: 3, 0xEE: 1},
    )
    names |= {st.name for st in ft.steps}
    names |= {st.name for st in ft.call_sites[0]["callee"].steps}
    # REVERT (round 5): a dedicated halt shape
    rev = ea.execute_frame(
        bytes([0x60, 0x00, 0x60, 0x00, 0xFD]),
        ea.FrameEnv(address=0xA0, caller=0x99, origin=0x99),
        10_000,
    )
    assert rev.reverted == 1
    names |= {st.name for st in rev.steps}
    # CREATE (round 5): a minimal deployment
    initc = bytes([0x60, 0x00, 0x60, 0x00, 0xF3])  # RETURN(0, 0)
    cre_code = (
        bytes([0x7F]) + initc.ljust(32, b"\x00") + bytes([0x60, 0x00, 0x52])
        + bytes([0x60, len(initc), 0x60, 0x00, 0x60, 0x00, 0xF0, 0x50, 0x00])
    )
    cre = ea.execute_frame(
        cre_code,
        ea.FrameEnv(address=0xA0, caller=0x99, origin=0x99),
        100_000,
        world={},
        warm_addresses=set(),
        nonces={0xA0: 1},
    )
    names |= {st.name for st in cre.steps}
    assert names == set(ea.FLAG_NAMES), set(ea.FLAG_NAMES) - names
    assert len(frame.arith_calls) == 7
    # interpreter cross-check on an arithmetic sub-program: the covered
    # executor and the full EVM interpreter must agree on gas and stack
    from raiko_tpu.evm.interpreter import EVM, BlockEnv, TxEnv
    from raiko_tpu.evm.state import StateJournal

    class _NullDb:
        def basic(self, a):
            return None

        def storage(self, a, k):
            return STORAGE.get(k, 0)

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
        CALLDATA, 200_000, transfers_value=False,
    )
    assert res.success
    assert res.gas_left == frame.gas_f


def test_constraints_and_bus_balance(frame, challenges):
    # CPU/ROM/stack/calldata/RAM + storage + keccak bridge + sponge (+
    # round 4: the log-record table and its data bridges)
    tables = ea.frame_tables(frame)
    assert len(tables) == 11
    tables = tables + ea._frame_extra_tables(frame)
    totals = [ef.H_ZERO] * ea.NUM_BUS
    for air, trace, publics in tables:
        assert check_constraints(air, trace, publics, challenges) == []
        for i, bv in enumerate(air.bus_values(trace, challenges)):
            totals[i] = ef.h_add(totals[i], bv)
    assert all(t == ef.H_ZERO for t in totals)


def test_return_frame_constraints(ret_frame, challenges):
    """A RETURN-halted frame satisfies every table (halting discipline,
    expansion gas on the returned range) and balances the bus."""
    assert ret_frame.steps[-1].name == "return"
    tables = ea.frame_tables(ret_frame) + ea._frame_extra_tables(ret_frame)
    totals = [ef.H_ZERO] * ea.NUM_BUS
    for air, trace, publics in tables:
        assert check_constraints(air, trace, publics, challenges) == []
        for i, bv in enumerate(air.bus_values(trace, challenges)):
            totals[i] = ef.h_add(totals[i], bv)
    assert all(t == ef.H_ZERO for t in totals)
    # absolute gas: RETURNDATASIZE 2, POP 2, PUSH2 3, PUSH1 3,
    # MSTORE 3+3 (one new word), PUSH1 3, PUSH1 3,
    # RETURN 0+3 (grow 1 -> 2 words for the 33-byte range)
    assert ret_frame.gas0 - ret_frame.gas_f == 2 + 2 + 3 + 3 + 6 + 3 + 3 + 3


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
    totals = [ef.H_ZERO] * ea.NUM_BUS
    traces = [tables[0][1], rom_trace] + [t[1] for t in tables[2:]]
    for (air, trace, publics), tr in zip(tables, traces):
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
        ea.execute_frame(bytes([0x60, 0x02, 0x60, 0x03, 0xF1, 0x00]),
                         ea.FrameEnv(), 10_000)  # CALL (composition TBD)
    with pytest.raises(ea.UncoveredFrame):
        ea.execute_frame(bytes([0x50]), ea.FrameEnv(), 10_000)  # underflow
    with pytest.raises(ea.UncoveredFrame):
        ea.execute_frame(bytes([0x60, 0x00, 0x56]), ea.FrameEnv(), 10_000)


def test_tampered_mul_caught(frame, challenges):
    """Flipping a MUL result bit must break the schoolbook carry chain."""
    cpu, trace, publics = ea.frame_tables(frame)[0]
    trace = trace.copy()
    rows = np.where(trace[:, ea.FLAG0 + ea.FLAG_IDX["mul"]] == 1)[0]
    trace[rows[0], ea.C0 + 8] ^= 1
    assert check_constraints(cpu, trace, publics, challenges)


def test_tampered_div_caught(frame, challenges):
    """A wrong DIV quotient breaks the q*b + r = a chain; an inflated
    remainder (r >= b) breaks the borrow chain."""
    cpu, trace, publics = ea.frame_tables(frame)[0]
    rows = np.where(
        (trace[:, ea.FLAG0 + ea.FLAG_IDX["div"]] == 1)
        & (trace[:, ea.TAKEN] == 1)
    )[0]
    t1 = trace.copy()
    t1[rows[0], ea.C0] ^= 1  # quotient off by one
    assert check_constraints(cpu, t1, publics, challenges)
    t2 = trace.copy()
    t2[rows[0], ea.W0 + 200] = 1  # huge remainder
    assert check_constraints(cpu, t2, publics, challenges)


def test_tampered_shift_caught(frame, challenges):
    """Flipping a SHR result bit must break the one-hot stage-2 equation;
    moving the byte one-hot must break the amount binding."""
    cpu, trace, publics = ea.frame_tables(frame)[0]
    rows = np.where(
        (trace[:, ea.FLAG0 + ea.FLAG_IDX["shr"]] == 1) & (trace[:, ea.TAKEN] == 0)
    )[0]
    t1 = trace.copy()
    t1[rows[0], ea.C0 + 2] ^= 1
    assert check_constraints(cpu, t1, publics, challenges)
    t2 = trace.copy()
    q = np.where(t2[rows[0], ea.OHQ0 : ea.OHQ0 + 32] == 1)[0][0]
    t2[rows[0], ea.OHQ0 + q] = 0
    t2[rows[0], ea.OHQ0 + ((q + 1) % 32)] = 1
    assert check_constraints(cpu, t2, publics, challenges)


def test_oob_calldataload_must_push_zero(frame, challenges):
    """An out-of-bounds CALLDATALOAD row claiming a nonzero word fails."""
    cpu, trace, publics = ea.frame_tables(frame)[0]
    rows = np.where(
        (trace[:, ea.FLAG0 + ea.FLAG_IDX["calldataload"]] == 1)
        & (trace[:, ea.CARRY0 + 15] == 0)
    )[0]
    assert len(rows)
    trace = trace.copy()
    trace[rows[0], ea.C0 + 7] = 1
    assert check_constraints(cpu, trace, publics, challenges)


def test_fresh_memory_read_must_be_zero(frame, challenges):
    """A first-access read row in the RAM table claiming a nonzero value
    breaks the fresh-read rule (EVM memory is zero-initialized)."""
    ram, trace, publics = ea.frame_tables(frame)[4]
    rows = np.where(trace[:, ea.MR_FR] == 1)[0]
    assert len(rows)
    t = trace.copy()
    t[rows[0], ea.MR_V0 + 11] = 1
    assert check_constraints(ram, t, publics, challenges)


def test_tampered_mload_value_unbalances_bus(frame, challenges):
    """Changing the word an MLOAD pushes is caught: the pushed C is
    bound to the read word B by the recombination constraint, and the
    read word itself is bound to the RAM table by the memory channel."""
    tables = ea.frame_tables(frame)
    cpu, trace, publics = tables[0]
    rows = np.where(trace[:, ea.FLAG0 + ea.FLAG_IDX["mload"]] == 1)[0]
    # flip the pushed value alone: recombination constraint fails
    t = trace.copy()
    t[rows[0], ea.C0 + 1] ^= 1
    assert check_constraints(cpu, t, publics, challenges)
    # flip the read word AND the pushed value consistently: the row is
    # locally valid but the memory channel no longer balances
    t2 = trace.copy()
    t2[rows[0], ea.B0 + 1] ^= 1
    t2[rows[0], ea.C0 + 1] ^= 1
    totals = [ef.H_ZERO] * ea.NUM_BUS
    traces = [t2] + [tab[1] for tab in tables[1:]]
    for (air, _, _), tr in zip(tables, traces):
        for i, bv in enumerate(air.bus_values(tr, challenges)):
            totals[i] = ef.h_add(totals[i], bv)
    assert totals[3] != ef.H_ZERO


def test_memory_gas_and_msize_match_interpreter(frame):
    """The covered executor's expansion-gas accounting is validated by
    the interpreter gas cross-check in test_executor_covers_everything;
    here spot-check the witness algebra on the trace."""
    steps = [s for s in frame.steps if s.name in ("mload", "mstore")]
    assert steps
    for st in steps:
        m_after = st.m_before + (st.grow and (st.d + 1))
        assert m_after * m_after - st.m_before * st.m_before == (
            512 * st.dq + st.r1 - st.r0
        )


def test_tampered_keccak_digest_unbalances_bus(frame, challenges):
    """Changing the digest word a KECCAK256 pushes breaks the hash-call
    channel between the CPU and the bridge table."""
    tables = ea.frame_tables(frame)
    cpu, trace, publics = tables[0]
    t = trace.copy()
    rows = np.where(t[:, ea.FLAG0 + ea.FLAG_IDX["keccak"]] == 1)[0]
    assert len(rows) == 3
    t[rows[0], ea.C0 + 5] ^= 1
    totals = [ef.H_ZERO] * ea.NUM_BUS
    traces = [t] + [tab[1] for tab in tables[1:]]
    for (air, _, _), tr in zip(tables, traces):
        for i, bv in enumerate(air.bus_values(tr, challenges)):
            totals[i] = ef.h_add(totals[i], bv)
    assert totals[ea.BUS_KCALL] != ef.H_ZERO


def test_tampered_hashed_byte_unbalances_bus(frame, challenges):
    """Changing a hashed byte in the bridge breaks either the RAM channel
    (word code) or the block channel (sponge absorb)."""
    from raiko_tpu.stark.airs import evm_keccak as ek

    tables = ea.frame_tables(frame)
    bridge, btrace, _ = tables[6]
    t = btrace.copy()
    layout_rows = np.where(
        (bridge.fixed_columns(bridge.n)[ek.KF_WORDROW] == 1)
        & (bridge.fixed_columns(bridge.n)[ek.KF_HASH] == 1)
    )[0]
    r = layout_rows[0]
    t[r, ek.KC_BYTE] ^= 1
    t[r, ek.KC_BITS] ^= 1
    totals = [ef.H_ZERO] * ea.NUM_BUS
    traces = [tab[1] for tab in tables]
    traces[6] = t
    for (air, _, _), tr in zip(tables, traces):
        for i, bv in enumerate(air.bus_values(tr, challenges)):
            totals[i] = ef.h_add(totals[i], bv)
    assert any(tot != ef.H_ZERO for tot in totals)


def test_storage_constraints_and_tampering(frame, challenges):
    """The storage journal catches wrong read values, wrong gas-case
    flags, and a lied-about cold flag (bus imbalance vs the fixed col)."""
    from raiko_tpu.stark.airs import evm_storage as es

    tables = ea.frame_tables(frame)
    stor, strace, spublics = tables[5]
    assert isinstance(stor, es.EvmStorageAir)
    assert check_constraints(stor, strace, spublics, challenges) == []
    # wrong warm-read value (repeat row must copy previous value)
    fx = stor.fixed_columns(stor.n)
    rows = np.where((fx[es.SF_SA] == 1) & (strace[:, es.ST_IW] == 0))[0]
    assert len(rows)
    t1 = strace.copy()
    t1[rows[0], es.ST_V0 + 3] ^= 1
    assert check_constraints(stor, t1, spublics, challenges)
    # wrong gas-case flag on a clean zero write (g2 -> g1)
    wrows = np.where(strace[:, es.ST_G2] == 1)[0]
    assert len(wrows)
    t2 = strace.copy()
    t2[wrows[0], es.ST_G2] = 0
    t2[wrows[0], es.ST_G1] = 1
    assert check_constraints(stor, t2, spublics, challenges)
    # CPU lying about cold: channel imbalance against the fixed column
    cpu, ctrace, _ = tables[0]
    ct = ctrace.copy()
    crows = np.where(
        (ct[:, ea.FLAG0 + ea.FLAG_IDX["sload"]] == 1) & (ct[:, ea.SCOLD] == 1)
    )[0]
    assert len(crows)
    ct[crows[0], ea.SCOLD] = 0  # claim warm -> cheaper gas, but...
    totals = [ef.H_ZERO] * ea.NUM_BUS
    traces = [ct] + [tab[1] for tab in tables[1:]]
    for (air, _, _), tr in zip(tables, traces):
        for i, bv in enumerate(air.bus_values(tr, challenges)):
            totals[i] = ef.h_add(totals[i], bv)
    assert totals[ea.BUS_STOR] != ef.H_ZERO


def _tamper(payload, **kw):
    """Deep-copy the call-tree payload and update fields of frame 0."""
    import copy

    out = copy.deepcopy(payload)
    out["frames"][0].update(kw)
    return out


@pytest.mark.slow
def test_storage_roundtrip():
    """SLOAD/SSTORE frame through the real prover; tampering with the
    public originals must be rejected."""
    code = asm(
        ("push", 1, 1), 0x54,          # SLOAD slot 1 -> 5
        ("push", 1, 2), 0x55,          # SSTORE slot 2 <- 5
        ("push", 1, 2), 0x54,          # SLOAD slot 2 -> 5
        0x50,
    )
    ft = ea.execute_frame(
        code, ENV, 80_000, calldata=CALLDATA, storage={1: 5, 2: 0}
    )
    payload = ea.prove_frame_trace(ft)
    assert ea.verify_frame_payload(payload)
    bad_groups = [list(g) for g in payload["frames"][0]["storage"]]
    bad_groups[0][1] = hex(6)  # different original
    assert not ea.verify_frame_payload(_tamper(payload, storage=bad_groups))
    assert not ea.verify_frame_payload(_tamper(payload, storage=[]))


def test_wrong_calldata_word_unbalances_bus(frame, challenges):
    """A calldata table built from different calldata can't balance the
    calldata channel against the CPU's sends."""
    tables = ea.frame_tables(frame)
    other = bytearray(CALLDATA)
    other[5] ^= 0xFF
    bad_cd = ea.EvmCalldataAir(bytes(other))
    totals = [ef.H_ZERO] * ea.NUM_BUS
    for i, (air, trace, publics) in enumerate(tables):
        air_use = bad_cd if i == 3 else air
        for ch, bv in enumerate(air_use.bus_values(trace, challenges)):
            totals[ch] = ef.h_add(totals[ch], bv)
    assert totals[2] != ef.H_ZERO


@pytest.mark.slow
def test_prove_verify_roundtrip():
    """Small frame through the real multi-table prover; payload tampering
    must be rejected."""
    code = asm(
        ("push", 1, 5), ("push", 1, 7), 0x01, 0x80, 0x02,
        ("push", 1, 0), 0x35, ("push", 1, 3), 0x1C,
        0x14, 0x15,
        ("pushlabel", "end"), 0x57, 0x00,
        ("jumpdest", "end"), 0x33, 0x50,
    )
    payload = ea.prove_frame(code, ENV, 50_000, calldata=CALLDATA)
    assert ea.verify_frame_payload(payload)

    rec = payload["frames"][0]
    assert not ea.verify_frame_payload(_tamper(payload, gas_f=rec["gas_f"] - 1))

    other = bytearray(code)
    other[1] ^= 1  # different push immediate
    assert not ea.verify_frame_payload(_tamper(payload, code=bytes(other).hex()))

    bad_env = dict(rec["env"], caller=hex(ENV.caller + 1))
    assert not ea.verify_frame_payload(_tamper(payload, env=bad_env))

    assert not ea.verify_frame_payload(
        _tamper(payload, accesses=rec["accesses"] + 1)
    )

    other_cd = bytearray(CALLDATA)
    other_cd[0] ^= 1  # the loaded word changes -> fixed root mismatch
    assert not ea.verify_frame_payload(
        _tamper(payload, calldata=bytes(other_cd).hex())
    )


@pytest.mark.slow
def test_keccak_roundtrip():
    """Minimal KECCAK256 frame through the real 7-table prover: store one
    word, hash it, verify; digest tampering must be rejected."""
    code = asm(
        ("push", 2, 0xBEEF),
        ("push", 1, 0x00),
        0x52,                       # MSTORE at 0
        ("push", 1, 32),
        ("push", 1, 0x00),
        0x20,                       # KECCAK256(mem[0:32])
        0x50,                       # POP
    )
    payload = ea.prove_frame(code, ENV, 50_000, calldata=CALLDATA)
    assert ea.verify_frame_payload(payload)
    assert not ea.verify_frame_payload(_tamper(payload, keccak_calls=[[0, 31]]))
    assert not ea.verify_frame_payload(_tamper(payload, keccak_calls=[]))


@pytest.mark.slow
@subprocess_isolated
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
        bad_group = _tamper(
            payload["evm"]["frames"][0],
            gas_f=payload["evm"]["frames"][0]["frames"][0]["gas_f"] - 1,
        )
        bad = dict(payload, evm=dict(payload["evm"], frames=[bad_group]))
        assert not ts.verify_payload(bad)
    finally:
        _SIM_REGISTRY.clear()


def test_arith_table_negative_probes(frame, challenges):
    """SDIV/SMOD soundness: the arith table rejects wrong results, wrong
    signs, and wrong abs decompositions; a CPU lying about the pushed
    result unbalances the BUS_AR channel."""
    from raiko_tpu.stark.airs import evm_arith as ar

    tables = ea.frame_tables(frame)
    arith, atrace, apub = next(
        t for t in tables if type(t[0]).__name__ == "ArithAir"
    )
    assert check_constraints(arith, atrace, apub, challenges) == []
    # flip the result-sign condition -> the negate/copy branches disagree
    t1 = atrace.copy()
    row = int(np.where(t1[:, ar.ARF_SDIV] == 1)[0][0])
    t1[row, ar.AR_SDC] ^= 1
    assert check_constraints(arith, t1, apub, challenges)
    # corrupt the abs quotient -> schoolbook identity fails
    t2 = atrace.copy()
    t2[row, ar.AR_Q0] ^= 1
    assert check_constraints(arith, t2, apub, challenges)
    # corrupt |a| (negation chain breaks)
    t3 = atrace.copy()
    t3[row, ar.AR_AA0 + 5] ^= 1
    assert check_constraints(arith, t3, apub, challenges)
    # claim the divisor is zero when it isn't (nonzero gadget)
    t4 = atrace.copy()
    t4[row, ar.AR_TAKEN] ^= 1
    assert check_constraints(arith, t4, apub, challenges)
    # CPU pushing a wrong SDIV result: its own row stays locally valid
    # (C is unconstrained there) but the BUS_AR channel no longer matches
    cpu, ctrace, _ = tables[0]
    crow = int(
        np.where(ctrace[:, ea.FLAG0 + ea.FLAG_IDX["sdiv"]] == 1)[0][0]
    )
    ct = ctrace.copy()
    ct[crow, ea.C0 + 7] ^= 1
    totals = [ef.H_ZERO] * ea.NUM_BUS
    traces = [ct] + [tab[1] for tab in tables[1:]]
    for (air, _, _), tr in zip(tables, traces):
        for i, bv in enumerate(air.bus_values(tr, challenges)):
            totals[i] = ef.h_add(totals[i], bv)
    assert totals[ea.BUS_AR] != ef.H_ZERO


def test_log_negative_probes(frame, challenges):
    """LOGn soundness: wrong stack-pointer delta (topics not popped) and
    wrong gas are caught by the CPU constraints."""
    cpu, ctrace, cpub = next(
        (t for t in [ea.frame_tables(frame)[0]]), None
    )
    rows = np.where(ctrace[:, ea.FLAG0 + ea.FLAG_IDX["log"]] == 1)[0]
    assert len(rows) == 3  # LOG0 + LOG1 + LOG4
    # claim a smaller topic count on the LOG4 row: op byte reconstruction
    # (base + n) breaks against the fetched opcode
    r4 = int(rows[-1])
    t1 = ctrace.copy()
    t1[r4, ea.FAMB0 : ea.FAMB0 + 5] = 0  # fam_n = 1 (LOG0)
    assert check_constraints(cpu, t1, cpub, challenges)
    # keep the opcode consistent but skip popping the topics: sp breaks
    t2 = ctrace.copy()
    t2[r4, ea.OP] = 0xA0
    assert check_constraints(cpu, t2, cpub, challenges)
    # undercharge gas on the LOG1 row (skip the 8*size term): the gas
    # transition fails
    r1 = int(rows[1])
    t3 = ctrace.copy()
    # gas_after is encoded on the NEXT row's register; nudging this row's
    # size bits changes the charged cost
    t3[r1, ea.B0] ^= 1
    assert check_constraints(cpu, t3, cpub, challenges)


def test_exp_negative_probes(frame, challenges):
    """EXP soundness: wrong result, wrong bit selection, a broken
    square-and-multiply chain, and an under-claimed exponent byte length
    are all caught."""
    from raiko_tpu.stark.airs import evm_arith as ar

    tables = ea.frame_tables(frame)
    arith, atrace, apub = next(
        t for t in tables if type(t[0]).__name__ == "ArithAir"
    )
    fx = arith.fixed_columns(arith.n)
    ends = np.where(fx[ar.XF_END] == 1)[0]
    assert len(ends) == 2  # two EXP calls
    # wrong claimed result: the END-row multiply no longer lands on C
    t1 = atrace.copy()
    for r in np.where(fx[ar.XF_ACT] == 1)[0]:
        t1[r, ar.AR_C0 + 3] ^= 1  # flip held C consistently
    assert check_constraints(arith, t1, apub, challenges)
    # wrong selected bit on one row
    t2 = atrace.copy()
    row = int(np.where(fx[ar.XF_START] == 1)[0][0]) + 5
    t2[row, ar.AR_BIT] ^= 1
    assert check_constraints(arith, t2, apub, challenges)
    # corrupt the running accumulator mid-block
    t3 = atrace.copy()
    t3[row, ar.XC_ACC0 + 9] ^= 1
    assert check_constraints(arith, t3, apub, challenges)
    # CPU under-claiming the exponent byte length: nonzero suffix caught
    cpu, ctrace, cpub = tables[0]
    crow = int(np.where(ctrace[:, ea.FLAG0 + ea.FLAG_IDX["exp"]] == 1)[0][0])
    ct = ctrace.copy()
    cur = int(np.where(ct[crow, ea.SCRATCH0 : ea.SCRATCH0 + 33] == 1)[0][0])
    assert cur > 0
    ct[crow, ea.SCRATCH0 + cur] = 0
    ct[crow, ea.SCRATCH0 + cur - 1] = 1  # claim one byte shorter
    assert check_constraints(cpu, ct, cpub, challenges)
    # OVER-claiming (charging extra gas) is now also caught: the byte at
    # L-1 would be zero, violating the minimality inverse
    ct2 = ctrace.copy()
    ct2[crow, ea.SCRATCH0 + cur] = 0
    ct2[crow, ea.SCRATCH0 + cur + 1] = 1  # claim one byte longer
    assert check_constraints(cpu, ct2, cpub, challenges)


def test_mstore8_negative_probes(frame, challenges):
    """MSTORE8 soundness: a wrong spliced byte breaks the splice
    constraint; a lied-about old word unbalances the RAM channel."""
    tables = ea.frame_tables(frame)
    cpu, ctrace, cpub = tables[0]
    rows = np.where(ctrace[:, ea.FLAG0 + ea.FLAG_IDX["mstore8"]] == 1)[0]
    assert len(rows) == 2
    r = int(rows[0])
    # corrupt the written word outside the spliced byte
    t1 = ctrace.copy()
    t1[r, ea.C0 + 3] ^= 1
    assert check_constraints(cpu, t1, cpub, challenges)
    # corrupt the one-hot position (claim a different byte index)
    t2 = ctrace.copy()
    k = int(np.where(t2[r, ea.OHQ0 : ea.OHQ0 + 32] == 1)[0][0])
    t2[r, ea.OHQ0 + k] = 0
    t2[r, ea.OHQ0 + ((k + 1) % 32)] = 1
    assert check_constraints(cpu, t2, cpub, challenges)
    # lie about the read word: CPU row consistent, RAM channel unbalanced
    t3 = ctrace.copy()
    t3[r, ea.W0 + 9] ^= 1
    # keep the splice self-consistent (bit 9 is outside the spliced byte
    # unless k maps there; pick a bit inside W only)
    t3[r, ea.C0 + 9] ^= 1
    totals = [ef.H_ZERO] * ea.NUM_BUS
    traces = [t3] + [tab[1] for tab in tables[1:]]
    for (air, _, _), tr in zip(tables, traces):
        for i, bv in enumerate(air.bus_values(tr, challenges)):
            totals[i] = ef.h_add(totals[i], bv)
    assert totals[ea.BUS_MEM] != ef.H_ZERO


def test_unaligned_mload_negative_probes(frame, challenges):
    """Unaligned MLOAD: wrong recombination, wrong claimed alignment,
    and a lied-about second word are caught."""
    tables = ea.frame_tables(frame)
    cpu, ctrace, cpub = tables[0]
    mrows = np.where(ctrace[:, ea.FLAG0 + ea.FLAG_IDX["mload"]] == 1)[0]
    unal = [
        int(r)
        for r in mrows
        if int(ctrace[r, ea.OHQ0]) == 0  # one-hot not at k = 0
    ]
    assert len(unal) == 3
    r = unal[0]
    # wrong recombined value
    t1 = ctrace.copy()
    t1[r, ea.C0 + 100] ^= 1
    assert check_constraints(cpu, t1, cpub, challenges)
    # claim aligned (k one-hot at 0) while offset bits say otherwise
    t2 = ctrace.copy()
    k = int(np.where(t2[r, ea.OHQ0 : ea.OHQ0 + 32] == 1)[0][0])
    t2[r, ea.OHQ0 + k] = 0
    t2[r, ea.OHQ0] = 1
    assert check_constraints(cpu, t2, cpub, challenges)
    # lie about the second word (keep C consistent): RAM unbalances
    t3 = ctrace.copy()
    t3[r, ea.W0] ^= 1  # bit 0 of W feeds C bits below 8k; adjust C too
    # recompute C from the tampered words to stay locally consistent
    wv = 0
    bv = 0
    for i in range(256):
        wv |= int(t3[r, ea.W0 + i]) << i
        bv |= int(t3[r, ea.B0 + i]) << i
    v = ((bv << (8 * k)) | (wv >> (8 * (32 - k)))) & ((1 << 256) - 1)
    for i in range(256):
        t3[r, ea.C0 + i] = (v >> i) & 1
    assert check_constraints(cpu, t3, cpub, challenges) == []  # row valid
    totals = [ef.H_ZERO] * ea.NUM_BUS
    traces = [t3] + [tab[1] for tab in tables[1:]]
    for (air, _, _), tr in zip(tables, traces):
        for i, bv_ in enumerate(air.bus_values(tr, challenges)):
            totals[i] = ef.h_add(totals[i], bv_)
    assert totals[ea.BUS_MEM] != ef.H_ZERO


def test_unaligned_mstore_negative_probes(frame, challenges):
    """Unaligned MSTORE: the spliced write values are channel
    EXPRESSIONS — lying about an old word shifts the written words and
    unbalances the RAM channel; a false alignment claim breaks the
    one-hot binding."""
    tables = ea.frame_tables(frame)
    cpu, ctrace, cpub = tables[0]
    srows = np.where(ctrace[:, ea.FLAG0 + ea.FLAG_IDX["mstore"]] == 1)[0]
    unal = [r for r in srows if int(ctrace[r, ea.OHQ0]) == 0]
    assert len(unal) == 2
    r = int(unal[0])
    # false alignment claim
    t1 = ctrace.copy()
    k = int(np.where(t1[r, ea.OHQ0 : ea.OHQ0 + 32] == 1)[0][0])
    t1[r, ea.OHQ0 + k] = 0
    t1[r, ea.OHQ0] = 1
    assert check_constraints(cpu, t1, cpub, challenges)
    # lie about old word 1 (C): row stays locally valid (C is only a
    # channel operand) but both the read and the spliced write move ->
    # RAM channel imbalance
    t2 = ctrace.copy()
    t2[r, ea.C0 + 255] ^= 1  # a kept top byte of word 1
    totals = [ef.H_ZERO] * ea.NUM_BUS
    traces = [t2] + [tab[1] for tab in tables[1:]]
    for (air, _, _), tr in zip(tables, traces):
        for i, bv in enumerate(air.bus_values(tr, challenges)):
            totals[i] = ef.h_add(totals[i], bv)
    assert totals[ea.BUS_MEM] != ef.H_ZERO


def test_calldatacopy_negative_probes(frame, challenges):
    """CALLDATACOPY: a wrong copied word is caught (in-bounds words
    through the calldata channel, zero-fill words by constraint), and a
    dropped RAM write unbalances the memory channel."""
    from raiko_tpu.stark.airs import evm_copy as ec

    tables = ea.frame_tables(frame)
    cp, ctrace, cpub = next(
        t for t in tables if type(t[0]).__name__ == "EvmCopyAir"
    )
    assert check_constraints(cp, ctrace, cpub, challenges) == []
    fx = cp.fixed_columns(cp.n)
    inb = np.where((fx[ec.CPF_INB] == 1) & (fx[ec.CPF_ACTIVE] == 1))[0]
    oob = np.where((fx[ec.CPF_INB] == 0) & (fx[ec.CPF_ACTIVE] == 1))[0]
    assert len(inb) and len(oob)
    # a zero-fill word claiming data
    t1 = ctrace.copy()
    t1[int(oob[0]), ec.CP_W0 + 5] = 1
    assert check_constraints(cp, t1, cpub, challenges)
    # an in-bounds word with a flipped bit: row locally fine, but the
    # calldata channel (vs the committed calldata table) unbalances
    t2 = ctrace.copy()
    t2[int(inb[0]), ec.CP_W0 + 77] ^= 1
    totals = [ef.H_ZERO] * ea.NUM_BUS
    traces = [
        t2 if tab[0] is cp else tab[1] for tab in tables
    ]
    for (air, _, _), tr in zip(tables, traces):
        for i, bv in enumerate(air.bus_values(tr, challenges)):
            totals[i] = ef.h_add(totals[i], bv)
    assert totals[ea.BUS_CD] != ef.H_ZERO or totals[ea.BUS_MEM] != ef.H_ZERO
    # CPU claiming a different copy size: the call-tuple channel breaks
    cpu, cputrace, cpupub = tables[0]
    crow = int(
        np.where(cputrace[:, ea.FLAG0 + ea.FLAG_IDX["calldatacopy"]] == 1)[0][0]
    )
    t3 = cputrace.copy()
    t3[crow, ea.KSW0] ^= 1
    totals = [ef.H_ZERO] * ea.NUM_BUS
    traces = [t3] + [tab[1] for tab in tables[1:]]
    for (air, _, _), tr in zip(tables, traces):
        for i, bv in enumerate(air.bus_values(tr, challenges)):
            totals[i] = ef.h_add(totals[i], bv)
    assert totals[ea.BUS_CP] != ef.H_ZERO


def test_codecopy_negative_probes(frame, challenges):
    """CODECOPY: the source words are FIXED columns from the public
    bytecode — a CPU lying about the call parameters unbalances the
    call-tuple channel; kind separation keeps a CODECOPY tuple from
    satisfying a CALLDATACOPY bridge."""
    from raiko_tpu.stark.airs import evm_copy as ec

    tables = ea.frame_tables(frame)
    cc, cctrace, ccpub = next(
        t for t in tables if type(t[0]).__name__ == "CodeCopyAir"
    )
    assert check_constraints(cc, cctrace, ccpub, challenges) == []
    # bridge claiming a different clk: call receive unbalances
    t1 = cctrace.copy()
    rows = np.where(cc.fixed_columns(cc.n)[ec.CCF_ACTIVE] == 1)[0]
    t1[rows[0], ec.CC_CLK] += 1
    # clk-held constraint breaks within the block OR the channel flips
    viol = check_constraints(cc, t1, ccpub, challenges)
    if not viol:
        totals = [ef.H_ZERO] * ea.NUM_BUS
        traces = [t1 if tab[0] is cc else tab[1] for tab in tables]
        for (air, _, _), tr in zip(tables, traces):
            for i, bv in enumerate(air.bus_values(tr, challenges)):
                totals[i] = ef.h_add(totals[i], bv)
        viol = totals[ea.BUS_CP] != ef.H_ZERO
    assert viol
    # CPU claiming a CODECOPY was a CALLDATACOPY (flip the flag pair):
    # the kind term in the tuple breaks the channel
    cpu, cputrace, cpupub = tables[0]
    crow = int(
        np.where(cputrace[:, ea.FLAG0 + ea.FLAG_IDX["codecopy"]] == 1)[0][0]
    )
    t2 = cputrace.copy()
    t2[crow, ea.FLAG0 + ea.FLAG_IDX["codecopy"]] = 0
    t2[crow, ea.FLAG0 + ea.FLAG_IDX["calldatacopy"]] = 1
    # opcode reconstruction breaks immediately (0x39 != 0x37)
    assert check_constraints(cpu, t2, cpupub, challenges)


def test_copy_tail_negative_probes(frame, challenges):
    """Byte-tail copies: lying about the old word's kept bytes or the
    spliced write breaks the RAM channel; a wrong slack claim breaks the
    call tuple."""
    from raiko_tpu.stark.airs import evm_copy as ec

    tables = ea.frame_tables(frame)
    cp, ctrace, cpub = next(
        t for t in tables if type(t[0]).__name__ == "EvmCopyAir"
    )
    fx = cp.fixed_columns(cp.n)
    tails = np.where(fx[ec.CPF_TAIL] == 1)[0]
    assert len(tails) == 1
    r = int(tails[0])
    assert check_constraints(cp, ctrace, cpub, challenges) == []
    # flip a KEPT old byte: both the old-read and the spliced write move
    t1 = ctrace.copy()
    t1[r, ec.CP_OLD0 + 3] ^= 1
    totals = [ef.H_ZERO] * ea.NUM_BUS
    traces = [t1 if tab[0] is cp else tab[1] for tab in tables]
    for (air, _, _), tr in zip(tables, traces):
        for i, bv in enumerate(air.bus_values(tr, challenges)):
            totals[i] = ef.h_add(totals[i], bv)
    assert totals[ea.BUS_MEM] != ef.H_ZERO
    # an OLD word on a non-tail row must be zero
    nont = int(np.where((fx[ec.CPF_TAIL] == 0) & (fx[ec.CPF_ACTIVE] == 1))[0][0])
    t2 = ctrace.copy()
    t2[nont, ec.CP_OLD0] = 1
    assert check_constraints(cp, t2, cpub, challenges)
