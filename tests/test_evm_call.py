"""CALL/CREATE frame composition (docs/EVM_COMPOSITION.md): executor
gas parity with the full interpreter, cross-frame channel balance,
negative soundness probes, and the payload roundtrip."""

import random

import pytest

from conftest import subprocess_isolated

from raiko_tpu.fields import babybear_ext as ef
from raiko_tpu.stark.airs import evm_air as ea
from raiko_tpu.stark.debug import check_constraints

CALLEE_ADDR = 0xBB
# callee: load calldata word 0, add 1, store at mem 0, return 32 bytes
CALLEE = bytes([
    0x60, 0x00, 0x35, 0x60, 0x01, 0x01,
    0x60, 0x00, 0x52, 0x60, 0x20, 0x60, 0x00, 0xF3,
])
# caller: MSTORE(0, 41); CALL callee(args mem[0:32] -> ret mem[32:64]);
# use the result; then CALL the identity precompile; STOP
CALLER = bytes([
    0x60, 41, 0x60, 0x00, 0x52,
    0x60, 0x20, 0x60, 0x20, 0x60, 0x20, 0x60, 0x00, 0x60, 0x00,
    0x60, CALLEE_ADDR, 0x61, 0xFF, 0xFF, 0xF1,
    0x60, 0x20, 0x51, 0x01,
    0x60, 0x20, 0x60, 0x40, 0x60, 0x20, 0x60, 0x00, 0x60, 0x00,
    0x60, 0x04, 0x61, 0xFF, 0xFF, 0xF1,
    0x00,
])
ENV = ea.FrameEnv(address=0xAA, caller=0x99, origin=0x99)
WORLD = {CALLEE_ADDR: {"code": CALLEE}}


@pytest.fixture(scope="module")
def tree():
    root = ea.execute_frame(
        CALLER, ENV, 100_000, world=WORLD, warm_addresses=set()
    )
    ea.flatten_call_tree(root)
    return root


@pytest.fixture(scope="module")
def challenges():
    rng = random.Random(1234)
    return [
        tuple(rng.randrange(1, ea.bb.P) for _ in range(4))
        for _ in range(ea.NUM_CHALLENGES)
    ]


def _all_tables(root):
    from raiko_tpu.stark.airs.evm_call import EvmBalanceAir

    fts = ea.flatten_call_tree(root)
    tables = []
    for ft in fts:
        tables.extend(ea.frame_tables(ft))
        tables.extend(ea._frame_extra_tables(ft))
    groups, events = ea.balance_journal(fts)
    if groups:
        bal = EvmBalanceAir(groups)
        tables.append((bal, bal.trace(events), bal.publics()))
    return tables


def _bus_totals(tables, challenges):
    totals = [ef.H_ZERO] * ea.NUM_BUS
    for air, trace, publics in tables:
        for i, bv in enumerate(air.bus_values(trace, challenges)):
            totals[i] = ef.h_add(totals[i], bv)
    return totals


def test_executor_gas_matches_interpreter(tree):
    """The covered CALL replay reproduces the full interpreter's gas
    accounting exactly (EIP-150 63/64 + EIP-2929 + expansion)."""
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

    st = StateJournal(_NullDb())
    st.set_code((0xAA).to_bytes(20, "big"), CALLER)
    st.set_code(CALLEE_ADDR.to_bytes(20, "big"), CALLEE)
    for i in range(1, 11):
        st.access_account(bytes(19) + bytes([i]))
    evm = EVM(
        st,
        BlockEnv(
            number=0, timestamp=0, gas_limit=30_000_000, base_fee=0,
            coinbase=b"\x00" * 20, chain_id=1,
        ),
        TxEnv(origin=(0x99).to_bytes(20, "big"), gas_price=0),
    )
    res = evm.call(
        (0x99).to_bytes(20, "big"), (0xAA).to_bytes(20, "big"), 0, b"",
        100_000, transfers_value=False,
    )
    assert res.success and res.gas_left == tree.gas_f
    assert len(tree.call_sites) == 2
    assert tree.call_sites[0]["callee"].rds == 32
    assert tree.call_sites[1]["precompile"] == "identity"


def test_tree_constraints_and_bus_balance(tree, challenges):
    """Every table of the composed tree satisfies its constraints and
    all 14 channels balance globally."""
    tables = _all_tables(tree)
    for air, trace, publics in tables:
        errs = check_constraints(air, trace, publics, challenges)
        assert errs == [], (type(air).__name__, errs[:5])
    totals = _bus_totals(tables, challenges)
    assert all(t == ef.H_ZERO for t in totals), [
        i for i, t in enumerate(totals) if t != ef.H_ZERO
    ]


def test_tampered_callee_publics_unbalance_callreq(tree, challenges):
    """A callee claiming a different gas0 / address / caller cannot
    match the caller's CALLREQ tuple."""
    import copy

    child = tree.call_sites[0]["callee"]
    for attr, delta in (("gas0", 1), ("cid", None)):
        bad = copy.deepcopy(child)
        if attr == "gas0":
            bad.gas0 += 1
        else:
            bad.cid = (bad.cid[0], bad.cid[1] + 1)
        tables = (
            ea.frame_tables(tree)
            + ea._frame_extra_tables(tree)
            + ea.frame_tables(bad)
            + ea._frame_extra_tables(bad)
        )
        totals = _bus_totals(tables, challenges)
        assert totals[ea.BUS_CQ] != ef.H_ZERO, attr


def test_tampered_forwarding_witness_caught(tree, challenges):
    """Violating the 63/64 rule (inflating gas_in beyond the cap) breaks
    the CALL-row min gadget."""
    cpu, trace, publics = ea.frame_tables(tree)[0]
    t = trace.copy()
    call_rows = [
        r for r, st in enumerate(tree.steps) if st.name == "call"
    ]
    r = call_rows[0] + 1  # the callret row holds the forwarding scratch
    # inflate gas_in by setting an extra bit
    for bit in range(ea.MAX_GAS_LOG):
        col = ea.SCRATCH0 + ea.RW_GASIN0 + bit
        if t[r, col] == 0:
            t[r, col] = 1
            break
    errs = check_constraints(cpu, t, publics, challenges)
    assert errs, "inflated gas_in must violate the gadget"


def test_tampered_cold_flag_unbalances_addr_journal(tree, challenges):
    """Lying about address warmth (to dodge the 2500 surcharge) cannot
    balance the address-journal channel."""
    cpu, trace, publics = ea.frame_tables(tree)[0]
    t = trace.copy()
    call_rows = [r for r, st in enumerate(tree.steps) if st.name == "call"]
    r = call_rows[0]
    assert t[r, ea.SCOLD] == 1  # first touch of the callee address: cold
    t[r, ea.SCOLD] = 0
    # gas transition now fails (2500 surcharge missing), and even with a
    # compensating gas lie the journal channel cannot balance
    errs = check_constraints(cpu, t, publics, challenges)
    assert errs
    cpu2 = ea.EvmCpuAir(tree.fid)
    cpu2._publics = publics
    bus = cpu2.bus_values(t, challenges)
    extra = ea._frame_extra_tables(tree)
    adr = next(x for x in extra if type(x[0]).__name__ == "EvmAddrAir")
    total = ef.h_add(bus[ea.BUS_AD], adr[0].bus_values(adr[1], challenges)[ea.BUS_AD])
    assert total != ef.H_ZERO


def test_tampered_bridge_words_unbalance_ram(tree, challenges):
    """An args bridge carrying different words (callee calldata != caller
    memory) cannot balance the caller's RAM channel."""
    from raiko_tpu.stark.airs.evm_call import KIND_ARGS, MemSpanBridgeAir

    site = tree.call_sites[0]
    bad_words = list(site["args_words"])
    bad_words[0] ^= 1
    bad = MemSpanBridgeAir(
        tree.fid, 4 * site["clk"] + 1, KIND_ARGS, site["args_offw"],
        bad_words, 0, site["cfid"],
    )
    tables = _all_tables(tree)
    swapped = []
    replaced = False
    for air, trace, publics in tables:
        if (
            not replaced
            and type(air).__name__ == "MemSpanBridgeAir"
            and air.kind == KIND_ARGS
            and air.fid == tree.fid
        ):
            swapped.append((bad, bad.trace(), bad.publics()))
            replaced = True
        else:
            swapped.append((air, trace, publics))
    assert replaced
    totals = _bus_totals(swapped, challenges)
    assert totals[ea.BUS_MEM] != ef.H_ZERO


def test_reverting_callee_covered_effectful_not():
    """Effect-free REVERTing callees ARE covered (round 5): the caller
    pushes success 0 and the callee's CALLRET carries 1 - reverted;
    effectful reverts (storage writes before the REVERT) stay
    uncovered.  retSize > rds also stays uncovered."""
    reverting = bytes([0x60, 0x00, 0x60, 0x00, 0xFD])  # REVERT
    caller = bytes([
        0x60, 0x00, 0x60, 0x00, 0x60, 0x00, 0x60, 0x00, 0x60, 0x00,
        0x60, 0xCC, 0x61, 0xFF, 0xFF, 0xF1, 0x00,
    ])
    root = ea.execute_frame(
        caller, ENV, 100_000,
        world={0xCC: {"code": reverting}}, warm_addresses=set(),
    )
    child = root.call_sites[0]["callee"]
    assert child.reverted == 1 and root.steps[-2].w == 0
    # a REVERT after an SSTORE needs rollback — uncovered (v1)
    effectful = bytes([
        0x60, 0x07, 0x60, 0x01, 0x55, 0x60, 0x00, 0x60, 0x00, 0xFD,
    ])
    with pytest.raises(ea.UncoveredFrame):
        ea.execute_frame(
            caller, ENV, 100_000,
            world={0xCC: {"code": effectful, "storage": {1: 0}}},
            warm_addresses=set(),
        )
    # retSize beyond the callee's returndata
    shorty = bytes([0x00])  # STOP: rds = 0
    caller2 = bytes([
        0x60, 0x20, 0x60, 0x00, 0x60, 0x00, 0x60, 0x00, 0x60, 0x00,
        0x60, 0xCC, 0x61, 0xFF, 0xFF, 0xF1, 0x00,
    ])
    with pytest.raises(ea.UncoveredFrame):
        ea.execute_frame(
            caller2, ENV, 100_000,
            world={0xCC: {"code": shorty}}, warm_addresses=set(),
        )


def test_value_call_covered_with_balances_only():
    """A value-bearing CALL is covered when the balance set captures
    caller + target (the journal originals); without it — uncovered."""
    caller = bytes([
        0x60, 0x00, 0x60, 0x00, 0x60, 0x00, 0x60, 0x00, 0x60, 0x01,
        0x60, 0xBB, 0x61, 0xFF, 0xFF, 0xF1, 0x00,
    ])
    with pytest.raises(ea.UncoveredFrame):
        ea.execute_frame(
            caller, ENV, 100_000, world=WORLD, warm_addresses=set()
        )
    root = ea.execute_frame(
        caller, ENV, 100_000, world=WORLD, warm_addresses=set(),
        balances={0xAA: 10, 0xBB: 1},
    )
    assert root.bal_finals == {0xAA: 9, 0xBB: 2}
    assert [ev[:2] for ev in root.bal_events] == [(4 * 7 + 2, 2), (4 * 7 + 3, 3)]
    # insufficient balance: uncovered, never a forged debit
    with pytest.raises(ea.UncoveredFrame):
        ea.execute_frame(
            caller, ENV, 100_000, world=WORLD, warm_addresses=set(),
            balances={0xAA: 0, 0xBB: 1},
        )


@pytest.mark.slow
@subprocess_isolated
def test_call_tree_prove_verify_roundtrip():
    """The composed tree through the real multi-table prover; payload
    tampering on the callee linkage must be rejected."""
    import copy

    root = ea.execute_frame(
        CALLER, ENV, 100_000, world=WORLD, warm_addresses=set()
    )
    payload = ea.prove_call_tree(root)
    assert payload["kind"] == "evm-call-tree-v1"
    assert len(payload["frames"]) == 2
    assert ea.verify_frame_payload(payload)
    # tampered callee gas0 (the CALLREQ binding)
    bad = copy.deepcopy(payload)
    bad["frames"][1]["gas0"] += 1
    assert not ea.verify_frame_payload(bad)
    # tampered callee calldata (the args data bridge)
    bad = copy.deepcopy(payload)
    cd = bytearray(bytes.fromhex(bad["frames"][1]["calldata"]))
    cd[0] ^= 1
    bad["frames"][1]["calldata"] = bytes(cd).hex()
    assert not ea.verify_frame_payload(bad)
    # tampered returndata (the ret data bridges)
    bad = copy.deepcopy(payload)
    w = int(bad["frames"][1]["returndata_words"][0], 16) ^ 1
    bad["frames"][1]["returndata_words"][0] = hex(w)
    assert not ea.verify_frame_payload(bad)
    # dropping the callee frame entirely (dangling CALLREQ)
    bad = copy.deepcopy(payload)
    bad["frames"] = [bad["frames"][0]]
    bad["starks"] = bad["starks"][:11]
    assert not ea.verify_frame_payload(bad)
    # precompile gas lie
    bad = copy.deepcopy(payload)
    for site in bad["frames"][0]["calls"]:
        if site["precompile"]:
            site["gas_in"] += 1
    assert not ea.verify_frame_payload(bad)


@pytest.mark.slow
@subprocess_isolated
def test_block_call_composition_e2e():
    """A simulated block whose tx calls a contract that CALLs a second
    contract AND the identity precompile: the TPU_STARK payload proves
    the whole tree with evm.covered == total (the VERDICT r3 #1 'done'
    criterion)."""
    import json

    from chainsim import ChainSim
    from raiko_tpu.chain import SupportedChainSpecs
    from raiko_tpu.core.interfaces import ProofRequest, ProofType
    from raiko_tpu.core.orchestrator import Raiko
    from raiko_tpu.core.provider import register_sim, _SIM_REGISTRY
    from raiko_tpu.provers import tpu_stark as ts
    from raiko_tpu.proto.types import Transaction
    from raiko_tpu.utils import secp256k1

    key = 0xCA11
    sender = secp256k1.pubkey_to_address(secp256k1.pubkey(key))
    _SIM_REGISTRY.clear()
    l1 = ChainSim("ethereum")
    l1.fund(sender, 10**20)
    contract_b = b"\xbb" * 20
    contract_a = b"\xaa" * 20
    l1.fund(contract_b, 0, code=CALLEE)
    # caller contract: same body as CALLER but the callee address is the
    # 20-byte deployed address
    caller_code = bytes(
        [
            0x60, 41, 0x60, 0x00, 0x52,
            0x60, 0x20, 0x60, 0x20, 0x60, 0x20, 0x60, 0x00, 0x60, 0x00,
            0x73, *contract_b, 0x61, 0xFF, 0xFF, 0xF1,
            0x60, 0x20, 0x51, 0x01,
            0x60, 0x20, 0x60, 0x40, 0x60, 0x20, 0x60, 0x00, 0x60, 0x00,
            0x60, 0x04, 0x61, 0xFF, 0xFF, 0xF1,
            0x00,
        ]
    )
    l1.fund(contract_a, 0, code=caller_code)
    tx = Transaction(
        tx_type=2, chain_id=1, nonce=0, max_priority_fee_per_gas=1,
        max_fee_per_gas=100, gas_limit=150_000, to=contract_a, value=0,
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
        assert "evm" in payload
        assert payload["evm"]["covered"] == payload["evm"]["total"] == 1
        group = payload["evm"]["frames"][0]
        assert len(group["frames"]) == 2  # caller + callee frames
        assert any(
            s["precompile"] == "identity" for s in group["frames"][0]["calls"]
        )
        assert ts.verify_payload(payload)
    finally:
        _SIM_REGISTRY.clear()


def test_tampered_static_and_codeaddr_unbalance_callreq(challenges):
    """A STATICCALL callee claiming static=0, or a DELEGATECALL callee
    claiming a different code address, cannot match the caller's
    CALLREQ tuple (exps 42-52)."""
    import copy

    SC = bytes([
        0x60, 0x20, 0x60, 0x00, 0x60, 0x00, 0x60, 0x00,
        0x60, 0xBB, 0x61, 0xFF, 0xFF, 0xFA, 0x00,
    ])
    root = ea.execute_frame(SC, ENV, 100_000, world=WORLD, warm_addresses=set())
    ea.flatten_call_tree(root)
    child = root.call_sites[0]["callee"]
    assert child.static == 1
    for attr, val in (("static", 0), ("code_addr", 0xDE)):
        bad = copy.deepcopy(child)
        setattr(bad, attr, val)
        tables = (
            ea.frame_tables(root)
            + ea._frame_extra_tables(root)
            + ea.frame_tables(bad)
            + ea._frame_extra_tables(bad)
        )
        totals = _bus_totals(tables, challenges)
        assert totals[ea.BUS_CQ] != ef.H_ZERO, attr

    DC = bytes([
        0x60, 0x20, 0x60, 0x00, 0x60, 0x00, 0x60, 0x00,
        0x60, 0xBB, 0x61, 0xFF, 0xFF, 0xF4, 0x00,
    ])
    root2 = ea.execute_frame(DC, ENV, 100_000, world=WORLD, warm_addresses=set())
    ea.flatten_call_tree(root2)
    child2 = root2.call_sites[0]["callee"]
    assert child2.env.address == 0xAA and child2.code_addr == 0xBB
    bad2 = copy.deepcopy(child2)
    bad2.code_addr = 0xCC
    tables = (
        ea.frame_tables(root2)
        + ea._frame_extra_tables(root2)
        + ea.frame_tables(bad2)
        + ea._frame_extra_tables(bad2)
    )
    totals = _bus_totals(tables, challenges)
    assert totals[ea.BUS_CQ] != ef.H_ZERO


def test_call_variants_gas_matches_interpreter():
    """STATICCALL / DELEGATECALL / value CALL / reverting callee all
    reproduce the full interpreter's gas accounting exactly (EIP-150 +
    stipend + EIP-2929 + value costs)."""
    from raiko_tpu.evm.interpreter import EVM, BlockEnv, TxEnv
    from raiko_tpu.evm.state import AccountInfo, StateJournal

    sb_child = bytes([0x47, 0x60, 0x00, 0x52, 0x60, 0x20, 0x60, 0x00, 0xF3])
    stor_child = bytes([
        0x60, 0x07, 0x60, 0x01, 0x55, 0x60, 0x01, 0x54,
        0x60, 0x00, 0x52, 0x60, 0x20, 0x60, 0x00, 0xF3,
    ])
    revc = bytes([0x60, 0x55, 0x60, 0x00, 0x52, 0x60, 0x20, 0x60, 0x00, 0xFD])
    code = bytes([
        # STATICCALL 0xBB (adder via calldata 0 -> harmless)
        0x60, 0x20, 0x60, 0x00, 0x60, 0x00, 0x60, 0x00,
        0x60, 0xBB, 0x61, 0xFF, 0xFF, 0xFA, 0x50,
        # DELEGATECALL 0xCB (SSTOREs into OUR storage)
        0x60, 0x20, 0x60, 0x00, 0x60, 0x00, 0x60, 0x00,
        0x60, 0xCB, 0x61, 0xFF, 0xFF, 0xF4, 0x50,
        # value CALL 7 wei into 0xEE (reads SELFBALANCE)
        0x60, 0x20, 0x60, 0x00, 0x60, 0x00, 0x60, 0x00, 0x60, 0x07,
        0x60, 0xEE, 0x61, 0xFF, 0xFF, 0xF1, 0x50,
        # value transfer 3 wei to the EOA 0xDD
        0x60, 0x00, 0x60, 0x00, 0x60, 0x00, 0x60, 0x00, 0x60, 0x03,
        0x60, 0xDD, 0x61, 0xFF, 0xFF, 0xF1, 0x50,
        # CALL the reverting 0xCC (success 0)
        0x60, 0x20, 0x60, 0x00, 0x60, 0x00, 0x60, 0x00, 0x60, 0x00,
        0x60, 0xCC, 0x61, 0xFF, 0xFF, 0xF1, 0x50,
        # BALANCE of 0xDD, then stop
        0x60, 0xDD, 0x31, 0x50, 0x00,
    ])
    codes = {
        0xAA: code, 0xBB: CALLEE, 0xCB: stor_child,
        0xEE: sb_child, 0xCC: revc,
    }
    balances = {0xAA: 1000, 0xEE: 50, 0xDD: 1}

    class _Db:
        def basic(self, a):
            ai = int.from_bytes(a, "big")
            if ai in codes or ai in balances:
                return AccountInfo(
                    nonce=1, balance=balances.get(ai, 0),
                    code=codes.get(ai, b""), exists=True,
                )
            return None

        def storage(self, a, k):
            return 0

        def block_hash(self, n):
            return b"\x00" * 32

        def code_by_hash(self, h):
            return b""

    st = StateJournal(_Db())
    for i in range(1, 11):
        st.access_account(bytes(19) + bytes([i]))
    evm = EVM(
        st,
        BlockEnv(
            number=0, timestamp=0, gas_limit=30_000_000, base_fee=0,
            coinbase=b"\x00" * 20, chain_id=1,
        ),
        TxEnv(origin=(0x99).to_bytes(20, "big"), gas_price=0),
    )
    res = evm.call(
        (0x99).to_bytes(20, "big"), (0xAA).to_bytes(20, "big"), 0, b"",
        300_000, transfers_value=False,
    )
    assert res.success
    world = {
        ai: {"code": c, "storage": {1: 0} if ai == 0xAA else {}}
        for ai, c in codes.items()
    }
    ft = ea.execute_frame(
        code, ENV, 300_000, world=world, warm_addresses=set(),
        storage={1: 0}, balances=dict(balances),
    )
    assert ft.gas_f == res.gas_left
    assert ft.bal_finals[0xDD] == 4 and ft.bal_finals[0xEE] == 57
    kinds = [s for s in ft.call_sites]
    assert kinds[0]["ksta"] == 1 and kinds[1]["kdel"] == 1
    assert kinds[4]["callee"].reverted == 1


def _create_fixture_code():
    """Caller that CREATEs (value 5) then CREATE2s (value 0) a contract
    whose initcode deploys a 10-byte runtime."""
    runtime = bytes([0x60, 5, 0x60, 7, 0x01, 0x50, 0x00]).ljust(32, b"\x00")
    initcode = bytes([0x7F]) + runtime + bytes(
        [0x60, 0x00, 0x52, 0x60, 0x0A, 0x60, 0x00, 0xF3]
    )
    ic_words = (initcode + b"\x00" * 31)[: (len(initcode) + 31) // 32 * 32]
    code = b""
    for j in range(0, len(ic_words), 32):
        code += bytes([0x7F]) + ic_words[j : j + 32] + bytes([0x60, j, 0x52])
    code += bytes([0x60, len(initcode), 0x60, 0x00, 0x60, 0x05, 0xF0, 0x50])
    code += bytes(
        [0x60, 0x09, 0x60, len(initcode), 0x60, 0x00, 0x60, 0x00, 0xF5,
         0x50, 0x00]
    )
    return code, initcode


def test_create_gas_matches_interpreter_and_constraints(challenges):
    """CREATE + CREATE2 (round 5): exact gas parity with the full
    interpreter (32000 + EIP-3860 + hashing + all-but-1/64 + deposit),
    and the composed tree satisfies every constraint with the global
    bus balanced (initcode bridge, CREATE CALLREQ/CALLRET, balance
    journal debit/credit to the NEW address)."""
    from raiko_tpu.evm.interpreter import EVM, BlockEnv, TxEnv
    from raiko_tpu.evm.state import AccountInfo, StateJournal

    code, initcode = _create_fixture_code()

    class _Db:
        def basic(self, a):
            if a == (0xAA).to_bytes(20, "big"):
                return AccountInfo(nonce=1, balance=50, code=code, exists=True)
            return None

        def storage(self, a, k):
            return 0

        def block_hash(self, n):
            return b"\x00" * 32

        def code_by_hash(self, h):
            return b""

    st = StateJournal(_Db())
    for i in range(1, 11):
        st.access_account(bytes(19) + bytes([i]))
    evm = EVM(
        st,
        BlockEnv(number=0, timestamp=0, gas_limit=30_000_000, base_fee=0,
                 coinbase=b"\x00" * 20, chain_id=1),
        TxEnv(origin=(0x99).to_bytes(20, "big"), gas_price=0),
    )
    res = evm.call(
        (0x99).to_bytes(20, "big"), (0xAA).to_bytes(20, "big"), 0, b"",
        400_000, transfers_value=False,
    )
    assert res.success
    root = ea.execute_frame(
        code, ENV, 400_000, world={}, warm_addresses=set(),
        nonces={0xAA: 1}, balances={0xAA: 50},
    )
    assert root.gas_f == res.gas_left
    assert len(root.call_sites) == 2
    s0 = root.call_sites[0]
    assert s0["create"] == 1 and s0["rds"] == 10
    assert root.call_sites[1]["kc2"] == 1
    # the created address got the 5 wei
    assert root.bal_finals[s0["addr"]] == 5
    tables = _all_tables(root)
    for air, trace, publics in tables:
        errs = check_constraints(air, trace, publics, challenges)
        assert errs == [], (type(air).__name__, errs[:5])
    totals = _bus_totals(tables, challenges)
    assert all(t == ef.H_ZERO for t in totals), [
        i for i, t in enumerate(totals) if t != ef.H_ZERO
    ]
    # a child claiming DIFFERENT initcode cannot balance the kind-4
    # bridge + ROM channels
    import copy

    child = s0["callee"]
    bad = copy.deepcopy(child)
    bad.code = bytes([0x00]) + bad.code[1:]
    swapped = (
        ea.frame_tables(root)
        + ea._frame_extra_tables(root)
        + ea.frame_tables(bad)
        + ea._frame_extra_tables(bad)
    )
    totals2 = _bus_totals(swapped, challenges)
    assert any(t != ef.H_ZERO for t in totals2)


ACCT_CODE = bytes([
    0x60, 0xDD, 0x31,                    # BALANCE
    0x60, 0xDD, 0x3B, 0x01,              # EXTCODESIZE; fold
    0x60, 0xDD, 0x3F, 0x01,              # EXTCODEHASH; fold
    0x47, 0x01,                          # SELFBALANCE; fold
    0x60, 0x09, 0x40, 0x01,              # BLOCKHASH(9); fold
    0x61, 0x30, 0x39, 0x40, 0x01,        # BLOCKHASH(12345) -> 0; fold
    0x50, 0x00,
])
ACCT_ENV = ea.FrameEnv(address=0xAA, caller=0x99, origin=0x99, number=10)
ACCT_CTX = {
    (1, 0xDD): 123456, (2, 0xDD): 17, (3, 0xDD): 0xABCDEF,
    (1, 0xAA): 999, (4, 9): 0x1122334455, (4, 0x3039): 0,
}


ACCT_BAL = {0xDD: 123456, 0xAA: 999}


def _acct_tables(ft):
    from raiko_tpu.stark.airs.evm_call import EvmBalanceAir

    tables = ea.frame_tables(ft) + ea._frame_extra_tables(ft)
    groups, events = ea.balance_journal([ft])
    if groups:
        bal = EvmBalanceAir(groups)
        tables.append((bal, bal.trace(events), bal.publics()))
    return tables


def test_account_state_family_constraints(challenges):
    """BALANCE/EXTCODESIZE/EXTCODEHASH/SELFBALANCE/BLOCKHASH satisfy the
    constraints and balance the context + address + balance channels
    (round 5: balance reads run through the journal, not AcctCtx)."""
    ft = ea.execute_frame(
        ACCT_CODE, ACCT_ENV, 100_000, acct_ctx=ACCT_CTX,
        balances=dict(ACCT_BAL),
    )
    assert len(ft.acct_groups) == 4  # codesize/codehash/2x blockhash
    assert ft.addr_groups == [(0xDD, 3, 0)]
    assert [ev[1] for ev in ft.bal_events] == [1, 1]  # two reads
    tables = _acct_tables(ft)
    totals = [ef.H_ZERO] * ea.NUM_BUS
    for air, trace, publics in tables:
        errs = check_constraints(air, trace, publics, challenges)
        assert errs == [], (type(air).__name__, errs[:5])
        for i, bv in enumerate(air.bus_values(trace, challenges)):
            totals[i] = ef.h_add(totals[i], bv)
    assert all(t == ef.H_ZERO for t in totals)


def test_account_state_tampered_value_unbalances(challenges):
    """A context table claiming a different code size cannot balance
    BUS_AC; a journal claiming a different balance original cannot
    balance BUS_BL."""
    from raiko_tpu.stark.airs.evm_call import AcctCtxAir, EvmBalanceAir

    ft = ea.execute_frame(
        ACCT_CODE, ACCT_ENV, 100_000, acct_ctx=ACCT_CTX,
        balances=dict(ACCT_BAL),
    )
    tables = _acct_tables(ft)
    rows = [(k, key, v) for k, key, v, _ in ft.acct_groups]
    counts = [c for *_, c in ft.acct_groups]
    rows[0] = (rows[0][0], rows[0][1], rows[0][2] + 1)  # wrong codesize
    bad = AcctCtxAir(rows, ft.fid)
    swapped = [
        (bad, bad.trace(counts), [ft.fid])
        if type(air).__name__ == "AcctCtxAir"
        else (air, trace, publics)
        for air, trace, publics in tables
    ]
    totals = _bus_totals(swapped, challenges)
    assert totals[ea.BUS_AC] != ef.H_ZERO
    # balance tamper: a different original forces different read values
    groups, events = ea.balance_journal([ft])
    bad_groups = [(a, o + 1, f + 1, c) for a, o, f, c in groups]
    badb = EvmBalanceAir(bad_groups)
    bad_events = [
        [(fid, clk4, kind, v + 1) for fid, clk4, kind, v in evs]
        for evs in events
    ]
    swapped2 = [
        (badb, badb.trace(bad_events), badb.publics())
        if type(air).__name__ == "EvmBalanceAir"
        else (air, trace, publics)
        for air, trace, publics in tables
    ]
    totals2 = _bus_totals(swapped2, challenges)
    assert totals2[ea.BUS_BL] != ef.H_ZERO


def test_account_state_gas_matches_interpreter():
    from raiko_tpu.evm.interpreter import EVM, BlockEnv, TxEnv
    from raiko_tpu.evm.state import AccountInfo, StateJournal

    code = ACCT_CODE

    class _Db:
        def basic(self, a):
            if a == (0xDD).to_bytes(20, "big"):
                return AccountInfo(
                    nonce=0, balance=123456, code=b"\x00" * 17, exists=True
                )
            if a == (0xAA).to_bytes(20, "big"):
                return AccountInfo(nonce=0, balance=999, code=code, exists=True)
            return None

        def storage(self, a, k):
            return 0

        def block_hash(self, n):
            return (0x1122334455).to_bytes(32, "big") if n == 9 else b"\x00" * 32

        def code_by_hash(self, h):
            return b""

    st = StateJournal(_Db())
    for i in range(1, 11):
        st.access_account(bytes(19) + bytes([i]))
    log: dict = {}
    evm = EVM(
        st,
        BlockEnv(
            number=10, timestamp=0, gas_limit=30_000_000, base_fee=0,
            coinbase=b"\x00" * 20, chain_id=1,
        ),
        TxEnv(origin=(0x99).to_bytes(20, "big"), gas_price=0),
        acct_log=log,
    )
    res = evm.call(
        (0x99).to_bytes(20, "big"), (0xAA).to_bytes(20, "big"), 0, b"",
        100_000, transfers_value=False,
    )
    assert res.success
    ft = ea.execute_frame(
        code, ACCT_ENV, 100_000, acct_ctx=dict(log),
        balances=dict(ACCT_BAL),
    )
    assert ft.gas_f == res.gas_left
