"""EVM interpreter + transaction execution + state-root finalize."""

import hashlib

import pytest

from raiko_tpu.evm.bn254 import (
    G1_GEN,
    G2_GEN,
    g1_mul,
    g1_neg,
    g2_mul,
    pairing_check,
)
from raiko_tpu.evm.execute import (
    BlockError,
    apply_withdrawals,
    execute_block_txs,
    execute_transaction,
    finalize_state_root,
)
from raiko_tpu.evm.interpreter import BlockEnv, EVM, TxEnv
from raiko_tpu.evm.precompiles import run as run_precompile
from raiko_tpu.evm.state import AccountInfo, MemDb, StateJournal
from raiko_tpu.mpt import MptNode, to_nibs
from raiko_tpu.proto import rlp
from raiko_tpu.proto.types import Account, Transaction, Withdrawal
from raiko_tpu.utils import keccak256, secp256k1

KEY = 0xA11CE
SENDER = secp256k1.pubkey_to_address(secp256k1.pubkey(KEY))
COINBASE = b"\xcb" * 20

COUNTER_RUNTIME = bytes([0x5F, 0x54, 0x60, 0x01, 0x01, 0x5F, 0x55, 0x00])
COUNTER_INITCODE = (
    bytes([0x67]) + COUNTER_RUNTIME + bytes([0x5F, 0x52, 0x60, 0x08, 0x60, 0x18, 0xF3])
)


def fresh_state(balance=10**18):
    db = MemDb()
    db.insert_account(SENDER, AccountInfo(nonce=0, balance=balance, exists=True))
    return StateJournal(db)


def env(**kw):
    defaults = dict(number=1, timestamp=1000, base_fee=7, chain_id=1, coinbase=COINBASE)
    defaults.update(kw)
    return BlockEnv(**defaults)


def mktx(nonce, to, value=0, data=b"", gas=100000):
    return Transaction(
        tx_type=2,
        chain_id=1,
        nonce=nonce,
        max_priority_fee_per_gas=1,
        max_fee_per_gas=10,
        gas_limit=gas,
        to=to,
        value=value,
        data=data,
    )


def test_transfer_and_fees():
    st = fresh_state()
    r = execute_transaction(st, env(), mktx(0, b"\x99" * 20, value=12345, gas=21000), SENDER)
    assert r.success and r.gas_used == 21000
    assert st.balance(b"\x99" * 20) == 12345
    assert st.balance(COINBASE) == 21000  # priority fee = 1
    assert st.balance(SENDER) == 10**18 - 12345 - 21000 * 8  # base 7 + tip 1


def test_deploy_call_and_storage():
    st = fresh_state()
    b = env()
    r = execute_transaction(st, b, mktx(0, None, data=COUNTER_INITCODE, gas=200000), SENDER)
    assert r.success
    contract = keccak256(rlp.encode([SENDER, 0]))[12:]
    assert st.code(contract) == COUNTER_RUNTIME
    for nonce in (1, 2):
        assert execute_transaction(st, b, mktx(nonce, contract), SENDER).success
    assert st.sload(contract, 0) == 2


def test_precompile_through_call():
    st = fresh_state()
    r = execute_transaction(
        st, env(), mktx(0, bytes(19) + b"\x02", data=b"abc"), SENDER
    )
    assert r.output == hashlib.sha256(b"abc").digest()


def test_invalid_txs_raise():
    st = fresh_state(balance=1000)
    with pytest.raises(BlockError):  # can't afford gas
        execute_transaction(st, env(), mktx(0, b"\x01" * 20, gas=21000), SENDER)
    st2 = fresh_state()
    with pytest.raises(BlockError):  # nonce mismatch
        execute_transaction(st2, env(), mktx(5, b"\x01" * 20, gas=21000), SENDER)
    with pytest.raises(BlockError):  # intrinsic gas
        execute_transaction(st2, env(), mktx(0, b"\x01" * 20, gas=20000), SENDER)
    with pytest.raises(BlockError):  # base fee
        tx = mktx(0, b"\x01" * 20, gas=21000)
        tx.max_fee_per_gas = 3
        execute_transaction(st2, env(), tx, SENDER)


def test_revert_rolls_back():
    st = fresh_state()
    b = env()
    # contract that SSTOREs then REVERTs: 6001 5f 55 5f 5f fd
    runtime = bytes([0x60, 0x01, 0x5F, 0x55, 0x5F, 0x5F, 0xFD])
    initcode = (
        bytes([0x66]) + runtime + bytes([0x5F, 0x52, 0x60, 0x07, 0x60, 0x19, 0xF3])
    )
    r = execute_transaction(st, b, mktx(0, None, data=initcode, gas=200000), SENDER)
    assert r.success
    contract = keccak256(rlp.encode([SENDER, 0]))[12:]
    r2 = execute_transaction(st, b, mktx(1, contract), SENDER)
    assert not r2.success  # reverted
    assert st.sload(contract, 0) == 0  # rolled back
    assert st.nonce(SENDER) == 2  # nonce still consumed


def test_bn254_precompiles():
    # ecadd: G + G == 2G
    g = G1_GEN
    data = (
        g[0].to_bytes(32, "big") + g[1].to_bytes(32, "big")
    ) * 2
    used, out = run_precompile(bytes(19) + b"\x06", data, 10**6)
    two_g = g1_mul(G1_GEN, 2)
    assert out == two_g[0].to_bytes(32, "big") + two_g[1].to_bytes(32, "big")
    # ecpairing: e(P, Q) * e(-P, Q) == 1
    def enc_g2(q):
        (xb, xa), (yb, ya) = q  # encoding is (imag, real) per coord
        return b"".join(v.to_bytes(32, "big") for v in (xa, xb, ya, yb))

    q = G2_GEN
    pdata = (
        g[0].to_bytes(32, "big") + g[1].to_bytes(32, "big") + enc_g2(q)
        + g1_neg(g)[0].to_bytes(32, "big") + g1_neg(g)[1].to_bytes(32, "big") + enc_g2(q)
    )
    used, out = run_precompile(bytes(19) + b"\x08", pdata, 10**7)
    assert out == (1).to_bytes(32, "big")
    # empty input pairing = true
    used, out = run_precompile(bytes(19) + b"\x08", b"", 10**6)
    assert out == (1).to_bytes(32, "big")


def test_modexp_and_blake2f():
    # 3^5 mod 7 = 5
    data = (
        (1).to_bytes(32, "big") + (1).to_bytes(32, "big") + (1).to_bytes(32, "big")
        + b"\x03" + b"\x05" + b"\x07"
    )
    used, out = run_precompile(bytes(19) + b"\x05", data, 10**6)
    assert out == b"\x05"
    # blake2f EIP-152 test vector 5 (rounds=12, "abc" message)
    vec = bytes.fromhex(
        "0000000c48c9bdf267e6096a3ba7ca8485ae67bb2bf894fe72f36e3cf1361d5f3af54fa5"
        "d182e6ad7f520e511f6c3e2b8c68059b6bbd41fbabd9831f79217e1319cde05b"
        "6162630000000000000000000000000000000000000000000000000000000000"
        "0000000000000000000000000000000000000000000000000000000000000000"
        "0000000000000000000000000000000000000000000000000000000000000000"
        "0000000000000000000000000000000000000000000000000000000000000000"
        "0300000000000000" + "0000000000000000" + "01"
    )
    used, out = run_precompile(bytes(19) + b"\x09", vec, 10**6)
    assert (
        out.hex()
        == "ba80a53f981c4d0d6a2797b69f12f6e94c212f14685ac4b74b12bb6fdbffa2d1"
        "7d87c5392aab792dc252d5de4533cc9518d38aa8dbf1925ab92386edd4009923"
    )


def test_block_execution_and_state_root():
    st = fresh_state()
    b = env(gas_limit=30_000_000)
    txs = [
        mktx(0, b"\x99" * 20, value=5, gas=21000),
        mktx(1, None, data=COUNTER_INITCODE, gas=200000),
    ]
    contract = keccak256(rlp.encode([SENDER, 1]))[12:]
    txs.append(mktx(2, contract))
    for tx in txs:
        tx.sign(KEY)
    result = execute_block_txs(st, b, txs)
    assert all(r.status == 1 for r in result.receipts)
    assert result.senders == [SENDER] * 3
    apply_withdrawals(st, [Withdrawal(0, 1, b"\x77" * 20, 3)])
    # finalize into a fresh trie pre-populated with sender
    trie = MptNode.null()
    trie.insert(
        to_nibs(keccak256(SENDER)), Account(nonce=0, balance=10**18).encode()
    )
    root = finalize_state_root(st, trie, {})
    # independently rebuild the expected trie
    expect = MptNode.null()
    for addr in [SENDER, b"\x99" * 20, contract, COINBASE, b"\x77" * 20]:
        a = st.accounts[addr]
        storage = MptNode.null()
        for (ad, slot), val in st.storage.items():
            if ad == addr and val:
                storage.insert(
                    to_nibs(keccak256(slot.to_bytes(32, "big"))), rlp.encode(val)
                )
        expect.insert(
            to_nibs(keccak256(addr)),
            Account(
                nonce=a.nonce,
                balance=a.balance,
                storage_root=storage.hash(),
                code_hash=keccak256(a.code) if a.code else keccak256(b""),
            ).encode(),
        )
    assert root == expect.hash()
    assert st.balance(b"\x77" * 20) == 3 * 10**9


def test_static_call_protection():
    st = fresh_state()
    b = env()
    # contract A: SSTORE(0,1): 6001 5f 55 00
    sstore_rt = bytes([0x60, 0x01, 0x5F, 0x55, 0x00])
    a_addr = b"\xaa" * 20
    st.db.insert_account(a_addr, AccountInfo(code=sstore_rt, exists=True))
    evm = EVM(st, b, TxEnv(origin=SENDER))
    # direct call works
    res = evm.call(SENDER, a_addr, 0, b"", 100000)
    assert res.success
    # static call fails
    res = evm.call(SENDER, a_addr, 0, b"", 100000, is_static=True)
    assert not res.success


def test_selfdestruct_eip6780():
    st = fresh_state()
    b = env()
    # pre-existing contract that SELFDESTRUCTs to caller: 33 ff
    sd = bytes([0x33, 0xFF])
    a_addr = b"\xab" * 20
    st.db.insert_account(a_addr, AccountInfo(code=sd, balance=777, exists=True))
    r = execute_transaction(st, b, mktx(0, a_addr), SENDER)
    assert r.success
    # EIP-6780: not created this tx -> balance moved but code stays
    assert st.balance(a_addr) == 0
    assert st.code(a_addr) == sd


def test_execution_tracer(tmp_path):
    """Per-tx structLog traces (evm/tracer.py) — the reference's optional
    execution-trace dump (README "Execution Trace", SURVEY §5)."""
    import json

    st = fresh_state()
    b = env()
    tx0 = mktx(0, None, data=COUNTER_INITCODE, gas=200000)
    tx0.sign(KEY)
    contract = keccak256(rlp.encode([SENDER, 0]))[12:]
    tx1 = mktx(1, contract)
    tx1.sign(KEY)
    result = execute_block_txs(st, b, [tx0, tx1], trace_dir=str(tmp_path))
    assert result.gas_used > 0
    docs = []
    for i in range(2):
        p = tmp_path / f"{b.number}-{i}.json"
        assert p.exists()
        docs.append(json.loads(p.read_text()))
    create_doc, call_doc = docs
    assert create_doc["txHash"] == "0x" + tx0.hash().hex()
    assert not create_doc["failed"] and not call_doc["failed"]
    ops = [s["op"] for s in call_doc["structLogs"]]
    # the counter runtime: PUSH0 SLOAD PUSH1 ADD PUSH0 SSTORE STOP
    assert ops == ["PUSH0", "SLOAD", "PUSH1", "ADD", "PUSH0", "SSTORE", "STOP"]
    sstore = call_doc["structLogs"][5]
    assert sstore["depth"] == 1 and sstore["stack"][-1] == "0x0"
    # gas decreases monotonically within the frame; costs are filled in
    gases = [s["gas"] for s in call_doc["structLogs"]]
    assert all(a >= c for a, c in zip(gases, gases[1:]))
    assert call_doc["structLogs"][1]["gasCost"] >= 2100  # cold SLOAD
    # tracing off => no files, identical execution
    st2 = fresh_state()
    plain = mktx(0, b"\x99" * 20, gas=21000, value=5)
    plain.sign(KEY)
    r2 = execute_block_txs(st2, env(), [plain])
    assert r2.gas_used == 21000


def test_sstore_original_resets_per_tx():
    """EIP-2200 "original" is the committed value at the START OF EACH
    TX: a second tx writing the same slot must see tx 1's result as its
    original (regression: orig_storage used to persist block-wide)."""
    st = fresh_state()
    contract = b"\xc5" * 20
    # runtime: PUSH1 5 PUSH0 SSTORE STOP  (stores 5 at slot 0)
    st.set_code(contract, bytes([0x60, 0x05, 0x5F, 0x55, 0x00]))
    b = env()
    st.begin_tx()
    r1 = execute_transaction(st, b, mktx(0, contract), SENDER)
    st.begin_tx()
    r2 = execute_transaction(st, b, mktx(1, contract), SENDER)
    assert r1.success and r2.success
    # tx1: cold slot, original 0 -> clean zero write: 20000 + 2100 + 2100?
    # (cold sload is inside SSTORE's cold surcharge); tx2: original is
    # now 5, writing 5 again -> noop: 100 + cold 2100
    assert r1.gas_used - r2.gas_used == 20000 - 100
