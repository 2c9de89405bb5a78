"""RLP, Ethereum types, secp256k1 — golden vectors."""

import pytest

from raiko_tpu.mpt import EMPTY_ROOT
from raiko_tpu.proto import rlp
from raiko_tpu.proto.types import (
    Account,
    BlockHeader,
    Log,
    Receipt,
    Transaction,
    logs_bloom,
)
from raiko_tpu.utils import keccak256, secp256k1


def test_rlp_spec_vectors():
    assert rlp.encode(b"dog") == b"\x83dog"
    assert rlp.encode([b"cat", b"dog"]) == b"\xc8\x83cat\x83dog"
    assert rlp.encode(b"") == b"\x80"
    assert rlp.encode(0) == b"\x80"
    assert rlp.encode(15) == b"\x0f"
    assert rlp.encode(1024) == b"\x82\x04\x00"
    assert rlp.encode([]) == b"\xc0"
    assert rlp.encode([[], [[]], [[], [[]]]]) == bytes.fromhex("c7c0c1c0c3c0c1c0")
    long = b"a" * 56
    assert rlp.encode(long) == b"\xb8\x38" + long
    # roundtrip
    assert rlp.decode(rlp.encode([b"cat", [b"dog", b""]])) == [b"cat", [b"dog", b""]]
    with pytest.raises(rlp.DecodeError):
        rlp.decode(b"\x81\x05")  # non-canonical single byte
    with pytest.raises(rlp.DecodeError):
        rlp.decode(b"\xc8\x83cat")  # truncated


def test_mainnet_genesis_header_hash():
    h = BlockHeader(
        state_root=bytes.fromhex(
            "d7f8974fb5ac78d9ac099b9ad5018bedc2ce0a72dad1827a1709da30580f0544"
        ),
        transactions_root=EMPTY_ROOT,
        receipts_root=EMPTY_ROOT,
        difficulty=0x400000000,
        gas_limit=5000,
        extra_data=bytes.fromhex(
            "11bbe8db4e347b4e8c937c1c8370e4b5ed33adb3db69cbdb7a38e1e50b1b82fa"
        ),
        nonce=bytes.fromhex("0000000000000042"),
    )
    assert (
        h.hash().hex()
        == "d4e56740f876aef8c010b86a40d5f56745a118d0906a34e69aec8c0db1cb8fa3"
    )
    assert BlockHeader.decode(h.encode()).hash() == h.hash()


def test_cancun_header_roundtrip():
    h = BlockHeader(
        number=100,
        base_fee_per_gas=7,
        withdrawals_root=EMPTY_ROOT,
        blob_gas_used=131072,
        excess_blob_gas=0,
        parent_beacon_block_root=b"\x22" * 32,
    )
    d = BlockHeader.decode(h.encode())
    assert d.blob_gas_used == 131072
    assert d.parent_beacon_block_root == b"\x22" * 32
    assert d.hash() == h.hash()


def test_eip155_example_tx():
    tx = Transaction(
        tx_type=0,
        chain_id=1,
        nonce=9,
        gas_price=20 * 10**9,
        gas_limit=21000,
        to=bytes.fromhex("3535353535353535353535353535353535353535"),
        value=10**18,
    )
    assert (
        tx.signing_hash().hex()
        == "daf5a779ae972f972197303d7b574746c7ef83eadac0f2791ad23db92e4c8e53"
    )
    tx.sign(0x4646464646464646464646464646464646464646464646464646464646464646)
    assert tx.v == 37
    sender = tx.recover_sender()
    assert sender.hex() == "9d8a62f656a8d1615c1294fd71e9cfb3e4855a4f"
    assert Transaction.decode(tx.encode()).recover_sender() == sender


@pytest.mark.parametrize("tx_type", [0, 1, 2, 3])
def test_typed_tx_roundtrip(tx_type):
    tx = Transaction(
        tx_type=tx_type,
        chain_id=167,
        nonce=3,
        gas_price=10**9,
        max_priority_fee_per_gas=10**9,
        max_fee_per_gas=2 * 10**9,
        gas_limit=50000,
        to=b"\x11" * 20,
        value=5,
        data=b"\xde\xad\xbe\xef",
        max_fee_per_blob_gas=1,
        blob_versioned_hashes=[b"\x01" + b"\x00" * 31] if tx_type == 3 else [],
    )
    tx.sign(0xBEEF)
    d = Transaction.decode(tx.encode())
    assert d.recover_sender() == tx.recover_sender()
    assert d.hash() == tx.hash()


def test_high_s_rejected():
    tx = Transaction(tx_type=2, chain_id=1, gas_limit=21000, to=b"\x00" * 20)
    tx.sign(0xABC)
    tx.s = secp256k1.N - tx.s  # flip to high-s
    with pytest.raises(ValueError):
        tx.recover_sender()


def test_secp256k1_known_key():
    a1 = secp256k1.pubkey_to_address(secp256k1.pubkey(1))
    assert a1.hex() == "7e5f4552091a69125d5dfcb7b8c2659029395bdf"
    msg = keccak256(b"msg")
    r, s, rec = secp256k1.sign(msg, 12345)
    addr = secp256k1.pubkey_to_address(secp256k1.pubkey(12345))
    assert secp256k1.ecrecover(msg, 27 + rec, r, s) == addr
    assert secp256k1.ecrecover(msg, 29, r, s) is None


def test_bloom_and_receipt():
    lg = Log(address=b"\x42" * 20, topics=[b"\x01" * 32], data=b"xy")
    bloom = logs_bloom([lg])
    assert len(bloom) == 256 and any(bloom)
    rc = Receipt(tx_type=2, status=1, cumulative_gas_used=21000, logs=[lg])
    enc = rc.encode()
    assert enc[0] == 2
    # empty receipt bloom is all zero
    assert not any(Receipt(0, 1, 0, []).bloom())


def test_account_roundtrip():
    acc = Account(nonce=2, balance=10**18, storage_root=EMPTY_ROOT)
    assert Account.decode(acc.encode()) == acc
