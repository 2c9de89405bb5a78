"""ProtocolInstance / ABI / tx-list codec — reference golden vectors
(lib/src/protocol_instance.rs:212-304, lib/src/utils.rs)."""

import random

import pytest

from raiko_tpu.proto import abi
from raiko_tpu.proto.instance import (
    BLOCK_METADATA_SPEC,
    TRANSITION_SPEC,
    BlockMetadata,
    ProtocolInstance,
    Transition,
    get_blob_proof_type,
    PROOF_OF_COMMITMENT,
    PROOF_OF_EQUIVALENCE,
)
from raiko_tpu.utils import keccak256
from raiko_tpu.utils.txlist import (
    decode_blob_data,
    decode_transactions,
    encode_blob_data,
    encode_transactions,
    MAX_BLOB_DATA_SIZE,
)


def test_calc_eip712_pi_hash_golden():
    """Reference test_calc_eip712_pi_hash (protocol_instance.rs:236-268)."""
    pi = ProtocolInstance(
        transition=Transition(
            parent_hash=bytes.fromhex(
                "07828133348460fab349c7e0e9fd8e08555cba34b34f215ffc846bfbce0e8f52"
            ),
            block_hash=bytes.fromhex(
                "e2105909de032b913abfa4c8b6101f9863d82be109ef32890b771ae214784efa"
            ),
            state_root=bytes.fromhex(
                "abbd12b3bcb836b024c413bb8c9f58f5bb626d6d835f5554a8240933e40b2d3b"
            ),
            graffiti=bytes(32),
        ),
        block_metadata=BlockMetadata(),
        prover=bytes.fromhex("70997970c51812dc3a010c7d01b50e0d17dc79c8"),
        sgx_instance=bytes.fromhex("741e45d08c70c1c232802711bbfe1b7c0e1acc55"),
        chain_id=167001,
        verifier_address=bytes.fromhex("4f3f0d5b22338f1f991a1a9686c7171389c97ff7"),
    )
    pi.meta_hash = lambda: bytes.fromhex(
        "9608088f69e586867154a693565b4f3234f26f82d44ef43fb99fd774e7266024"
    )
    assert (
        pi.instance_hash().hex()
        == "dc1696a5289616fa5eaa9b6ce97d53765b79db948caedb6887f21a26e4c29511"
    )


def test_eip712_pi_hash_from_calldata_golden():
    """Reference test_eip712_pi_hash: ABI-decode a real proveBlock calldata
    blob and recompute the pi hash (protocol_instance.rs:272-303)."""
    calldata = bytes.fromhex(
        "10d008bd000000000000000000000000000000000000000000000000000000000000004900000000000000000000000000000000000000000000000000000000000000400000000000000000000000000000000000000000000000000000000000000340689c98d83627e8749504eb6effbc2b08408183f11211bbf8bd281727b16255e6b3f8ee61d80cd7d30cdde9aa49acac0b82264a6b0f992139398e95636e501fd80189249f72753bd6c715511cc61facdec4781d4ecb1d028dafdff4a0827d7d53302e31382e302d64657600000000000000000000000000000000000000000000569e75fc77c1a856f6daaf9e69d8a9566ca34aa47f9133711ce065a571af0cfd00000000000000000000000016700100000000000000000000000000000100010000000000000000000000000000000000000000000000000000000000000049000000000000000000000000000000000000000000000000000000000e4e1c000000000000000000000000000000000000000000000000000000000065f94010000000000000000000000000000000000000000000000000000000000000036000000000000000000000000000000000000000000000000000000000000000640000000000000000000000000000000000000000000000000000000000000001fdbdc45da60168ddf29b246eb9e0a2e612a670f671c6d3aafdfdac21f86b4bca0000000000000000000000003c44cdddb6a900fa2b585dd299e03d12fa4293bcaf73b06ee94a454236314610c55e053df3af4402081df52c9ff2692349a6b497bc17a6706bc1cf4c363e800d2133d0d143363871d9c17b8fc5cf6d3cfd585bc80730a40cf8d8186241d45e19785c117956de919999d50e473aaa794b8fd4097000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000260000000000000000000000000000000000000000000000000000000000000006400000000000000000000000000000000000000000000000000000000000000400000000000000000000000000000000000000000000000000000000000000064ffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffff00000000000000000000000000000000000000000000000000000000"
    )
    block_id, inner = abi.decode(["uint64", "bytes"], calldata[4:])
    assert block_id == 73
    tier_proof_spec = ("tuple", ["uint16", "bytes"])
    meta_v, trans_v, _ = abi.decode(
        [BLOCK_METADATA_SPEC, TRANSITION_SPEC, tier_proof_spec], inner
    )
    meta = BlockMetadata(*meta_v)
    a = bytes.fromhex("4f3f0d5b22338f1f991a1a9686c7171389c97ff7")
    pi = ProtocolInstance(
        transition=Transition(*trans_v),
        block_metadata=meta,
        prover=a,
        sgx_instance=a,
        chain_id=10086,
        verifier_address=a,
    )
    assert (
        pi.instance_hash().hex()
        == "8b0e2833f7bae47f6886e5f172d90b12e330485bfe366d8ed4d53b2114d47e68"
    )


def test_abi_roundtrip():
    specs = [
        "uint64",
        "address",
        "string",
        "bytes",
        ("tuple", ["uint256", "bool", "bytes32"]),
        ("array", "uint32"),
    ]
    vals = [
        42,
        b"\x11" * 20,
        "hello world",
        b"\xde\xad",
        [123, True, b"\x22" * 32],
        [1, 2, 3],
    ]
    enc = abi.encode(specs, vals)
    assert len(enc) % 32 == 0
    dec = abi.decode(specs, enc)
    assert dec[0] == 42 and dec[1] == b"\x11" * 20 and dec[2] == "hello world"
    assert dec[3] == b"\xde\xad" and dec[4] == [123, True, b"\x22" * 32]
    assert dec[5] == [1, 2, 3]


def test_blob_codec_roundtrip():
    rng = random.Random(1)
    for size in [0, 1, 27, 123, 124, 5000, MAX_BLOB_DATA_SIZE]:
        data = rng.randbytes(size)
        blob = encode_blob_data(data)
        assert len(blob) == 131072
        assert all(blob[32 * i] & 0xC0 == 0 for i in range(4096))
        assert decode_blob_data(blob) == data
    # wrong version byte rejected
    bad = bytearray(encode_blob_data(b"hi"))
    bad[1] = 1
    assert decode_blob_data(bytes(bad)) == b""
    # trailing garbage rejected
    bad = bytearray(encode_blob_data(b"hi"))
    bad[-1] = 7
    assert decode_blob_data(bytes(bad)) == b""


def test_tx_list_roundtrip():
    from raiko_tpu.proto.types import Transaction

    txs = []
    for i, t in enumerate([0, 2]):
        tx = Transaction(
            tx_type=t,
            chain_id=167009,
            nonce=i,
            gas_price=10,
            max_fee_per_gas=10,
            gas_limit=21000,
            to=b"\x05" * 20,
        )
        tx.sign(0xDAD)
        txs.append(tx)
    enc = encode_transactions(txs)
    dec = decode_transactions(enc)
    assert [t.hash() for t in dec] == [t.hash() for t in txs]
    assert decode_transactions(b"\x01\x02garbage") == []


def test_blob_proof_type_policy():
    assert get_blob_proof_type("SGX", PROOF_OF_EQUIVALENCE) == PROOF_OF_COMMITMENT
    assert get_blob_proof_type("RISC0", PROOF_OF_COMMITMENT) == PROOF_OF_EQUIVALENCE
    assert get_blob_proof_type("None", PROOF_OF_COMMITMENT) == PROOF_OF_COMMITMENT
