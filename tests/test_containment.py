"""Succinct keccak containment system (keccak-mpt-v2): the three-table
multi-table STARK end to end, plus the debug-checker harness."""
import pytest

pytestmark = pytest.mark.slow


import numpy as np
import pytest

from raiko_tpu.fields import babybear as bb
from raiko_tpu.fields import babybear_ext as ef
from raiko_tpu.stark import prover, verifier
from raiko_tpu.stark.airs.containment import (
    ByteCodeAir,
    ContainAir,
    block_code,
    pad_keccak,
)
from raiko_tpu.stark.airs.keccak_air import KeccakSpongeV2Air
from raiko_tpu.stark.debug import check_constraints
from raiko_tpu.utils import keccak256


def _chain_messages(rng):
    """m0 contains keccak(m1); m1 contains keccak(m2)."""
    m2 = bytes(rng.integers(0, 256, 40, dtype=np.uint8))
    m1 = b"\x01\x02" + keccak256(m2) + bytes(rng.integers(0, 256, 30, dtype=np.uint8))
    m0 = bytes(rng.integers(0, 256, 5, dtype=np.uint8)) + keccak256(m1) + b"\xff"
    msgs = [m0, m1, m2]
    claims = [
        (keccak256(m1), 0, m0.index(keccak256(m1))),
        (keccak256(m2), 1, m1.index(keccak256(m2))),
    ]
    mults = {}
    for digest, parent, off in claims:
        for j in range(32):
            mults[(parent, off + j)] = mults.get((parent, off + j), 0) + 1
    return msgs, claims, mults


def _tables(msgs, claims, mults):
    sponge = KeccakSpongeV2Air.from_messages(msgs, bind_root=True)
    bytetab = ByteCodeAir([len(pad_keccak(m)) for m in msgs])
    claimt = ContainAir(len(msgs) - 1)
    return [
        (sponge, sponge.trace(), sponge.publics()),
        (bytetab, bytetab.trace(msgs, mults), []),
        (claimt, claimt.trace(claims), []),
    ]


def test_debug_checker_and_balance():
    rng = np.random.default_rng(9)
    msgs, claims, mults = _chain_messages(rng)
    tables = _tables(msgs, claims, mults)
    chal = [tuple(int(v) for v in rng.integers(1, bb.P, 4)) for _ in range(4)]
    totals = [ef.H_ZERO] * 3
    for air, trace, publics in tables:
        assert check_constraints(air, trace, publics, chal) == []
        for i, v in enumerate(air.bus_values(trace, chal)):
            totals[i] = ef.h_add(totals[i], v)
    assert all(t == ef.H_ZERO for t in totals)


def test_debug_checker_catches_violations():
    rng = np.random.default_rng(10)
    msgs, claims, mults = _chain_messages(rng)
    bytetab = ByteCodeAir([len(pad_keccak(m)) for m in msgs])
    trace = bytetab.trace(msgs, mults)
    trace[3, 0] = (int(trace[3, 0]) + 1) % bb.P  # byte != its bits
    chal = [tuple(int(v) for v in rng.integers(1, bb.P, 4)) for _ in range(4)]
    assert check_constraints(bytetab, trace, [], chal)


def test_containment_prove_verify_roundtrip():
    rng = np.random.default_rng(11)
    msgs, claims, mults = _chain_messages(rng)
    tables = _tables(msgs, claims, mults)
    airs = [t[0] for t in tables]
    proofs = prover.prove_tables(tables)
    assert verifier.verify_tables(airs, proofs)
    # the proof is succinct: no preimage bytes appear anywhere in it
    assert proofs[0].publics == airs[0].publics()  # root digest bits only


def test_containment_wrong_digest_rejected():
    """A claim whose digest bytes are wrong must break the digest-code
    channel balance."""
    rng = np.random.default_rng(12)
    msgs, claims, mults = _chain_messages(rng)
    bad_digest = bytearray(claims[1][0])
    bad_digest[0] ^= 1
    claims[1] = (bytes(bad_digest), claims[1][1], claims[1][2])
    tables = _tables(msgs, claims, mults)
    airs = [t[0] for t in tables]
    proofs = prover.prove_tables(tables)
    assert not verifier.verify_tables(airs, proofs)


def test_mpt_v2_payload_roundtrip():
    """prove_mpt_containment / verify_mpt_v2_payload on a real tiny trie."""
    from raiko_tpu.mpt.trie import MptNode, to_nibs
    from raiko_tpu.provers.tpu_stark import (
        prove_mpt_containment,
        verify_mpt_v2_payload,
    )

    trie = MptNode.null()
    for i in range(6):
        trie.insert(to_nibs(keccak256(bytes([i]))), b"value-%d" % i * 3)
    root = trie.hash()
    payload = prove_mpt_containment(trie, root)
    assert payload["kind"] == "keccak-mpt-v2"
    assert "messages" not in payload and "digests" not in payload
    assert verify_mpt_v2_payload(payload, root)
    # wrong root rejected
    assert not verify_mpt_v2_payload(payload, keccak256(b"x"))
    # structure tamper rejected
    bad = dict(payload)
    bad["block_counts"] = [list(payload["block_counts"][0]) + [1]] + list(
        payload["block_counts"][1:]
    )
    assert not verify_mpt_v2_payload(bad, root)


def test_header_chain_containment():
    """Ancestor-hash-chain statement (provers/tpu_stark.prove_header_chain):
    keccak(h_k) == h_{k-1}.parent_hash links proven by the containment
    system, root digest = the proven block's parent hash
    (reference builder.rs:350-372)."""
    from raiko_tpu.proto.types import BlockHeader
    from raiko_tpu.provers.tpu_stark import (
        prove_header_chain,
        verify_mpt_v2_payload,
    )

    h2 = BlockHeader(number=100, timestamp=1)
    h1 = BlockHeader(number=101, timestamp=2, parent_hash=h2.hash())
    h0 = BlockHeader(number=102, timestamp=3, parent_hash=h1.hash())
    payload = prove_header_chain([h0, h1, h2])
    assert payload["covered"] == 3 and payload["total"] == 3
    assert bytes.fromhex(payload["state_root"]) == h0.hash()
    assert verify_mpt_v2_payload(payload, h0.hash())
    assert not verify_mpt_v2_payload(payload, h1.hash())
    # a broken link stops coverage at the verified prefix, explicitly
    bad_tail = BlockHeader(number=99, timestamp=9)
    payload2 = prove_header_chain([h0, h1, bad_tail])
    assert payload2["covered"] == 2 and payload2["total"] == 3
    assert verify_mpt_v2_payload(payload2, h0.hash())


def test_index_trie_containment():
    """Body-trie statement: the containment system over a tx-style
    index trie (reference builder.rs:191-264 roots)."""
    from raiko_tpu.evm.builder import _index_trie
    from raiko_tpu.provers.tpu_stark import (
        prove_mpt_containment,
        verify_mpt_v2_payload,
    )

    rng = np.random.default_rng(21)
    items = [bytes(rng.integers(0, 256, 90, dtype=np.uint8)) for _ in range(5)]
    trie = _index_trie(items)
    root = trie.hash()
    payload = prove_mpt_containment(trie, root)
    assert payload["covered"] >= 1
    assert verify_mpt_v2_payload(payload, root)
    assert not verify_mpt_v2_payload(payload, keccak256(b"no"))
