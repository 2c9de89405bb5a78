"""Pre-state binding of EVM storage originals (provers/prestate.py):
path collection, host walking, cross-frame chaining, and tamper
rejection.  The fast tests stub the keccak STARK (its own soundness is
covered by test_keccak_air/test_tpu_stark); the slow test runs it."""

import pytest

from raiko_tpu.mpt import EMPTY_ROOT
from raiko_tpu.mpt.trie import MptNode, to_nibs
from raiko_tpu.proto import rlp
from raiko_tpu.proto.types import Account, BlockHeader
from raiko_tpu.provers import prestate
from raiko_tpu.utils import keccak256

ADDR = b"\xaa" * 20
ADDR2 = b"\xbb" * 20


def _mk_world(slots: dict[int, int]):
    """parent state trie with one contract account holding `slots`."""
    st = MptNode.null()
    for slot, val in slots.items():
        if val:
            st.insert(
                to_nibs(keccak256(slot.to_bytes(32, "big"))),
                rlp.encode(val),
            )
    state = MptNode.null()
    acct = Account(nonce=1, balance=100, storage_root=st.hash())
    state.insert(to_nibs(keccak256(ADDR)), acct.encode())
    # a second, unrelated account so paths have branches
    state.insert(
        to_nibs(keccak256(ADDR2)), Account(balance=5, storage_root=EMPTY_ROOT).encode()
    )
    header = BlockHeader(state_root=state.hash(), number=7)
    return state, {ADDR: st}, header


def _mk_collect(state, storage, header, frames):
    return {
        "parent_state_trie": state,
        "parent_storage": storage,
        "parent_header": header,
        "frames": frames,
    }


def _stub_keccak(monkeypatch):
    """Replace the batch-keccak STARK with a structural stub (host keccak
    only) for the fast binding-logic tests."""
    from raiko_tpu.provers import tpu_stark

    def fake_prove(msgs, root):
        assert keccak256(msgs[0]) == root
        return {
            "kind": "keccak-mpt-v1",
            "state_root": root.hex(),
            "messages": [m.hex() for m in msgs],
            "stubbed": True,
        }

    def fake_verify(kec, root=None):
        if kec.get("kind") != "keccak-mpt-v1" or not kec.get("stubbed"):
            return False
        msgs = [bytes.fromhex(m) for m in kec["messages"]]
        if root is not None and keccak256(msgs[0]) != root:
            return False
        blob = b""
        for m in msgs:
            if blob and keccak256(m) not in blob:
                return False
            blob += m
        return True

    monkeypatch.setattr(tpu_stark, "prove_keccak_batch_public", fake_prove)
    monkeypatch.setattr(tpu_stark, "verify_mpt_payload", fake_verify)


def _payload(ps, header, frames_storage):
    """payload skeleton: chain slot anchored at the parent header +
    fake evm frames with the given storage groups."""
    return {
        "chain": {"state_root": keccak256(header.encode()).hex()},
        "evm": {
            # evm["frames"] entries are call-tree GROUPS (round 4): each
            # fake frame rides in its own single-frame group
            "frames": [
                {
                    "frames": [
                        {
                            "env": {"address": "0x" + ADDR.hex()},
                            "storage": groups,
                        }
                    ]
                }
                for groups in frames_storage
            ]
        },
        "prestate": ps,
    }


def test_binding_roundtrip_and_chaining(monkeypatch):
    _stub_keccak(monkeypatch)
    state, storage, header = _mk_world({1: 5, 2: 0})
    frames = [
        {"address": int.from_bytes(ADDR, "big"), "storage": {1: 5, 2: 0}},
        {"address": int.from_bytes(ADDR, "big"), "storage": {1: 9}},
    ]
    ps = prestate.prove_prestate(_mk_collect(state, storage, header, frames))
    assert ps is not None and ps["kind"] == "prestate-v1"
    # frame 0: originals = pre-state (5, 0), finals (9, 3)
    # frame 1: original chains from frame 0's final (9)
    good = _payload(
        ps,
        header,
        [
            [[hex(1), hex(5), 2, 0, hex(9)], [hex(2), hex(0), 1, 0, hex(3)]],
            [[hex(1), hex(9), 1, 0, hex(4)]],
        ],
    )
    assert prestate.verify_prestate_binding(good)

    # wrong first original (not the pre-state value)
    bad = _payload(
        ps,
        header,
        [[[hex(1), hex(6), 2, 0, hex(9)]]],
    )
    assert not prestate.verify_prestate_binding(bad)

    # broken chain: frame 1's original != frame 0's final
    bad = _payload(
        ps,
        header,
        [
            [[hex(1), hex(5), 2, 0, hex(9)]],
            [[hex(1), hex(8), 1, 0, hex(4)]],
        ],
    )
    assert not prestate.verify_prestate_binding(bad)

    # absent slot must bind to zero
    bad = _payload(ps, header, [[[hex(2), hex(7), 1, 0, hex(7)]]])
    assert not prestate.verify_prestate_binding(bad)


def test_binding_rejects_tampered_anchor(monkeypatch):
    _stub_keccak(monkeypatch)
    state, storage, header = _mk_world({1: 5})
    frames = [{"address": int.from_bytes(ADDR, "big"), "storage": {1: 5}}]
    ps = prestate.prove_prestate(_mk_collect(state, storage, header, frames))
    groups = [[[hex(1), hex(5), 1, 0, hex(5)]]]

    # parent header not matching the chain statement's root digest
    other = BlockHeader(state_root=state.hash(), number=8)
    bad = _payload(ps, header, groups)
    bad["chain"] = {"state_root": keccak256(other.encode()).hex()}
    assert not prestate.verify_prestate_binding(bad)

    # header swapped for one with a different state root: path anchoring
    # fails against its state_root
    world2 = _mk_world({1: 6})
    bad = _payload(dict(ps, parent_header=world2[2].encode().hex()), header, groups)
    bad["chain"] = {"state_root": keccak256(world2[2].encode()).hex()}
    assert not prestate.verify_prestate_binding(bad)

    # path node dropped from the proven message set
    import copy

    bad_ps = copy.deepcopy(ps)
    bad_ps["keccak"]["messages"] = bad_ps["keccak"]["messages"][:1]
    assert not prestate.verify_prestate_binding(_payload(bad_ps, header, groups))

    # missing prestate slot while frames claim storage
    bad = _payload(None, header, groups)
    bad.pop("prestate")
    bad["prestate"] = None
    assert not prestate.verify_prestate_binding(bad)


def test_no_storage_frames_need_no_prestate(monkeypatch):
    _stub_keccak(monkeypatch)
    payload = {
        "chain": {"state_root": "00" * 32},
        "evm": {
            "frames": [
                {"frames": [{"env": {"address": "0x0"}, "storage": []}]}
            ]
        },
    }
    assert prestate.verify_prestate_binding(payload)


def test_absent_account_binds_zero(monkeypatch):
    """A frame at an address missing from the pre-state: exclusion path,
    originals must be zero."""
    _stub_keccak(monkeypatch)
    state, storage, header = _mk_world({1: 5})
    missing = b"\xcc" * 20
    frames = [{"address": int.from_bytes(missing, "big"), "storage": {3: 0}}]
    ps = prestate.prove_prestate(_mk_collect(state, storage, header, frames))
    payload = {
        "chain": {"state_root": keccak256(header.encode()).hex()},
        "evm": {
            "frames": [
                {
                    "frames": [
                        {
                            "env": {"address": "0x" + missing.hex()},
                            "storage": [[hex(3), hex(0), 1, 0, hex(2)]],
                        }
                    ]
                }
            ]
        },
        "prestate": ps,
    }
    assert prestate.verify_prestate_binding(payload)
    payload["evm"]["frames"][0]["frames"][0]["storage"] = [
        [hex(3), hex(4), 1, 0, hex(2)]
    ]
    assert not prestate.verify_prestate_binding(payload)


def test_code_and_account_record_binding(monkeypatch):
    """Round 5 (ADVICE r4 medium): frame code and EXTCODESIZE /
    EXTCODEHASH records bind to the parent accounts' code hashes."""
    _stub_keccak(monkeypatch)
    code = bytes.fromhex("6001600155")  # the executing contract's code
    code2 = bytes.fromhex("30313233343536")  # EXTCODE* target's code
    st = MptNode.null()
    state = MptNode.null()
    state.insert(
        to_nibs(keccak256(ADDR)),
        Account(
            nonce=1, balance=100, storage_root=st.hash(),
            code_hash=keccak256(code),
        ).encode(),
    )
    state.insert(
        to_nibs(keccak256(ADDR2)),
        Account(
            balance=5, storage_root=EMPTY_ROOT, code_hash=keccak256(code2)
        ).encode(),
    )
    header = BlockHeader(state_root=state.hash(), number=7)
    a2 = int.from_bytes(ADDR2, "big")
    frames = [
        {
            "address": int.from_bytes(ADDR, "big"),
            "code": code,
            "world": {a2: {"code": code2}},
            "acct_ctx": {(2, a2): len(code2), (3, a2): 0},
        }
    ]
    ps = prestate.prove_prestate(
        _mk_collect(state, {ADDR: st}, header, frames)
    )
    assert ps is not None and "0x" + ADDR2.hex() in ps["codes"]

    def payload(rec):
        return {
            "chain": {"state_root": keccak256(header.encode()).hex()},
            "evm": {"frames": [{"frames": [rec]}]},
            "prestate": ps,
        }

    ch2 = int.from_bytes(keccak256(code2), "big")
    good = {
        "env": {"address": "0x" + ADDR.hex()},
        "code": code.hex(),
        "storage": [],
        "acct_ctx": [[2, hex(a2), hex(len(code2))], [3, hex(a2), hex(ch2)]],
    }
    assert prestate.verify_prestate_binding(payload(good))
    # wrong frame code
    assert not prestate.verify_prestate_binding(
        payload(dict(good, code=(code + b"\x00").hex()))
    )
    # wrong EXTCODESIZE claim
    assert not prestate.verify_prestate_binding(
        payload(
            dict(good, acct_ctx=[[2, hex(a2), hex(len(code2) + 1)]])
        )
    )
    # wrong EXTCODEHASH claim
    assert not prestate.verify_prestate_binding(
        payload(dict(good, acct_ctx=[[3, hex(a2), hex(ch2 ^ 1)]]))
    )
    # EXTCODEHASH of an absent account binds to zero
    missing = b"\xdd" * 20
    m = int.from_bytes(missing, "big")
    frames2 = [
        {
            "address": int.from_bytes(ADDR, "big"),
            "code": code,
            "acct_ctx": {(3, m): 0},
        }
    ]
    ps2 = prestate.prove_prestate(
        _mk_collect(state, {ADDR: st}, header, frames2)
    )
    good2 = {
        "env": {"address": "0x" + ADDR.hex()},
        "code": code.hex(),
        "storage": [],
        "acct_ctx": [[3, hex(m), hex(0)]],
    }
    p2 = {
        "chain": {"state_root": keccak256(header.encode()).hex()},
        "evm": {"frames": [{"frames": [good2]}]},
        "prestate": ps2,
    }
    assert prestate.verify_prestate_binding(p2)
    p2["evm"]["frames"][0]["frames"][0] = dict(
        good2, acct_ctx=[[3, hex(m), hex(5)]]
    )
    assert not prestate.verify_prestate_binding(p2)
