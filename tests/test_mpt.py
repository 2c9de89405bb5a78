"""Sparse MPT vs an independent yellow-paper oracle + proof semantics
(reference lib/src/primitives/mpt.rs:1143-1407 test coverage model)."""

import random

import pytest

from raiko_tpu.mpt import (
    EMPTY_ROOT,
    MptError,
    MptNode,
    index_trie_root,
    is_not_included,
    keccak_trie_root,
    mpt_from_proof,
    proofs_to_tries,
    to_nibs,
)
from raiko_tpu.proto import rlp
from raiko_tpu.utils import keccak256


def yp_root(kvs: dict) -> bytes:
    """Independent recursive yellow-paper TRIE implementation (oracle)."""

    def hp(nibs, flag):
        f = 0x20 if flag else 0
        if len(nibs) % 2:
            out = bytearray([f | 0x10 | nibs[0]])
            rest = nibs[1:]
        else:
            out = bytearray([f])
            rest = nibs
        for i in range(0, len(rest), 2):
            out.append(rest[i] << 4 | rest[i + 1])
        return bytes(out)

    def node(pairs):
        if not pairs:
            return b""
        if len(pairs) == 1:
            nibs, val = pairs[0]
            return rlp.encode([hp(list(nibs), True), val])
        i = 0
        while all(len(p[0]) > i and p[0][i] == pairs[0][0][i] for p in pairs):
            i += 1
        if i > 0:
            child = node([(p[0][i:], p[1]) for p in pairs])
            return rlp.encode([hp(list(pairs[0][0][:i]), False), ref(child)])
        groups = [[] for _ in range(16)]
        for nibs, val in pairs:
            groups[nibs[0]].append((nibs[1:], val))
        return rlp.encode([ref(node(g)) if g else b"" for g in groups] + [b""])

    def ref(enc):
        if enc == b"":
            return b""
        return rlp.Raw(enc) if len(enc) < 32 else keccak256(enc)

    enc = node([(to_nibs(k), v) for k, v in sorted(kvs.items())])
    return EMPTY_ROOT if enc == b"" else keccak256(enc)


def test_empty_root():
    assert MptNode.null().hash() == EMPTY_ROOT


@pytest.mark.parametrize("n", [1, 2, 5, 30, 200])
def test_random_sets_vs_oracle(n):
    rng = random.Random(n)
    kvs = {
        keccak256(rng.randbytes(8)): rlp.encode(rng.randbytes(rng.randint(1, 40)))
        for _ in range(n)
    }
    t = MptNode.null()
    items = list(kvs.items())
    rng.shuffle(items)
    for k, v in items:
        t.insert(to_nibs(k), v)
    assert t.hash() == yp_root(kvs)
    # reads
    k0 = items[0][0]
    assert t.get(to_nibs(k0)) == kvs[k0]
    assert t.get(to_nibs(keccak256(b"missing"))) is None
    # deletes reduce to the same root as a fresh build
    keys = list(kvs)
    rng.shuffle(keys)
    for k in keys[: n // 2]:
        assert t.delete(to_nibs(k))
        del kvs[k]
    assert t.hash() == yp_root(kvs)


def test_branch_value_rejected():
    t = MptNode.null()
    t.insert(to_nibs(b"\x12\x34"), b"v1")
    with pytest.raises(MptError):
        t.insert(to_nibs(b"\x12"), b"v2")  # prefix key -> branch value


def test_proof_reconstruction_and_updates():
    rng = random.Random(7)
    kvs = {keccak256(rng.randbytes(8)): rlp.encode(rng.randbytes(20)) for _ in range(100)}
    t = MptNode.null()
    for k, v in kvs.items():
        t.insert(to_nibs(k), v)
    root = t.hash()
    k0 = next(iter(kvs))
    sub = mpt_from_proof(t.proof(to_nibs(k0)))
    assert sub.hash() == root
    assert sub.get(to_nibs(k0)) == kvs[k0]
    # updates through the sparse trie track the full trie
    sub.insert(to_nibs(k0), b"\x01new")
    t.insert(to_nibs(k0), b"\x01new")
    assert sub.hash() == t.hash()
    # unresolved path raises
    other = next(k for k in kvs if k != k0)
    with pytest.raises(MptError):
        sub.insert(to_nibs(other), b"\x05")


def test_exclusion_proof():
    rng = random.Random(9)
    t = MptNode.null()
    for _ in range(50):
        t.insert(to_nibs(keccak256(rng.randbytes(8))), b"\x01")
    missing = keccak256(b"nope")
    assert is_not_included(missing, t.proof(to_nibs(missing)))


def test_proofs_to_tries():
    rng = random.Random(3)
    # build a "world": 20 accounts, some with storage
    state = MptNode.null()
    storages = {}
    infos = {}
    for i in range(20):
        addr = rng.randbytes(20)
        hkey = keccak256(addr)
        st = MptNode.null()
        slots = {}
        for _ in range(rng.randint(0, 5)):
            slot = rng.randbytes(32)
            st.insert(to_nibs(keccak256(slot)), rlp.encode(rng.randint(1, 99)))
            slots[slot] = None
        sroot = st.hash()
        acct_rlp = rlp.encode([i, 10**18, sroot, keccak256(b"")])
        state.insert(to_nibs(hkey), acct_rlp)
        storages[addr] = (st, slots, sroot)
    state_root = state.hash()
    # take proofs for 5 accounts
    chosen = list(storages)[:5]
    for addr in chosen:
        st, slots, sroot = storages[addr]
        infos[addr] = {
            "account_proof": state.proof(to_nibs(keccak256(addr))),
            "storage_root": sroot,
            "storage_proofs": {
                s: st.proof(to_nibs(keccak256(s))) for s in slots
            },
        }
    strie, storage_tries = proofs_to_tries(state_root, infos)
    assert strie.hash() == state_root
    for addr in chosen:
        st, slots, sroot = storages[addr]
        assert storage_tries[addr].hash() == sroot
        for s in slots:
            assert storage_tries[addr].get(to_nibs(keccak256(s))) == st.get(
                to_nibs(keccak256(s))
            )


def test_index_trie_helpers():
    vals = [rlp.encode([i, b"x" * i]) for i in range(10)]
    r1 = index_trie_root(vals)
    assert r1 != EMPTY_ROOT
    assert index_trie_root([]) == EMPTY_ROOT
    assert keccak_trie_root([]) == EMPTY_ROOT
